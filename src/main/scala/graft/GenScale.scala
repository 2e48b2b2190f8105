package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence corpus generator: writes a seeded ~Nx replica of a
  * testdata SF directory (default 10x of sf0.1 ≈ "sf1") to a scratch
  * dir (`target/`, never checked in — TESTDATA.md data stays
  * read-only), so the SCALING sweep gains a leg where DATA dominates
  * constants: sf0.01→sf0.1 proves absence-of-quadratic but cannot
  * separate linear from n·log n, and the iterative-tier gates
  * (broadcast caps, local finishes, iteration conf) were tuned at
  * overhead-bound sizes. At ~sf1 the over-cap paths genuinely engage
  * (e13's edge set crosses the 2M local-finish/iterconf caps).
  *
  * Replication is STRUCTURE-PRESERVING per replica and
  * structure-breaking across replicas, so per-query work scales
  * linearly instead of quadratically exploding or trivially deduping:
  *
  *  - ids/FKs shift by `replica * stride` consistently on both sides
  *    of every join (order⋈lineitem, order⋈customer, lineitem⋈part/
  *    supplier stay per-replica; selectivities unchanged);
  *  - document TEXT maps through a per-replica CHARACTER BIJECTION (a
  *    distinct alphabet/digit rotation per replica; replica 0
  *    verbatim): word identity, n-gram/shingle Jaccard, MinHash band
  *    structure, dup-span layout AND character-level edit distances
  *    are EXACTLY preserved within a replica (a bijective char map
  *    preserves Levenshtein), while across replicas both tokens and
  *    SUBSTRINGS diverge — so shingle-blocked near-dup pairs AND
  *    PassJoin segment candidates scale x N, not x N². (A word-suffix
  *    bijection was measured failing exactly there: cross-replica
  *    texts still shared long substrings, so d14's segment candidates
  *    exploded x10 per doc — exponent 1.48 — before verification
  *    rejected them all.);
  *  - EMBEDDINGS map through a per-replica signed permutation (an
  *    orthogonal transform): within-replica cosines/kNN structure are
  *    bit-exactly preserved, cross-replica similarities scramble;
  *  - events/users replicate with shifted user/event ids at identical
  *    timestamps: sessions, windows and rate shapes replicate
  *    per-replica.
  *
  * Seeded (constant PERM_SEED) + deterministic transforms — the same
  * corpus every run, every partition layout. */
object GenScale {

  private val PermSeed = 20260816L

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("target/sfgen1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, replicas)
    spark.stop()
  }

  /** One id-space stride shared by every key family: far above any
    * source table's max id, so replica key ranges never collide. */
  private val Stride = 100000000L

  private def shifted(c: String): org.apache.spark.sql.Column =
    col(c) + col("__r") * Stride

  /** Cross-join the frame with replica ids start..start+n-1 (broadcast
    * tiny side — a pure fanout, no shuffle of the big side). */
  private def fanout(df: DataFrame, n: Int, start: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.crossJoin(broadcast((start until start + n.toLong).toDF("__r")))
  }

  /** `startReplica` shifts the replica-id range to start..start+n-1:
    * with startReplica >= 1 NO verbatim copy of the source is emitted —
    * every replica is char-bijected / sign-permuted / id-shifted. That
    * is the warm-twin shape ([[Bench]]): a corpus at the SAME scale as
    * the measured one (same plan choices, same generated code) whose
    * data shares nothing the measurement could be flattered by. */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      replicas: Int, startReplica: Long = 0L): Unit = {
    import graft.core.Tables
    def src(name: String): DataFrame = Tables.table(spark, srcDir, name)
    // fact tables repartition before write: the broadcast fanout
    // preserves the SOURCE file's split count, so a 10x table would
    // otherwise land as one ~100 MB single-row-group file that every
    // downstream scan reads in ONE task (measured: e12's edge build
    // carried a 5 s single-task stage). Real corpora arrive as many
    // files; 32 parts makes the generated leg scan-parallel like one.
    def write(df: DataFrame, name: String, parts: Int = 32): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      // stderr: Bench builds warm twins mid-run and its stdout must
      // stay pure JSON lines
      System.err.println(s"[genscale] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    // dims replicate verbatim (a 100 TB warehouse still has 25 nations)
    write(src("region"), "region", parts = 1)
    write(src("nation"), "nation", parts = 1)

    write(fanout(src("customer"), replicas, startReplica)
      .select(shifted("c_custkey").as("c_custkey"),
        concat(col("c_name"), lit("#"), col("__r")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    write(fanout(src("supplier"), replicas, startReplica)
      .select(shifted("s_suppkey").as("s_suppkey"),
        concat(col("s_name"), lit("#"), col("__r")).as("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      "supplier")

    write(fanout(src("part"), replicas, startReplica)
      .select(shifted("p_partkey").as("p_partkey"),
        concat(col("p_name"), lit("#"), col("__r")).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part")

    write(fanout(src("orders"), replicas, startReplica)
      .select(shifted("o_orderkey").as("o_orderkey"),
        shifted("o_custkey").as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      "orders")

    write(fanout(src("lineitem"), replicas, startReplica)
      .select(shifted("l_orderkey").as("l_orderkey"),
        shifted("l_partkey").as("l_partkey"),
        shifted("l_suppkey").as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    write(fanout(src("events"), replicas, startReplica)
      .select(shifted("event_id").as("event_id"), col("ts"),
        shifted("user_id").as("user_id"),
        col("event_type"), col("value"), col("props")),
      "events")

    // character bijection: replica 0 verbatim; replica r rotates the
    // lowercase/uppercase/digit alphabets by distinct coprime steps —
    // lengths, token boundaries, shingle structure and edit distances
    // preserved exactly within a replica; across replicas letters (and
    // hence tokens AND substrings) are disjoint
    val lowerAb = "abcdefghijklmnopqrstuvwxyz"
    val upperAb = lowerAb.toUpperCase
    val digitAb = "0123456789"
    val alphabet = lowerAb + upperAb + digitAb
    def rot(s: String, k: Int): String = {
      val m = math.floorMod(k, s.length); s.drop(m) + s.take(m)
    }
    // distinct bijection per replica, for ANY replica count: rotations
    // while they stay distinct (7 coprime with 26, 3 with 10 — letters
    // r < 26, digits r < 10), seeded permutations beyond (a rotation
    // wrapping would hand two replicas the SAME map, gluing their
    // texts back into exact cross-replica duplicates). Uppercase is
    // always the uppercased lowercase table, so the bijection commutes
    // with lower() — the operators' case normalization sees identical
    // structure in every replica.
    def seededPerm(ab: String, r: Int): String = {
      val rng = new scala.util.Random(PermSeed * 31 + r)
      rng.shuffle(ab.toList).mkString
    }
    def target(r: Int): String = {
      val lo = if (r < 26) rot(lowerAb, 7 * r) else seededPerm(lowerAb, r)
      val dg = if (r < 10) rot(digitAb, 3 * r) else seededPerm(digitAb, r)
      lo + lo.toUpperCase + dg
    }
    val replicaIds =
      (startReplica until startReplica + replicas).map(_.toInt)
    val rotated = replicaIds.filter(_ != 0).foldLeft(
      when(col("__r") === 0L, col("text"))) { (acc, r) =>
      acc.when(col("__r") === r.toLong,
        translate(col("text"), alphabet, target(r)))
    }.otherwise(col("text"))
    write(fanout(src("documents"), replicas, startReplica)
      .withColumn("text", rotated)
      .select(shifted("doc_id").as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")),
      "documents")

    // signed permutation per replica: an orthogonal transform, so
    // within-replica dot products / cosines are EXACT (up to float
    // addition order, which transform preserves: one value per slot)
    val dim = src("embeddings").select(size(col("embedding")))
      .first().getInt(0)
    val perms = replicaIds.map { r =>
      if (r == 0) (0L, (0 until dim).toArray, Array.fill(dim)(1.0f))
      else {
        // per-replica seed (not one shared sequence) so a replica's
        // transform is identical whatever range it is generated in
        val rng = new scala.util.Random(PermSeed * 131 + r)
        (r.toLong, rng.shuffle((0 until dim).toList).toArray,
          Array.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f))
      }
    }
    val spark2 = spark
    import spark2.implicits._
    val permDf = perms.toDF("__r", "__perm", "__sign")
    write(src("embeddings")
      .crossJoin(broadcast(permDf))
      .withColumn("embedding",
        transform(col("__perm"), (p, i) =>
          element_at(col("embedding"), p.cast("int") + 1) *
            element_at(col("__sign"), i + 1)))
      .select(shifted("vec_id").as("vec_id"), col("embedding"), col("label")),
      "embeddings")
  }
}
