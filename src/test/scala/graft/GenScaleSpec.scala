package graft

import org.apache.spark.sql.functions._

/** The warm-twin integrity contract behind [[Bench]]'s same-scale warm
  * pass: a GenScale corpus generated with `startReplica = 1` must share
  * ZERO verbatim values with its source — the whole point of warming on
  * a twin is that the measured data's values, pages and plans are never
  * touched, so any verbatim leak would quietly turn the warm pass into
  * a pre-run of the measured work. Shape must still match exactly (same
  * row counts per table → same size-dependent plan choices → same
  * generated classes, the thing the JIT warm-up exists for). */
class GenScaleSpec extends SparkSuite {

  private lazy val twinDir = {
    val dir = java.nio.file.Files
      .createTempDirectory("genscale_twin_spec").toString
    GenScale.generate(spark, sf0001, dir, replicas = 1, startReplica = 1L)
    dir
  }

  test("startReplica=1 twin: same row counts per table (plan-shape parity)") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val srcN = graft.core.Tables.table(spark, sf0001, t).count()
      val twinN = spark.read.parquet(s"$twinDir/$t.parquet").count()
      assert(twinN === srcN, s"row count diverged for $t")
    }
  }

  test("startReplica=1 twin: zero verbatim document text or embedding overlap") {
    val srcDocs = graft.core.Tables.table(spark, sf0001, "documents")
      .select(col("text")).filter(col("text").isNotNull)
    val twinDocs = spark.read.parquet(s"$twinDir/documents.parquet")
      .select(col("text")).filter(col("text").isNotNull)
    assert(srcDocs.join(twinDocs, Seq("text")).count() === 0L,
      "verbatim text leaked into the warm twin")
    val srcEmb = graft.core.Tables.table(spark, sf0001, "embeddings")
      .select(col("embedding"))
    val twinEmb = spark.read.parquet(s"$twinDir/embeddings.parquet")
      .select(col("embedding"))
    assert(srcEmb.join(twinEmb, Seq("embedding")).count() === 0L,
      "verbatim embeddings leaked into the warm twin")
  }

  test("startReplica=1 twin: fact ids shifted out of the source key space") {
    val minTwinId = spark.read.parquet(s"$twinDir/documents.parquet")
      .agg(min(col("doc_id"))).head().getLong(0)
    val maxSrcId = graft.core.Tables.table(spark, sf0001, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    assert(minTwinId > maxSrcId,
      "twin doc ids overlap the source id space")
  }

  test("twin text preserves structure: per-doc token counts match the source") {
    // the char bijection must preserve lengths and token boundaries —
    // that is what keeps the warm pass's per-row work representative
    val srcCounts = graft.core.Tables.table(spark, sf0001, "documents")
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .groupBy("n").count().orderBy("n")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val twinCounts = spark.read.parquet(s"$twinDir/documents.parquet")
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .groupBy("n").count().orderBy("n")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(twinCounts === srcCounts,
      "token-count histogram diverged — the bijection broke structure")
  }
}
