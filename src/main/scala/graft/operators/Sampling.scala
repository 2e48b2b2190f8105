package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Everything keys off md5(id) hex digits — a pure function of the row
  * id, so assignments are stable across runs, partitionings, cluster
  * sizes, AND engines (the DuckDB oracle replays the same digits).
  * That stability is the property that matters at 100 TB: a re-run or
  * a re-shard must never move a document between train and test. */
object Sampling {

  /** md5(id) first-k-hex-digits as an integer in [0, 16^k). */
  private def hashBucket(idCol: Column, k: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, k), 16, 10).cast("long")

  /** Train/val/test assignment, ~90/5/5 by 256 buckets:
    * bucket < 230 → train, < 243 → val, else test. */
  def withSplit(df: DataFrame, idCol: String, as: String = "split"): DataFrame =
    df.withColumn(as, {
      val b = hashBucket(col(idCol), 2)
      when(b < 230, lit("train")).when(b < 243, lit("val")).otherwise(lit("test"))
    })

  /** Leakage-free train/val/test split: assignment keys on the NEAR-DUP
    * CLUSTER id, not the document id, so every document of a connected
    * near-dup component lands in the same split — the eval-contamination
    * guard a per-doc hash split cannot give (a near-copy of a training
    * doc in the test set is a leak; at sf0.01 four of the corpus's own
    * clusters straddle the naive t05 split). Takes the (id, cluster)
    * frame a dedup-cluster pass produces ([[graft.operators.Dedup
    * .collapsedDupClusters]]); the assignment itself is a PURE PROJECTION
    * of the cluster id — no join, no shuffle, stable across runs,
    * shards, and engines like every md5 split here. Singleton clusters
    * (cluster_id = doc_id) reproduce [[withSplit]] exactly, so the two
    * splits agree wherever there is nothing to protect. */
  def withLeakFreeSplit(clusters: DataFrame, clusterCol: String,
      as: String = "split"): DataFrame =
    withSplit(clusters, clusterCol, as)

  /** Temperature-scaled mixture weights over corpus strata (the
    * multilingual/domain rebalance rule, e.g. XLM-R's p_i^α): sampling
    * weight w_i ∝ p_i^(1/T) renormalized, plus the per-stratum boost
    * w_i/p_i that [[replicateByWeight]] consumes as epochs. T=1 is
    * proportional, T→∞ uniform; rare strata upsample, dominant ones
    * downweigh. One map-side-combinable count per stratum, then
    * arithmetic over the (bounded) stratum table — nothing
    * corpus-sized shuffles. T=2 computes via sqrt (correctly-rounded
    * IEEE half-power, engine-exact for the DuckDB oracle); other
    * temperatures via pow. */
  def temperatureWeights(df: DataFrame, stratumCol: String,
      temperature: Double): DataFrame = {
    require(temperature > 0, "temperature must be > 0")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
    val total = sum(col("n_docs")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val p = col("n_docs").cast("double") / total
    val scaled = if (temperature == 2.0) sqrt(p) else pow(p, 1.0 / temperature)
    val wNorm = col("__s") / sum(col("__s")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    counts.withColumn("p", p).withColumn("__s", scaled)
      .withColumn("w", wNorm)
      .select(col(stratumCol), col("n_docs"), round(col("p"), 4).as("p"),
        round(col("w"), 4).as("w"),
        round(col("w") / col("p"), 4).as("boost"))
  }

  /** Keep ~`permille`/1000 of rows: 4 hex digits → [0, 65536) compared
    * against permille·65536/1000 (an exact integer threshold so both
    * engines make the identical cut). */
  def sampleDeterministic(df: DataFrame, idCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    df.filter(hashBucket(col(idCol), 4) * 1000 < lit(permille.toLong * 65536L))
  }

  /** Deterministic n-per-group sample: the `n` rows of each group with
    * the smallest md5(id) — "give me 100 examples from every source/
    * language/bucket" with assignments that never move between runs or
    * engines. One window per group (key-partitioned shuffle); no
    * global sort, no driver state. */
  def sampleNPerGroup(df: DataFrame, idCol: String, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Epoch-weight replication — the upsampling half of corpus mixing
    * (e.g. Wikipedia 3.5 epochs, CommonCrawl 0.8): every row appears
    * `floor(weight)` times plus one more for the deterministic
    * `frac(weight)` hash-cut slice, as (row, copy_idx) pairs. Pure
    * per-row explode of a small sequence — no shuffle, no join; the
    * fractional cut reuses the md5-digit permille mechanics, so copies
    * are stable across runs, shards, and engines. Weights are permille
    * thousandths: 3500 = 3.5 epochs. */
  def replicateByWeight(df: DataFrame, idCol: String, stratumCol: String,
      weightPermilleByStratum: Map[String, Int],
      defaultWeightPermille: Int = 1000): DataFrame = {
    (weightPermilleByStratum.values.toSeq :+ defaultWeightPermille)
      .foreach(p => require(p >= 0, "weight permille must be >= 0"))
    val permille = weightPermilleByStratum.foldLeft(
      lit(defaultWeightPermille.toLong)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, lit(p.toLong)).otherwise(acc)
    }
    val whole = (permille / 1000L).cast("long")
    val fracPermille = permille % 1000L
    val extra = (hashBucket(col(idCol), 4) * 1000 <
      fracPermille * 65536L).cast("long")
    val copies = whole + extra
    // sequence(1, 0) DESCENDS ([1, 0]) — zero-copy rows need an empty
    // array (dropped by explode), not a phantom pair
    df.withColumn("copy_idx",
        explode(when(copies >= 1, sequence(lit(1L), copies))
          .otherwise(array().cast("array<long>"))))
  }

  /** Per-domain document cap — the CCNet/Gopher-style corpus rule "no
    * single domain may contribute more than `n` documents": keep the
    * top-`n` rows of each group by (`scoreCol` desc, `tieCol` asc), with
    * the kept row's 1-based rank in `rankAs`.
    *
    * Two-phase so one hot domain never lands all its rows in a single
    * window partition (a web crawl is power-law: the top host can be
    * 10^6+ pages, and a plain per-group window would ship them into one
    * task): phase 1 ranks within (group, slice) — slice = origin
    * partition id mod `slices`, so a hot group's rows spread across up
    * to `slices` window partitions and each keeps at most `n` — and
    * phase 2 ranks the surviving ≤ n·slices rows per group. Because
    * (score desc, tie asc) is a total order, the global top-n is a
    * subset of the union of per-slice top-n, so the two-phase result is
    * exactly the single-window result — only the shuffle shape differs. */
  def capPerGroupByScore(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, n: Int, slices: Int = 64,
      rankAs: String = "grp_rank"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(slices >= 1, "slices must be >= 1")
    val ord = Seq(col(scoreCol).desc, col(tieCol).asc)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__slice")).orderBy(ord: _*)
    val capped = df
      .withColumn("__slice", spark_partition_id() % slices)
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= n)
      .drop("__rn", "__slice")
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(ord: _*)
    capped.withColumn(rankAs, row_number().over(w2).cast("long"))
      .filter(col(rankAs) <= n)
  }

  /** Weighted sampling without replacement, Efraimidis–Spirakis A-ES
    * ("Weighted random sampling with a reservoir", IPL 2006): each row
    * draws u ∈ (0, 1] and keeps key u^(1/w); the global top-n keys ARE
    * an exact weighted sample without replacement. Here u derives from
    * md5(id) digits — deterministic, partition-independent, replayable
    * by any engine with md5 — so the "random" sample is stable across
    * runs and reshards. Scale shape: one codegen'd projection + a
    * TakeOrdered top-n (per-partition heaps, no global sort, no
    * shuffle wider than n rows) — the quality-weighted subcorpus draw
    * at 100 TB costs one scan. Weights are floored at 1e-4 so w = 0
    * rows get key ≈ 0 (never sampled) instead of NaN. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int, keyAs: String = "es_key"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val u = (hashBucket(col(idCol), 6) + 1).cast("double") / math.pow(16, 6)
    val key = pow(u, lit(1.0) / greatest(col(weightCol), lit(1e-4)))
    df.withColumn("__esk", key)
      .orderBy(col("__esk").desc, col(idCol))
      .limit(n)
      .withColumn(keyAs, round(col("__esk"), 6))
      .drop("__esk")
  }

  /** Stratified deterministic sampling — per-stratum keep rates (the
    * corpus-mixture rebalance: upsample rare languages/sources, downweigh
    * the dominant one). Same md5-digit cut as [[sampleDeterministic]],
    * with the threshold chosen per stratum value; unlisted strata fall
    * back to `defaultPermille`. One scan, one codegen'd CASE — the rate
    * table rides in the plan as literals (mixture tables are small), so
    * there is no join and partitioning never matters. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
      permilleByStratum: Map[String, Int],
      defaultPermille: Int = 0): DataFrame = {
    (permilleByStratum.values.toSeq :+ defaultPermille).foreach(p =>
      require(p >= 0 && p <= 1000, "permille in [0, 1000]"))
    val threshold = permilleByStratum.foldLeft(
      lit(defaultPermille.toLong * 65536L)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, lit(p.toLong * 65536L)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 4) * 1000 < threshold)
  }
}
