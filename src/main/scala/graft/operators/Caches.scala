package graft.operators

import org.apache.spark.sql.DataFrame

/** Persist-scope helper for operators that self-join or multi-probe an
  * intermediate frame.
  *
  * `scoped(i1, i2)(out)` caches the intermediates, eagerly computes `out`
  * while they are hot (localCheckpoint: one computation, lineage
  * truncated), and ALWAYS releases them before returning. The caller gets
  * a small, already-materialized result whose re-reads never recompute
  * the expensive lineage — and, critically, no cache blocks outlive the
  * call. Persist-without-unpersist is the classic slow-degradation
  * failure in long-lived sessions (benchmarks, notebooks, streaming
  * drivers): every leaked block adds GC pressure until unrelated queries
  * crawl. */
private[graft] object Caches {
  def scoped(intermediates: DataFrame*)(out: => DataFrame): DataFrame = {
    intermediates.foreach(_.persist())
    try out.localCheckpoint()
    finally intermediates.foreach(_.unpersist())
  }

  /** Spread a compute-heavy-but-byte-light input across the cluster.
    *
    * A small parquet file arrives as ONE scan split, so per-row-expensive
    * pipelines (shingling, hashing, signatures) run single-threaded no
    * matter how many cores exist — bytes-based split sizing is the wrong
    * proxy when compute ≫ I/O. An explicit hash repartition on the row
    * key fixes the parallelism AND pre-satisfies the downstream
    * groupBy(key) distribution (no second exchange). The partition count
    * is pinned (repartition(n, key)) so AQE's size-based coalescing
    * doesn't fold the tiny-by-bytes rows back into one partition. */
  def spreadByKey(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // the conf can hold a non-integer on AQE-managed platforms ("auto");
    // fall back to the cluster's default parallelism rather than throwing
    val n = scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "").toInt)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    df.repartition(n, key)
  }
}
