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
}
