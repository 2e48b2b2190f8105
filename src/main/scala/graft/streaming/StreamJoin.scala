package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with a bounded event-time band — the
  * streaming twin of the batch range join (`e03_burst_window` shape):
  * correlate two live streams (clicks↔impressions, orders↔payments)
  * where the match must land within `joinWindow` of the left event.
  *
  * Scale posture: both sides are watermarked and the join condition
  * carries an explicit event-time band, which is exactly what lets
  * Spark prune join state — each side buffers only rows younger than
  * (watermark + band), so state is bounded by rate × window, not by
  * stream lifetime. An unbanded stream-stream join would accrete state
  * forever; this operator makes the band part of the contract. The
  * equi key carries the shuffle (state is key-partitioned across
  * executors); the band is a residual predicate, never a cartesian.
  *
  * Column names must be disjoint across the two sides (standard for
  * stream-stream joins — alias upstream), since both survive into the
  * joined row. `joinType` supports "inner" and "leftOuter"; outer
  * results for unmatched left rows emit once the watermark passes the
  * band (Spark's correctness rule for streaming outer joins).
  */
object StreamJoin {
  def withinBand(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lateness: String, joinWindow: String,
      joinType: String = "inner"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, lateness) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, lateness) else right
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $joinWindow"),
      joinType)
  }

  /** Stream-static enrichment: a live stream joined against a batch
    * dimension table — the warehouse lookup-join done continuously
    * (the reference's refinement tasks attach car-catalog attributes
    * to each CDC batch; this is that attach as a streaming stage). The
    * static side is planned per micro-batch (no streaming state at
    * all — this join keeps NO buffers, unlike stream-stream), and a
    * catalog-class dim broadcasts, so each micro-batch pays one
    * broadcast probe, never a shuffle of the stream. `leftOuter` keeps
    * unmatched stream rows (the UNKNOWN-brand convention of the
    * reference's analytics, BASELINE.md golden values). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      joinType: String = "leftOuter",
      broadcastDim: Boolean = true): DataFrame = {
    // frame-qualified keys: the natural enrichment shape has the SAME
    // key name on both sides, which unqualified col() refs would reject
    // as ambiguous. broadcastDim=false is the escape hatch for a
    // dimension too big to broadcast (AQE then picks the strategy).
    // When key names collide, drop the dim's copy downstream via
    // dim-side aliasing.
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, stream(streamKey) === dim(dimKey), joinType)
  }
}
