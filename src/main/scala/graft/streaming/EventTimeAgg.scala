package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming aggregation — the tier ABOVE the reference.
  *
  * The reference's streaming is file-granularity micro-batching; its
  * event-time analytics are batch queries over `txn_ts` (SURVEY.md §2.9
  * note: no watermarks, no windows, no late-data handling). Spark gives
  * these natively, so the engine exposes them: tumbling/sliding windows
  * with watermark-bounded state. State is keyed by (window, keys) and
  * pruned at the watermark, so memory is bounded by windows-in-flight ×
  * key cardinality — the property that keeps a 1000-executor streaming
  * job from accreting state forever.
  */
object EventTimeAgg {

  /** Tumbling-window aggregates with late-data tolerance. Works on both
    * batch and streaming frames (identical semantics; batch just sees a
    * closed input). */
  def tumbling(events: DataFrame, tsCol: String, windowLen: String,
      lateness: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, lateness)
      else events
    flatten(src.groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*))
  }

  /** Sliding-window variant (`windowLen` every `slide`). */
  def sliding(events: DataFrame, tsCol: String, windowLen: String,
      slide: String, lateness: String, keys: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, lateness)
      else events
    flatten(src.groupBy(window(col(tsCol), windowLen, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*))
  }

  private def flatten(grouped: DataFrame): DataFrame =
    grouped.select(
      col("window.start").as("window_start") +:
      col("window.end").as("window_end") +:
      grouped.columns.filter(_ != "window").map(col).toSeq: _*)
}
