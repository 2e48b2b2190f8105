package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the streaming twin of
  * [[graft.operators.Dedup.exactDedup]]: drop re-deliveries of the same
  * key within the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key and
  * lets Spark EVICT entries older than the watermark — the property
  * that makes streaming dedup viable at 100 TB/day: state is bounded by
  * (keys/interval × watermark), not by the stream's lifetime. An
  * at-least-once upstream (kafka-style redelivery, pipe retries)
  * becomes exactly-once-per-key downstream for any redelivery that
  * lands inside the horizon. */
object StreamDedup {
  def dedupedStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
