package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class UserEvent(user_id: Long, ts: Timestamp)
case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long)
private[streaming] case class SessAcc(startMs: Long, endMs: Long, n: Long)

/** Gap-based sessionization via `flatMapGroupsWithState` — the custom
  * keyed-state tier of the engine (beyond the reference, which has no
  * session concept; SURVEY.md §2.9 notes its streaming is
  * file-granularity only).
  *
  * A session is a maximal run of a user's events with no gap ≥
  * `gapMinutes`. Sessions close two ways: (a) in-function, when a later
  * event arrives past the gap; (b) by event-time timeout once the
  * watermark passes `last_event + gap` — so state is bounded: one small
  * accumulator per in-flight user, pruned by the watermark, never a
  * buffer of events. That bound is what lets 1000 executors hold
  * hundreds of millions of concurrent sessions.
  */
object Sessionize {

  def sessions(events: Dataset[UserEvent], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SessAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.n))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var acc = state.getOption.orNull
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (acc == null) acc = SessAcc(t, t, 1)
              else if (t - acc.endMs >= gapMs) { // gap exceeded → close
                closed += Session(user, new Timestamp(acc.startMs),
                  new Timestamp(acc.endMs), acc.n)
                acc = SessAcc(t, t, 1)
              } else acc = SessAcc(acc.startMs, math.max(acc.endMs, t), acc.n + 1)
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.endMs + gapMs)
            closed.iterator
          }
      }
  }

  /** Batch twin of [[sessions]]: gap sessionization over a static event
    * table via the classic lag-break/cumulative-sum window pair — one
    * shuffle on the user key, per-user sorted scan, no state machinery.
    * Gap comparison runs on epoch MICROSECONDS (exact integers, so an
    * external oracle replays it bit-for-bit). */
  def batchSessions(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsCol: String, idCol: String, gapMinutes: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val brk = when(lag(col(tsCol), 1).over(w).isNull ||
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) > gapUs,
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("__brk", brk)
      .withColumn("__sid", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sid").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"))
  }
}
