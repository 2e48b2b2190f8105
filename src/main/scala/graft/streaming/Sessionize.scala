package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class UserEvent(user_id: Long, ts: Timestamp)
case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long)
private[streaming] case class SessAcc(startMs: Long, endMs: Long, n: Long)
private[streaming] case class SessState(accs: List[SessAcc])

/** Gap-based sessionization via `flatMapGroupsWithState` — the custom
  * keyed-state tier of the engine (beyond the reference, which has no
  * session concept; SURVEY.md §2.9 notes its streaming is
  * file-granularity only).
  *
  * A session is a maximal run of a user's events with no gap ≥
  * `gapMinutes`. State per user is a LIST of disjoint in-flight
  * sessions (not a single accumulator): an out-of-order event inside
  * the watermark horizon may extend an older interval backward, bridge
  * two intervals into one, or open its own — single-accumulator
  * sessionizers silently mis-bound exactly those cases. A session
  * closes only when the WATERMARK passes `session_end + gap` (the
  * event-time timeout): at that point no admissible event can extend
  * or bridge it, which is the correctness condition an arrival-order
  * close rule violates. State stays bounded: intervals per user ≤
  * out-of-orderness / gap (typically 1), pruned by the watermark —
  * what lets 1000 executors hold hundreds of millions of concurrent
  * sessions.
  */
object Sessionize {

  def sessions(events: Dataset[UserEvent], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SessState]) =>
          val wm = state.getCurrentWatermarkMs()
          var accs = state.getOption.map(_.accs).getOrElse(Nil)
          // fold events in (sorted) — each merges every interval within
          // gap of it (possibly bridging several) or opens a new one
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            val (near, far) = accs.partition(a =>
              t > a.startMs - gapMs && t < a.endMs + gapMs)
            val merged = near.foldLeft(SessAcc(t, t, 1)) { (m, a) =>
              SessAcc(math.min(m.startMs, a.startMs),
                math.max(m.endMs, a.endMs), m.n + a.n)
            }
            accs = merged :: far
          }
          // close every interval the watermark has sealed (covers both
          // the timeout branch — empty iterator — and new-data batches)
          val (closable, open) = accs.partition(_.endMs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessState(open))
            state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
          }
          closable.sortBy(_.startMs).map(a =>
            Session(user, new Timestamp(a.startMs), new Timestamp(a.endMs),
              a.n)).iterator
      }
  }

  /** Batch twin of [[sessions]]: gap sessionization over a static event
    * table via the classic lag-break/cumulative-sum window pair — one
    * shuffle on the user key, per-user sorted scan, no state machinery.
    * Gap comparison runs on epoch MICROSECONDS (exact integers, so an
    * external oracle replays it bit-for-bit). */
  def batchSessions(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsCol: String, idCol: String, gapMinutes: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    withSessionIds(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("__sid").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"))
  }

  /** Per-EVENT session assignment (`__sid`, 1-based per user) — the
    * ONE definition of the gap-break rule, shared by [[batchSessions]]
    * and every session-scoped analysis (e10 funnel). A session-rule
    * change here changes all of them together. */
  def withSessionIds(events: org.apache.spark.sql.DataFrame, userCol: String,
      tsCol: String, idCol: String, gapMinutes: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    // >= : a gap of exactly gapMinutes BREAKS the session, matching the
    // streaming twin's close rule ("no gap >= gapMinutes")
    val brk = when(lag(col(tsCol), 1).over(w).isNull ||
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) >= gapUs,
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("__sid", sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
