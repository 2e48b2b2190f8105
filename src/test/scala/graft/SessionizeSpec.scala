package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Session, Sessionize, UserEvent}

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ev(u: Long, s: String) = UserEvent(u, Timestamp.valueOf(s))

  test("gap sessionization: in-function close and watermark-timeout close") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = Sessionize.sessions(input.toDS(), gapMinutes = 10)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one burst for user 1, one event for user 2
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:02:00"),
        ev(2, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // sessions still open

      // user 1 returns past the gap → their previous session closes
      // in-function; the advanced watermark (11:00 - 10min = 10:50) also
      // fires user 2's 10:10 timeout in the same batch
      input.addData(ev(1, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      val s1 = spark.table("sess_out").as[Session].collect().sortBy(_.user_id)
      assert(s1.toSeq === Seq(
        Session(1, Timestamp.valueOf("2024-01-01 10:00:00"),
          Timestamp.valueOf("2024-01-01 10:02:00"), 2),
        Session(2, Timestamp.valueOf("2024-01-01 10:00:00"),
          Timestamp.valueOf("2024-01-01 10:00:00"), 1)))

      // a far-future event advances the watermark past user 1's new
      // session timeout (11:10) → the 11:00 singleton closes
      input.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 12:00:01")) // extra batch fires timeouts
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect()
        .map(s => (s.user_id, s.n_events)).toSet
      assert(closed.contains((1L, 1L))) // the 11:00 singleton
    } finally q.stop()
  }

  test("late in-watermark event extends a session BACKWARD") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = Sessionize.sessions(input.toDS(), gapMinutes = 10)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      // watermark = 09:50; a 09:55 arrival is admissible and belongs to
      // the SAME session — its start must move back to 09:55
      input.addData(ev(1, "2024-01-01 09:55:00"))
      q.processAllAvailable()
      // push the watermark far past the session's close
      input.addData(ev(9, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      input.addData(ev(9, "2024-01-01 12:00:01"))
      q.processAllAvailable()
      val s1 = spark.table("sess_late").as[Session].collect()
        .filter(_.user_id == 1L)
      assert(s1.toSeq === Seq(
        Session(1, Timestamp.valueOf("2024-01-01 09:55:00"),
          Timestamp.valueOf("2024-01-01 10:00:00"), 2)))
    } finally q.stop()
  }

  test("batch twin breaks a session at EXACTLY the gap (>= close rule)") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:30:00", 2L), // exactly 30 min later → new session
      (1L, "2024-01-01 10:59:59", 3L)  // 29:59 later → same session
    ).toDF("user_id", "s", "event_id")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id")
    val out = Sessionize.batchSessions(df, "user_id", "ts", "event_id",
        gapMinutes = 30)
      .orderBy("session_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq // (session_idx, n)
    assert(out === Seq(1L -> 1L, 2L -> 2L))
  }

  test("batch twin agrees with Spark's built-in session_window on real events") {
    // three-way agreement anchor: our lag-break/cumsum formulation must
    // produce the same (user, start, end, n) sessions as the engine's
    // native session_window — on the driver testdata, not a toy
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val gap = 30
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1), r.getLong(2))
    val ours = Sessionize.batchSessions(events, "user_id", "ts", "event_id", gap)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(key).toSet
    // session_window merges events strictly closer than the gap — the
    // same >= break rule batchSessions implements
    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gap minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .collect().map(key).toSet
    assert(ours.nonEmpty)
    assert(ours === native)
  }
}
