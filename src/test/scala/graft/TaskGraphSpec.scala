package graft

import java.sql.Timestamp

import graft.flow.{DailyAt, Every, TaskDef, TaskGraph}

class TaskGraphSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def graphWithClock(start: String): (TaskGraph, () => Unit) = {
    var now = ts(start)
    val g = new TaskGraph(() => now)
    (g, () => { now = new Timestamp(now.getTime + 60 * 1000) }) // +1 min
  }

  test("interval schedule fires on cadence; tasks are created suspended (ST4)") {
    val (g, advance) = graphWithClock("2024-01-01 00:00:00")
    var n = 0
    g.add(TaskDef("gen", Some(Every(120)), body = () => n += 1))
    g.tick(); assert(n === 0) // suspended at creation (A4:369)
    g.resume("gen")
    g.tick(); assert(n === 1)
    advance(); g.tick(); assert(n === 1) // only 1 min elapsed
    advance(); g.tick(); assert(n === 2) // 2 min → due again
  }

  test("daily cron fires once per day after the boundary (ST5)") {
    var now = ts("2024-01-01 01:59:00")
    val g = new TaskGraph(() => now)
    var n = 0
    g.add(TaskDef("retention", Some(DailyAt(2, 0)), body = () => n += 1))
    g.resume("retention")
    g.tick(); assert(n === 0)           // before 02:00
    now = ts("2024-01-01 02:00:01"); g.tick(); assert(n === 1)
    now = ts("2024-01-01 08:00:00"); g.tick(); assert(n === 1) // same day
    now = ts("2024-01-02 02:00:01"); g.tick(); assert(n === 2) // next day
  }

  test("daily cron catches up a boundary no tick straddled before midnight") {
    // DailyAt(23,55) with sparse ticks: nothing lands between 23:55 and
    // local midnight. Anchoring due() on TODAY's boundary alone would
    // recompute the boundary into the new day at the 00:30 tick and
    // silently lose yesterday's fire; the lookback fires it once.
    var now = ts("2024-01-01 23:30:00")
    val g = new TaskGraph(() => now)
    var n = 0
    g.add(TaskDef("late", Some(DailyAt(23, 55)), body = () => n += 1))
    g.resume("late")
    g.tick(); assert(n === 0)                                  // 23:30
    now = ts("2024-01-02 00:30:00"); g.tick(); assert(n === 1) // catch-up
    now = ts("2024-01-02 01:30:00"); g.tick(); assert(n === 1) // once only
    now = ts("2024-01-02 23:56:00"); g.tick(); assert(n === 2) // next day
    now = ts("2024-01-03 00:30:00"); g.tick(); assert(n === 2) // no double
  }

  test("daily cron honors IANA timezone across a DST gap (ST5, A4:1031)") {
    // Europe/Paris springs forward 2026-03-29: 02:00 CET -> 03:00 CEST,
    // so the 02:00 wall time doesn't exist; it must fire at 03:00 CEST
    // (01:00 UTC), once.
    def utc(s: String): Timestamp =
      Timestamp.from(java.time.Instant.parse(s))
    var now = utc("2026-03-28T00:55:00Z")
    val g = new TaskGraph(() => now)
    var n = 0
    g.add(TaskDef("retention", Some(DailyAt(2, 0, "Europe/Paris")),
      body = () => n += 1))
    g.resume("retention")
    g.tick(); assert(n === 0)  // 01:55 CET, before 02:00 boundary
    now = utc("2026-03-28T01:05:00Z"); g.tick(); assert(n === 1) // 02:05 CET
    // DST day: 01:30 CET is before the (shifted) boundary
    now = utc("2026-03-29T00:30:00Z"); g.tick(); assert(n === 1)
    // 03:05 CEST: the gap-shifted boundary (03:00 CEST = 01:00 UTC) passed
    now = utc("2026-03-29T01:05:00Z"); g.tick(); assert(n === 2)
    now = utc("2026-03-29T09:00:00Z"); g.tick(); assert(n === 2) // same day
    // after DST the boundary is 02:00 CEST = 00:00 UTC
    now = utc("2026-03-30T00:05:00Z"); g.tick(); assert(n === 3)
  }

  test("linear chain runs in order; failure stops the cascade (ST7)") {
    val (g, _) = graphWithClock("2024-01-01 00:00:00")
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    g.add(TaskDef("root", Some(Every(60)), body = () => order += "root"))
    g.add(TaskDef("load", after = Seq("root"), body = () => order += "load"))
    g.add(TaskDef("refine", after = Seq("load"), body = () => order += "refine"))
    Seq("root", "load", "refine").foreach(g.resume(_))
    g.executeNow("root")
    assert(order.toSeq === Seq("root", "load", "refine"))

    order.clear()
    val (g2, _) = graphWithClock("2024-01-01 00:00:00")
    g2.add(TaskDef("root", Some(Every(60)), body = () => order += "root"))
    g2.add(TaskDef("load", after = Seq("root"),
      body = () => sys.error("boom")))
    g2.add(TaskDef("refine", after = Seq("load"), body = () => order += "refine"))
    Seq("root", "load", "refine").foreach(g2.resume(_))
    g2.executeNow("root")
    assert(order.toSeq === Seq("root")) // refine never ran
    assert(g2.history.exists(r => r.task_name == "load" &&
      r.status.startsWith("FAILED")))
  }

  test("fan-in barrier: multi-parent task runs once, after ALL parents (ST8)") {
    val (g, _) = graphWithClock("2024-01-01 00:00:00")
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    g.add(TaskDef("root", Some(Every(60)), body = () => order += "root"))
    g.add(TaskDef("genA", after = Seq("root"), body = () => order += "genA"))
    g.add(TaskDef("genB", after = Seq("root"), body = () => order += "genB"))
    g.add(TaskDef("waitAll", after = Seq("genA", "genB"),
      body = () => order += "waitAll"))
    Seq("root", "genA", "genB", "waitAll").foreach(g.resume(_))
    g.executeNow("root")
    assert(order.count(_ == "waitAll") === 1)
    assert(order.indexOf("waitAll") > order.indexOf("genA"))
    assert(order.indexOf("waitAll") > order.indexOf("genB"))
  }

  test("conditional gate skips the body but not the cascade (ST6)") {
    val (g, _) = graphWithClock("2024-01-01 00:00:00")
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    var hasData = false
    g.add(TaskDef("load", Some(Every(60)), when = () => hasData,
      body = () => order += "load"))
    g.add(TaskDef("dq", after = Seq("load"), body = () => order += "dq"))
    Seq("load", "dq").foreach(g.resume(_))
    g.executeNow("load")
    // stream_has_data=false → body skipped; downstream still evaluated
    assert(!order.contains("load") && order.contains("dq"))
    assert(g.history.exists(r => r.task_name == "load" && r.status == "SKIPPED"))
    hasData = true
    g.executeNow("load")
    assert(order.contains("load"))
  }

  test("history + latencyStats are queryable (ST11/A15)") {
    val (g, _) = graphWithClock("2024-01-01 00:00:00")
    g.add(TaskDef("t", Some(Every(60)), body = () => ()))
    g.resume("t")
    g.executeNow("t")
    val stats = g.latencyStats(spark).collect()
    assert(stats.length === 1)
    assert(stats(0).getAs[String]("task_name") === "t")
    assert(stats(0).getAs[Long]("n_runs") === 1L)
  }

  test("executeNow does not shift the schedule (EXECUTE TASK semantics)") {
    var now = ts("2024-01-01 00:00:00")
    val g = new TaskGraph(() => now)
    var n = 0
    g.add(TaskDef("t", Some(Every(3600)), body = () => n += 1))
    g.resume("t")
    g.tick(); assert(n === 1)                        // scheduled fire at T
    now = ts("2024-01-01 00:30:00"); g.executeNow("t")
    assert(n === 2)                                  // manual run mid-window
    now = ts("2024-01-01 01:00:00"); g.tick()
    assert(n === 3, "manual executeNow consumed/delayed the scheduled fire")
  }

  test("a DailyAt task resumed after today's wall time waits for tomorrow") {
    var now = ts("2024-01-01 14:00:00") // resumed in the afternoon
    val g = new TaskGraph(() => now)
    var n = 0
    g.add(TaskDef("nightly", Some(DailyAt(2, 0)), body = () => n += 1))
    g.resume("nightly")
    g.tick(); assert(n === 0,
      "nightly job fired in the afternoon it was resumed")
    now = ts("2024-01-02 02:00:01"); g.tick(); assert(n === 1)
    now = ts("2024-01-02 09:00:00"); g.tick(); assert(n === 1)
  }

  test("a previously-FIRED DailyAt task suspended + resumed also waits") {
    var now = ts("2024-01-01 01:00:00") // resumed BEFORE the boundary
    val g = new TaskGraph(() => now)
    var n = 0
    g.add(TaskDef("nightly", Some(DailyAt(2, 0)), body = () => n += 1))
    g.resume("nightly")
    now = ts("2024-01-01 02:00:01")
    g.tick(); assert(n === 1) // fires normally on day 1
    g.suspend("nightly")
    now = ts("2024-01-02 15:00:00") // resumed after today's boundary
    g.resume("nightly")
    g.tick(); assert(n === 1,
      "resumed nightly fired immediately off its stale day-1 lastFire")
    now = ts("2024-01-03 02:00:01"); g.tick(); assert(n === 2)
  }
}
