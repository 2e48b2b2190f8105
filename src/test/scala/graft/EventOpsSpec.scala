package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.dq.DqChecks

/** Hand-computed cases for the round-6 event/DQ additions: the e15
  * sweep-line concurrency counter and the FD-violation profile. */
class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$sec%02d")

  test("sweep-line concurrency: hand-built stack of 5-minute intervals") {
    // user 1: events at 10:00, 10:01, 10:02 — all three open at 10:02 → 3
    // user 2: events at 10:00 and 10:05 — [10:00,10:05) closes exactly
    //         as [10:05,10:10) opens (half-open) → max 1
    // user 3: single event → 1
    val e = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(2)),
      (2L, ts(0)), (2L, ts(5)),
      (3L, ts(30))).toDF("user_id", "ts")
    val deltas = e.select(col("user_id"), col("ts").as("edge"), lit(1).as("d"))
      .unionByName(e.select(col("user_id"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("edge"), lit(-1).as("d")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("edge"), col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val got = deltas.withColumn("open", sum("d").over(w))
      .groupBy("user_id").agg(max("open").cast("long").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("e15 declared query: max_concurrent >= 1 and bounded by user volume") {
    val out = queries.CoreQueries.e15MaxConcurrency(spark, sf0001)
    val perUser = graft.core.Tables.table(spark, sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = out.join(perUser, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (mc, n) = (r.getLong(1), r.getLong(2))
      assert(mc >= 1L && mc <= n, s"user ${r.getLong(0)}: mc=$mc n=$n")
    }
  }

  test("CUSUM: flat series stays at 0, a step shift accumulates linearly") {
    // type A: constant 4/day → cusum identically 0 every day
    // type B: 2,2,2 then 6,6,6 → mean 4; cusum -2,-4,-6,-4,-2,0 —
    // the pre-shift drift and post-shift recovery a step change produces
    val rows =
      (1 to 6).flatMap(d => Seq.fill(4)(("A", f"2024-02-$d%02d 09:00:00"))) ++
      (1 to 3).flatMap(d => Seq.fill(2)(("B", f"2024-02-$d%02d 09:00:00"))) ++
      (4 to 6).flatMap(d => Seq.fill(6)(("B", f"2024-02-$d%02d 09:00:00")))
    val e = rows.toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
    val daily = e.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val m = daily.groupBy("event_type").agg(avg("n").as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val got = daily.join(m, "event_type")
      .withColumn("cusum", round(sum(col("n") - col("m")).over(w), 4))
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getDouble(4)))
    assert(got.filter(_._1 == "A").map(_._2).toSeq === Seq.fill(6)(0.0))
    assert(got.filter(_._1 == "B").map(_._2).toSeq ===
      Seq(-2.0, -4.0, -6.0, -4.0, -2.0, 0.0))
  }

  test("randomized: sweep-line max concurrency ≡ brute-force interval overlap") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { _ =>
      val events = (1 to 150).map { i =>
        (1L + rnd.nextInt(5), ts(rnd.nextInt(50), rnd.nextInt(60)), i)
      }
      val e = events.map { case (u, t, i) => (u, t) }.toDF("user_id", "ts")
      val deltas = e.select(col("user_id"), col("ts").as("edge"), lit(1).as("d"))
        .unionByName(e.select(col("user_id"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("edge"), lit(-1).as("d")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("edge"), col("d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val got = deltas.withColumn("open", sum("d").over(w))
        .groupBy("user_id").agg(max("open").cast("long").as("mc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: for each event, count same-user intervals covering
      // its start instant (max overlap is always attained at some start)
      val brute = events.groupBy(_._1).map { case (u, evs) =>
        u -> evs.map { case (_, t, _) =>
          evs.count { case (_, t2, _) =>
            !t2.after(t) && t.before(new Timestamp(t2.getTime + 300000L))
          }.toLong
        }.max
      }
      assert(got === brute)
    }
  }

  test("EMA closed form equals the recursive definition on the driver data") {
    val out = queries.CoreQueries.e18EmaForecast(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty)
    // recompute s_D and s_{D-1} recursively per type from the raw data
    val daily = graft.core.Tables.table(spark, sf0001, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(2).toDouble))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = rows.map(_._2)
      val s = xs.tail.foldLeft(List(xs.head)) {
        (acc, x) => (0.3 * x + 0.7 * acc.head) :: acc
      }
      val (sD, sD1) = (s.head, s.tail.head)
      val (gotF, gotE) = out(tpe)
      assert(math.abs(gotF - sD) < 1e-3, s"$tpe forecast $gotF vs $sD")
      assert(math.abs(gotE - math.abs(sD1 - xs.last)) < 1e-3,
        s"$tpe backtest err")
    }
  }

  test("fdViolations separates holding FDs from violated ones") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "y"),   // k=1: dep has 2 values → violated
      (2L, "b", "x"), (2L, "b", "x"),   // k=2: holds
      (3L, "c", "z")                    // k=3: holds
    ).toDF("k", "stable", "wobbly")
    val got = DqChecks.fdViolations(df, "t",
        Seq("k" -> "stable", "k" -> "wobbly"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("t.k->stable") === ((3L, 0L, 1L)), "stable FD must hold")
    assert(got("t.k->wobbly") === ((3L, 1L, 2L)), "wobbly FD must violate once")
  }

  test("fdViolations: null determinant forms a group, null dependents don't fan out") {
    val df = Seq[(java.lang.Long, String)](
      (null, "x"), (null, "y"),          // null det group: ndv 2 → violated
      (1L.asInstanceOf[java.lang.Long], "x"),
      (1L.asInstanceOf[java.lang.Long], null) // null dep ignored: ndv 1
    ).toDF("k", "v")
    val got = DqChecks.fdViolations(df, "t", Seq("k" -> "v")).head()
    assert(got.getLong(1) === 2L)   // two determinant groups (null, 1)
    assert(got.getLong(2) === 1L)   // only the null group violates
    assert(got.getLong(3) === 2L)
  }

  test("fdViolations rejects an empty candidate list with a clear message") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      DqChecks.fdViolations(df, "t", Seq.empty)
    }
    assert(e.getMessage.contains("at least one"))
  }
}
