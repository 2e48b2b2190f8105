package graft

import org.apache.spark.sql.functions._
import graft.functions.SnowFns

class SnowFnsSpec extends SparkSuite {
  import spark.implicits._

  test("iff mirrors Snowflake IFF semantics incl. null predicate") {
    val r = Seq((1, 2)).toDF("a", "b").select(
      SnowFns.iff($"a" < $"b", lit("y"), lit("n")),
      SnowFns.iff(lit(null).cast("boolean"), lit("y"), lit("n"))).collect()(0)
    assert(r.getString(0) === "y")
    assert(r.getString(1) === "n") // null predicate → else branch, as IFF
  }

  test("dateadd/datediff with Snowflake unit spellings") {
    val d = Seq(("2024-01-01 00:00:00", "2024-01-02 06:00:00"))
      .toDF("a", "b")
      .select($"a".cast("timestamp").as("a"), $"b".cast("timestamp").as("b"))
    val r = d.select(
      SnowFns.dateadd("hour", -1, $"b"),
      SnowFns.datediffUnits("second", $"a", $"b"),
      SnowFns.datediffUnits("days", $"a", $"b")).collect()(0)
    assert(r.getTimestamp(0).toString === "2024-01-02 05:00:00.0")
    assert(r.getLong(1) === 30L * 3600)
    assert(r.getLong(2) === 1L)
  }

  test("datediff counts boundary CROSSINGS, not complete elapsed units") {
    // Snowflake: 23:00 → next-day 01:00 is DATEDIFF(day)=1 (a midnight
    // was crossed) though only 2h elapsed; Dec 31 → Jan 1 is 1 year
    val d = Seq(("2023-12-31 23:00:00", "2024-01-01 01:00:00"))
      .toDF("a", "b")
      .select($"a".cast("timestamp").as("a"), $"b".cast("timestamp").as("b"))
    val r = d.select(
      SnowFns.datediffUnits("day", $"a", $"b"),
      SnowFns.datediffUnits("year", $"a", $"b"),
      SnowFns.datediffUnits("hour", $"a", $"b")).collect()(0)
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 2L)
  }

  test("left/right mirror Snowflake string slicing") {
    val r = Seq("1234567890").toDF("s").select(
      SnowFns.left($"s", 4), SnowFns.right($"s", 4)).collect()(0)
    assert(r.getString(0) === "1234")
    assert(r.getString(1) === "7890")
  }

  test("qualifyRowNumber1 keeps exactly the top row per key") {
    val d = Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c")).toDF("k", "v", "tag")
    val out = SnowFns.qualifyRowNumber1(d, Seq("k"), Seq($"v".desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(2))).toSeq ===
      Seq((1, "b"), (2, "c")))
  }

  test("unpivot emits one row per value column with ids carried through") {
    val d = Seq(("g1", 0.9, 0.8)).toDF("grp", "m_a", "m_b")
    val out = SnowFns.unpivot(d, Seq("grp"), Seq("m_a", "m_b"))
      .orderBy("metric_name").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq(("g1", "m_a", 0.9), ("g1", "m_b", 0.8)))
  }

  test("qualifyRowNumber1 leaves a caller's __rn column intact") {
    val d = Seq((1, 10, 99), (1, 20, 98)).toDF("k", "v", "__rn")
    val out = SnowFns.qualifyRowNumber1(d, Seq("k"), Seq($"v".desc)).collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1, 20, 98)), "the caller's __rn column was clobbered")
  }

  test("unpivot survives quotes and backticks in names") {
    val d = Seq(("g1", 0.9)).toDF("grp", "it's `rate`")
    val out = SnowFns.unpivot(d, Seq("grp"), Seq("it's `rate`"),
      nameCol = "name col", valueColName = "val's")
    assert(out.columns.toSeq === Seq("grp", "name col", "val's"))
    val r = out.collect()(0)
    assert((r.getString(0), r.getString(1), r.getDouble(2)) ===
      (("g1", "it's `rate`", 0.9)))
  }

  test("nullifZero guards division") {
    val r = Seq((1.0, 0.0)).toDF("n", "d")
      .select($"n" / SnowFns.nullifZero($"d")).collect()(0)
    assert(r.isNullAt(0))
  }
}
