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

  test("nullifZero guards division") {
    val r = Seq((1.0, 0.0)).toDF("n", "d")
      .select($"n" / SnowFns.nullifZero($"d")).collect()(0)
    assert(r.isNullAt(0))
  }
}
