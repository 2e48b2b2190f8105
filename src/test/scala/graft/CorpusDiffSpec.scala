package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusDiff

class CorpusDiffSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "src")

  test("diff classifies all four fates, meta from the surviving side") {
    val a = corpus((1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2"))
    val b = corpus((1L, "alpha", "s1"), (2L, "beta REVISED", "s1"),
      (4L, "delta", "s3"))
    val out = CorpusDiff.diff(a, b, "id", "text", Seq("src"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, "unchanged", "s1"),
      (2L, "changed", "s1"),
      (3L, "removed", "s2"), // meta from v1: the only side that has it
      (4L, "added", "s3"))) // meta from v2
  }

  test("identical snapshots diff to all-unchanged") {
    val a = corpus((1L, "x", "s"), (2L, "y", "s"))
    val out = CorpusDiff.diff(a, a, "id", "text", Seq("src"))
    assert(out.filter(col("change") =!= "unchanged").isEmpty)
    assert(out.count() === 2)
  }

  test("diffReport aggregates per (meta, change)") {
    val a = corpus((1L, "x", "s1"), (2L, "y", "s1"), (3L, "z", "s2"))
    val b = corpus((1L, "x", "s1"), (2L, "y2", "s1"))
    val rep = CorpusDiff.diffReport(a, b, "id", "text", Seq("src"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rep === Set(("s1", "unchanged", 1L), ("s1", "changed", 1L),
      ("s2", "removed", 1L)))
  }

  test("null content is presence, not absence") {
    val a = Seq((1L, Option("x"), "s"), (2L, Option.empty[String], "s"),
      (3L, Option("y"), "s")).toDF("id", "text", "src")
    val b = Seq((1L, Option.empty[String], "s"), (2L, Option.empty[String], "s"),
      (4L, Option.empty[String], "s")).toDF("id", "text", "src")
    val out = CorpusDiff.diff(a, b, "id", "text", Seq("src"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "changed",   // content -> null is a change, not a removal
      2L -> "unchanged", // null on both sides: same (absent) content
      3L -> "removed",
      4L -> "added"))
  }

  test("the exchange carries hashes, not document bodies") {
    // the full-outer join joins the narrow (id, md5, meta) projections:
    // every plan node ABOVE the first exchange (join, sorts, final
    // project) must reference only id/hash/meta columns — a bare
    // text#n reference up there would mean bodies shuffled (the md5
    // runs in the scan-side project BELOW the exchange)
    val a = corpus((1L, "x", "s"), (2L, "y", "s"))
    val plan = CorpusDiff.diff(a, a, "id", "text", Seq("src"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("Exchange"), s"expected a shuffle in:\n$plan")
    val aboveExchange = plan.linesIterator
      .takeWhile(l => !l.contains("Exchange")).mkString("\n")
    assert(!aboveExchange.matches("(?s).*text#\\d+.*"),
      s"document bodies reach the shuffle:\n$plan")
  }
}
