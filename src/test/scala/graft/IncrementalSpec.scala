package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))

  private lazy val data = spark.range(2000)
    .select((col("id") % 37).as("k"), (col("id") % 11).cast("double").as("v"))

  test("merge of split rollups equals the full recompute (sum/count states)") {
    // arbitrary split — including keys present on only one side
    val a = data.filter(col("id") < 700)
    val b = data.filter(col("id") >= 700)
    val merged = Incremental.mergeRollups(rollup(a), rollup(b), Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val full = rollup(data)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(merged.toSeq === full.toSeq)
  }

  test("one-sided keys survive the merge unchanged") {
    val a = Seq((1L, 2.0), (1L, 3.0)).toDF("k", "v")
    val b = Seq((2L, 5.0)).toDF("k", "v")
    val merged = Incremental.mergeRollups(rollup(a), rollup(b), Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(merged.toSeq === Seq((1L, 2L, 5.0), (2L, 1L, 5.0)))
  }

  test("schema mismatch and key-only schemas are rejected") {
    val r = rollup(data.limit(10))
    intercept[IllegalArgumentException] {
      Incremental.mergeRollups(r, r.withColumnRenamed("sv", "x"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      val keysOnly = r.select("k")
      Incremental.mergeRollups(keysOnly, keysOnly, Seq("k"))
    }
  }
}
