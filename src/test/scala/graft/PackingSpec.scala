package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    // single global window — the reference semantics
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", sum(col("n")).over(w) - col("n"))
      .select(col("id"), col("n").as("n_tokens"),
        expr(s"__prev div $budget").as("bin_id"),
        pmod(col("__prev"), lit(budget)).as("bin_offset"))
  }

  test("two-phase packing equals the global-window reference, any partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 500L).map(i => i -> (1L + rnd.nextInt(400)))
    def collectPack(parts: Int) =
      Packing.packBins(rows.toDF("id", "n").repartition(parts), "id", col("n"), 1000L)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = naive(rows.toDF("id", "n"), 1000L).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(collectPack(1) === want)
    assert(collectPack(13) === want)
  }

  test("bins fill contiguously: offsets advance by token counts, reset per bin") {
    val d = Seq((1L, 600L), (2L, 600L), (3L, 600L), (4L, 600L))
      .toDF("id", "n")
    val got = Packing.packBins(d, "id", col("n"), 1000L)
      .orderBy("id").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    // cum-prev: 0, 600, 1200, 1800 → bins 0,0,1,1; offsets 0,600,200,800
    assert(got === Seq((0L, 0L), (0L, 600L), (1L, 200L), (1L, 800L)))
  }
}
