package graft.operators

import graft.operators.Caches.EagerOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing (concat-and-chunk): lay documents out
  * in id order, accumulate token counts, and cut bins every `budget`
  * tokens — each row learns its bin and offset. The contiguous-fill
  * shape pretraining uses to build fixed-budget training sequences.
  *
  * The global running sum is computed SCALABLY: a naive
  * `Window.orderBy(id)` with no partition key funnels the corpus
  * through one task; instead, range-partition by id, take
  * per-partition cumulative sums, and add each partition's prefix
  * offset (per-partition totals are partition-count-scale — collected
  * once, broadcast back). Result is independent of the partitioning. */
object Packing {

  def packBins(docs: DataFrame, idCol: String, tokenCount: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.select(col(idCol).as("id"), tokenCount.cast("long").as("n_tokens"))
      .repartitionByRange(col("id"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = n.withColumn("__lcum", sum(col("n_tokens")).over(wLocal))
      .eagerCheckpoint() // reused: per-partition totals + the final layout
    val totals = local.groupBy("__pid").agg(max(col("__lcum")).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.init.zip(totals).map { case ((_, prefix), (pid, _)) => (pid, prefix) }
    val offsetsDf = offsets.toSeq.toDF("__pid", "__offset")
    local.join(broadcast(offsetsDf), "__pid")
      .withColumn("__prev", col("__offset") + col("__lcum") - col("n_tokens"))
      .select(col("id").as(idCol), col("n_tokens"),
        // integer division (not double `/`): exact for any corpus size
        expr(s"__prev div $budget").as("bin_id"),
        pmod(col("__prev"), lit(budget)).as("bin_offset"))
  }
}
