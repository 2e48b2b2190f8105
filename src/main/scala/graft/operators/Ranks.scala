package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable EXACT global ranking: the distributed form of
  * `ntile(n).over(Window.orderBy(...))`, which Spark plans as ONE task
  * sorting the whole frame — the single-reducer anti-pattern for any
  * unbounded input (fine for the bounded aggregate frames the q10/q57
  * family runs on, fatal for a customer-grained frame at 100 TB).
  *
  * Shape (the [[Packing]] two-phase prefix-sum discipline): range-
  * repartition on the total order, rank WITHIN each partition (a
  * key-partitioned window — parallel), then add per-partition offsets
  * derived from one bounded collect of partition counts. The offsets
  * job and the result job must see the SAME range boundaries
  * (RangePartitioner samples per execution), so the partitioned frame
  * is persisted across both and the result is eagerly materialized
  * before release ([[Caches]] discipline).
  *
  * Values are IDENTICAL to the single-task window — same total order
  * (callers must make `orderCols` a total order, tie-break included),
  * same NTILE bucket arithmetic (first `total % n` buckets take the
  * extra row) — so oracles written against `ntile()` replay unchanged.
  */
object Ranks {

  /** `df` + an `out` column = exact NTILE(`n`) position of each row in
    * the global `orderCols` order. */
  def globalNtile(df: DataFrame, n: Int, orderCols: Seq[Column],
      out: String): DataFrame = {
    require(n >= 1, s"ntile n ($n) must be >= 1")
    require(orderCols.nonEmpty, "globalNtile needs at least one order column")
    val spark = df.sparkSession
    val parts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions", "").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    val parted = df.repartitionByRange(math.max(parts, 1), orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    parted.persist()
    try {
      // bounded by the partition count — the one driver-side structure
      val counts = parted.groupBy(col("__pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      val total = counts.map(_._2).sum
      val offsets = counts
        .scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid + 1, acc + c) }
        .init // (pid, rows before pid)'s running form: entry i = offset of counts(i)._1
      val offRows = counts.map(_._1).zip(offsets.map(_._2))
      import spark.implicits._
      val offDf = broadcast(offRows.toSeq.toDF("__pid", "__off"))
      val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      val rn = row_number().over(w).cast("long") + col("__off")
      // Spark's NTILE arithmetic: q = total/n rows per bucket, the first
      // r = total%n buckets take one extra row
      val q = total / n
      val r = total % n
      val bucket =
        when(lit(r) > 0 && rn <= lit(r * (q + 1)),
          ((rn - 1) / lit(q + 1)).cast("int") + 1)
          .otherwise(lit(r.toInt) +
            ((rn - lit(r * (q + 1)) - 1) / lit(math.max(q, 1L))).cast("int") + 1)
      val result = parted.join(offDf, "__pid")
        .withColumn(out, bucket)
        .drop("__pid", "__off")
      // materialize while the persisted partitioning is live: a lazy
      // result re-executed after unpersist would re-sample DIFFERENT
      // range boundaries than the ones the offsets were computed from
      Caches.eager(result)
    } finally parted.unpersist()
  }
}
