package graft

import graft.core.Tables

/** Bucketing = the co-located-join strategy from the scale posture:
  * both sides pre-partitioned on the join key ⇒ no shuffle exchange in
  * the join plan. */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    Tables.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4)
    Tables.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4)

    // at this test scale Spark would broadcast (bypassing bucketing);
    // disable it to exercise the big-big co-located path the feature
    // exists for
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(1500)}")
      // and it still computes the right thing
      assert(joined.count() ===
        lineitem.join(orders, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
