package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSuite {
  import spark.implicits._

  // a skewed frame: one hot key with 10k rows, 100 cold keys
  private lazy val skewed = spark.range(10000)
    .select(lit("hot").as("k"), (col("id") % 7).cast("double").as("v"))
    .unionAll(spark.range(100)
      .select(concat(lit("cold"), col("id")).as("k"),
        col("id").cast("double").as("v")))

  test("salted aggregation equals the unsalted result exactly") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2)))
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", salts = 8)
      .orderBy("k").collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join equals the plain inner join exactly") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("missing", "M"))
      .toDF("k", "tag")
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k", "tag").count().orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .groupBy("k", "tag").count().orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(salted.toSeq === plain.toSeq)
    // the hot key really spread: its rows carry several distinct salts
    val saltSpread = skewed.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(saltSpread > 1)
  }
}
