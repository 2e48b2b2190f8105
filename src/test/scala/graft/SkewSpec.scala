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

  /** Joins on the raw key must be broadcast; only (key, __salt) joins
    * may shuffle — the broadcastOrSalted contract (a plain shuffled
    * join on a hot raw key funnels one reducer at corpus scale). */
  private def assertBroadcastOrSalted(df: org.apache.spark.sql.DataFrame,
      key: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString()
    val badJoin = plan.linesIterator.filter(l =>
      l.contains("Join") && l.contains(s"$key#") &&
        !l.contains("Broadcast") && !l.contains("__salt")).toSeq
    assert(badJoin.isEmpty,
      s"plain shuffled join on raw $key:\n${badJoin.mkString("\n")}")
  }

  test("broadcastOrSalted: small estimated side broadcasts, unknown side salts") {
    val dim = Seq(("hot", "H"), ("cold1", "C1")).toDF("k", "tag")
    val viaBroadcast = Skew.broadcastOrSalted(skewed, dim, Seq("k"))
    assert(viaBroadcast.queryExecution.executedPlan.toString()
      .contains("BroadcastHashJoin"))
    assertBroadcastOrSalted(viaBroadcast, "k")
    // stats-less side (checkpoint) reads as unknown → salted branch
    val unknown = dim.localCheckpoint()
    val viaSalt = Skew.broadcastOrSalted(skewed, unknown, Seq("k"))
    assertBroadcastOrSalted(viaSalt, "k")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "tag").count()
      .orderBy("k").collect().toSeq
    assert(viaSalt.groupBy("k", "tag").count().orderBy("k").collect().toSeq
      === plain)
    assert(viaBroadcast.groupBy("k", "tag").count().orderBy("k").collect()
      .toSeq === plain)
  }

  test("t10 salient attach join is broadcast-or-salted in both regimes") {
    val t10 = graft.queries.PipelineQueries.all("t10_salient")
    assertBroadcastOrSalted(t10(spark, sf0001), "token")
    // corpus-scale regime: broadcasting disabled → the salted path must
    // engage and produce the identical ranking
    val expected = t10(spark, sf0001).collect().toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = t10(spark, sf0001)
      assertBroadcastOrSalted(salted, "token")
      assert(salted.queryExecution.executedPlan.toString().contains("__salt"),
        "expected the salted branch with broadcasting disabled")
      assert(salted.collect().toSeq === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
