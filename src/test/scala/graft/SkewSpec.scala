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

  test("salted join caps the hot key's per-task load (max shuffle-read rows)") {
    // the measurable skew claim: under a plain shuffled join, EVERY row
    // of the hot key funnels through one reducer task; salted, the hot
    // key spreads over `salts` reducers. Shuffle-read ROWS per task is
    // the deterministic proxy for task time (same rows, same work here).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    def maxTaskShuffleRows(job: => Unit): Long = {
      val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          synchronized {
            Option(t.taskMetrics).foreach(m =>
              rows += m.shuffleReadMetrics.recordsRead)
          }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        job
        // the listener bus is async — wait until the event stream drains
        // (row count stable across a beat), bounded at 10s
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var last = -1
        while (listener.synchronized(rows.size) != last &&
            System.nanoTime() < deadline) {
          last = listener.synchronized(rows.size)
          Thread.sleep(200)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      listener.synchronized(rows.max)
    }
    val dim = Seq(("hot", "H"), ("cold1", "C1")).toDF("k", "tag")
      .localCheckpoint() // stats-less: forces the shuffled-join regime
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // at toy scale AQE folds the salted partitions (tiny by bytes) back
    // into one task, erasing the spread we're measuring; at real scale
    // partitions are fat and stay separate — pin them here. And with
    // the suite's 4 shuffle partitions, (key, salt) hash collisions
    // clump several salts per reducer — measure at 16 partitions, the
    // many-reducers regime the salting targets.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val plainMax = maxTaskShuffleRows {
        skewed.join(dim, Seq("k")).write.format("noop")
          .mode("overwrite").save()
      }
      val saltedMax = maxTaskShuffleRows {
        Skew.saltedJoin(skewed, dim, Seq("k"), salts = 16)
          .write.format("noop").mode("overwrite").save()
      }
      // hot key = 10000 of 10100 rows: plain reads them in ONE task;
      // salted spreads over 16 salts across 16 reducers. Require a ≥3x
      // max-task improvement — well below the ideal 16x (hash
      // clumping), far above noise.
      assert(plainMax >= 10000L, s"plain join max-task rows: $plainMax")
      assert(saltedMax * 3 <= plainMax,
        s"salting did not spread the hot key: plain=$plainMax salted=$saltedMax")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        prevCoalesce)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("e19 declared query runs the salted aggregation path and matches the plain twin") {
    val e19 = graft.queries.CoreQueries.all("e19_salted_type_stats")
    val df = e19(spark, sf0001)
    assert(df.queryExecution.optimizedPlan.toString().contains("__salt"),
      "e19 must aggregate through the salted two-phase path")
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val plain = events
      .select(col("event_type"), round(col("value"), 6)
        .cast("decimal(38,6)").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("v").cast("double"), 4).as("sum_value"))
      .orderBy("event_type").collect().toSeq
    assert(df.collect().toSeq === plain)
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
