package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqSketchAgg

class FreqSketchSpec extends SparkSuite {
  import spark.implicits._

  private def sketchOf(values: Seq[String], capacity: Int,
      parts: Int = 8): Map[String, Long] =
    values.toDF("v").repartition(parts)
      .agg(FreqSketchAgg.freqSketch(col("v"), capacity).as("sk"))
      .select(explode(col("sk"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when distinct values fit the capacity") {
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(5000)(s"t${rnd.nextInt(40)}")
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketchOf(values, capacity = 64) === exact)
  }

  test("heavy hitter survives eviction within the additive bound") {
    val rnd = new scala.util.Random(13)
    // one 30% heavy hitter over a 500-value tail, capacity 16:
    // n/(cap+1) ≈ 5.9% of n, so the hitter is guaranteed present
    val n = 20000
    val values = Seq.fill(n)(
      if (rnd.nextDouble() < 0.3) "HEAVY" else s"tail${rnd.nextInt(500)}")
    val truth = values.count(_ == "HEAVY").toLong
    val sk = sketchOf(values, capacity = 16)
    assert(sk.contains("HEAVY"), "heavy hitter evicted")
    val est = sk("HEAVY")
    assert(est <= truth, "Misra-Gries must never overestimate")
    assert(est >= truth - n / 17, s"est $est below the additive band of $truth")
  }

  test("merge across partitionings agrees when summaries stay exact") {
    val values = (1 to 3000).map(i => s"k${i % 50}")
    val a = sketchOf(values, capacity = 64, parts = 2)
    val b = sketchOf(values, capacity = 64, parts = 29)
    assert(a === b)
  }

  test("streaming heavy hitters: complete-mode sketch equals the batch sketch") {
    // the sketch state is mergeable, so it drops into a streaming
    // aggregation unchanged — per micro-batch partials merge into the
    // running summary exactly like map-side partials merge in batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = input.toDF().toDF("v")
      .agg(FreqSketchAgg.freqSketch(col("v"), 64).as("sk"))
      .select(explode(col("sk")))
      .writeStream.format("memory").queryName("freq_sk")
      .outputMode("complete").start()
    try {
      val batch1 = (1 to 500).map(i => s"k${i % 20}")
      val batch2 = (1 to 700).map(i => s"k${i % 35}")
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("freq_sk").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = (batch1 ++ batch2).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
