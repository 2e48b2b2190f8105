package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{EventTimeAgg, PipeStream}

class EventTimeAggSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    ("2024-01-01 10:01:00", "click", 1.0),
    ("2024-01-01 10:04:00", "click", 3.0),
    ("2024-01-01 10:07:00", "view", 5.0),
    ("2024-01-01 10:11:00", "click", 7.0))

  private def batchDf = rows.toDF("s", "k", "v")
    .select($"s".cast("timestamp").as("ts"), $"k", $"v")

  test("tumbling windows aggregate by event time (batch = streaming semantics)") {
    val out = EventTimeAgg.tumbling(batchDf, "ts", "5 minutes", "10 minutes",
        Seq("k"), Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .orderBy("window_start", "k").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 4.0),
      ("2024-01-01 10:05:00.0", "view", 1L, 5.0),
      ("2024-01-01 10:10:00.0", "click", 1L, 7.0)))
  }

  test("sliding windows emit one row per covering window") {
    val single = Seq(("2024-01-01 10:03:00", 1.0)).toDF("s", "v")
      .select($"s".cast("timestamp").as("ts"), $"v")
    val out = EventTimeAgg.sliding(single, "ts", "10 minutes", "5 minutes",
        "10 minutes", Seq.empty, Seq(count(lit(1)).as("n")))
      .orderBy("window_start").collect()
    assert(out.length === 2) // [09:55,10:05) and [10:00,10:10)
  }

  test("streaming tumbling agg with watermark over a file source") {
    val landing = Files.createTempDirectory("eta_landing").toString
    val sch = StructType(Seq(StructField("ts", StringType),
      StructField("k", StringType), StructField("v", DoubleType)))
    Files.write(Paths.get(landing, "batch1.json"),
      rows.map { case (ts, k, v) => s"""{"ts":"$ts","k":"$k","v":$v}""" }
        .mkString("\n").getBytes)

    val src = spark.readStream.schema(sch).json(landing)
      .select($"ts".cast("timestamp").as("ts"), $"k", $"v")
    val agg = EventTimeAgg.tumbling(src, "ts", "5 minutes", "10 minutes",
      Seq("k"), Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("eta_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("eta_out").orderBy("window_start", "k")
        .collect().map(r => (r.getString(2), r.getLong(3)))
      assert(got.toSeq === Seq(("click", 2L), ("view", 1L), ("click", 1L)))
    } finally q.stop()
  }

  test("PipeStream continuous form starts, drains, and stops (ST4/ST10)") {
    val landing = Files.createTempDirectory("ps_cont").toString
    val target = Files.createTempDirectory("ps_cont_t").toString + "/t"
    val cp = Files.createTempDirectory("ps_cont_cp").toString + "/cp"
    val sch = StructType(Seq(StructField("id", LongType)))
    Files.write(Paths.get(landing, "a.json"), """{"id":1}""".getBytes)
    val q = PipeStream.start(spark, landing, sch, target, cp, "1 second")
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() === 1)
      Files.write(Paths.get(landing, "b.json"), """{"id":2}""".getBytes)
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() === 2)
    } finally q.stop() // ST10: suspend ≡ stop; checkpoint resumes later
  }
}
