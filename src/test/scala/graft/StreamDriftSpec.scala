package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dq.DqChecks
import graft.streaming.StreamDrift

case class Obs(k: String, v: Double)

/** Streaming drift monitor: the PSI gauge read from the running
  * (group, bin) counts must equal the batch screen computed over the
  * identical rows — after every micro-batch, not just at the end. */
class StreamDriftSpec extends SparkSuite {
  import spark.implicits._

  private val baseRows = (1 to 100).map(i => Obs("g", i * 0.1)) ++
    (1 to 50).map(i => Obs("h", i * 1.0))

  test("streamed PSI == batch psiDrift after every micro-batch") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseline = baseRows.toDF("k", "v")
    val yard = StreamDrift.yardstick(baseline, "k", "v").cache()

    val in = MemoryStream[Obs]
    val counts = StreamDrift.binnedCounts(in.toDF(), yard, "k", "v")
    val q = counts.writeStream.format("memory")
      .queryName("drift_counts").outputMode("complete").start()

    def gauge = StreamDrift.psi(yard, spark.table("drift_counts"), "k")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    def batchTwin(cur: Seq[Obs]) = DqChecks.psiDrift(
        (baseRows.map(o => (true, o.k, o.v)) ++ cur.map(o => (false, o.k, o.v)))
          .toDF("base", "k", "v"),
        "k", "v", col("base"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    val batch1 = (1 to 60).map(i => Obs("g", 5.0 + i * 0.05))
    val batch2 = (1 to 40).map(i => Obs("g", 20.0 + i)) ++
      (1 to 25).map(i => Obs("h", i * 2.0)) ++
      Seq(Obs("zzz_no_baseline", 1.0)) // no yardstick → silently unscored
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      assert(gauge === batchTwin(batch1))

      in.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = gauge
      assert(streamed === batchTwin(batch1 ++ batch2))
      assert(streamed.map(_._1) === Seq("g", "h")) // unknown group dropped
      // the shifted mass actually moved the gauge
      val psiG = streamed.find(_._1 == "g").get._4
      assert(psiG > 0.1, s"drifted stream scored psi=$psiG")
    } finally q.stop()
  }

  test("streamed categorical PSI == batch psiDriftCategorical after every micro-batch") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseRows = Seq.fill(60)(Cat("mix", "a")) ++ Seq.fill(30)(Cat("mix", "b")) ++
      Seq.fill(10)(Cat("mix", null))
    val yard = StreamDrift.catYardstick(baseRows.toDF("k", "c"), "k", "c").cache()

    val in = MemoryStream[Cat]
    val counts = StreamDrift.catBinnedCounts(in.toDF(), yard, "k", "c")
    val q = counts.writeStream.format("memory")
      .queryName("cat_drift_counts").outputMode("complete").start()

    def gauge = StreamDrift.psi(yard, spark.table("cat_drift_counts"), "k")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    def batchTwin(cur: Seq[Cat]) = DqChecks.psiDriftCategorical(
        (baseRows.map(o => (true, o.k, o.c)) ++ cur.map(o => (false, o.k, o.c)))
          .toDF("base", "k", "c"),
        "k", "c", col("base"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    // batch 1: same mix as baseline; batch 2: a NOVEL class floods in
    // (lands in __OTHER__ and must carry mass) plus an unscored group
    val batch1 = Seq.fill(30)(Cat("mix", "a")) ++ Seq.fill(15)(Cat("mix", "b")) ++
      Seq.fill(5)(Cat("mix", null))
    val batch2 = Seq.fill(40)(Cat("mix", "NOVEL")) ++ Seq(Cat("no_yard", "a"))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      val g1 = gauge
      assert(g1 === batchTwin(batch1))
      assert(g1.head._4 < 0.01, s"same mix scored psi=${g1.head._4}")

      in.addData(batch2: _*)
      q.processAllAvailable()
      val g2 = gauge
      assert(g2 === batchTwin(batch1 ++ batch2))
      assert(g2.map(_._1) === Seq("mix")) // unscored group dropped
      assert(g2.head._4 > 0.3, s"novel-class flood scored psi=${g2.head._4}")
    } finally q.stop()
  }

  test("an empty yardstick wires to an empty monitor, not a crash") {
    val emptyYard = StreamDrift.yardstick(
      spark.emptyDataset[Obs].toDF(), "k", "v")
    assert(emptyYard.isEmpty)
    val counts = StreamDrift.binnedCounts(
      baseRows.toDF(), emptyYard, "k", "v")
    assert(counts.isEmpty, "rows counted against a yardstick-less monitor")
  }
}

case class Cat(k: String, c: String)
