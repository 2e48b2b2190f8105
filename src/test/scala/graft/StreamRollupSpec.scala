package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamRollup

case class Fact(k: String, v: Double)

/** Continuous materialized-rollup maintenance: micro-batches merge into
  * the stored rollup; after any number of batches the store equals the
  * full recompute over everything ingested. */
class StreamRollupSpec extends SparkSuite {
  import spark.implicits._

  private val rollup: DataFrame => DataFrame =
    df => df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))

  test("batches merge into the stored rollup; store == recompute over all facts") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("stream_rollup").toString + "/t"
    val ckpt = Files.createTempDirectory("stream_rollup_ckpt").toString
    // seed: the empty rollup with the right schema
    rollup(Seq.empty[Fact].toDF()).write.parquet(dir)

    val facts = MemoryStream[Fact]
    val q = StreamRollup.start(facts.toDF(), dir, Seq("k"), rollup, ckpt)
    def stored = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    try {
      facts.addData(Fact("a", 1.0), Fact("a", 2.0), Fact("b", 5.0))
      q.processAllAvailable()
      assert(stored === Seq(("a", 2L, 3.0), ("b", 1L, 5.0)))

      // second batch: existing keys accumulate, new keys appear
      facts.addData(Fact("a", 4.0), Fact("c", 7.0))
      q.processAllAvailable()
      assert(stored === Seq(("a", 3L, 7.0), ("b", 1L, 5.0), ("c", 1L, 7.0)))
    } finally q.stop()
  }

  test("a crash-replayed batch is not merged twice (marker-gated swap)") {
    val dir = Files.createTempDirectory("stream_rollup_replay").toString + "/t"
    rollup(Seq.empty[Fact].toDF()).write.parquet(dir)
    def stored = spark.read.parquet(dir).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

    val batch = Seq(Fact("a", 1.0), Fact("a", 2.0)).toDF()
    graft.streaming.StreamRollup.applyBatch(batch, 0L, dir, Seq("k"), rollup)
    assert(stored === Seq(("a", 2L, 3.0)))
    // foreachBatch replays batch 0 after a crash — must be a no-op
    graft.streaming.StreamRollup.applyBatch(batch, 0L, dir, Seq("k"), rollup)
    assert(stored === Seq(("a", 2L, 3.0)))
    // the next real batch still applies
    graft.streaming.StreamRollup.applyBatch(Seq(Fact("a", 4.0)).toDF(), 1L,
      dir, Seq("k"), rollup)
    assert(stored === Seq(("a", 3L, 7.0)))
  }

  test("a batch id below the marker fails loudly (checkpoint reset, not a replay)") {
    val dir = Files.createTempDirectory("stream_rollup_reset").toString + "/t"
    rollup(Seq.empty[Fact].toDF()).write.parquet(dir)
    graft.streaming.StreamRollup.applyBatch(Seq(Fact("a", 1.0)).toDF(), 5L,
      dir, Seq("k"), rollup)
    // a fresh/reset checkpoint restarts ids at 0 — silently skipping
    // would discard every batch until the counter caught up at 5
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamRollup.applyBatch(Seq(Fact("b", 1.0)).toDF(), 0L,
        dir, Seq("k"), rollup)
    }
    assert(e.getMessage.contains("checkpoint"))
    // the legal crash replay (same id as the marker) stays a silent no-op
    graft.streaming.StreamRollup.applyBatch(Seq(Fact("a", 9.0)).toDF(), 5L,
      dir, Seq("k"), rollup)
    def stored = spark.read.parquet(dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(stored === Seq(("a", 1L, 1.0)))
  }
}
