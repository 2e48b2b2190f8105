package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamApply

case class Change(id: Long, seq: Long, action: String, v: String)

/** Continuous CDC materialization: upserts/deletes land batch by batch,
  * the snapshot stays consistent between batches, restarts resume. */
class StreamApplySpec extends SparkSuite {
  import spark.implicits._

  test("change stream materializes onto the snapshot across micro-batches") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("stream_apply").toString + "/t"
    val ckpt = Files.createTempDirectory("stream_apply_ckpt").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.parquet(dir)

    val changes = MemoryStream[Change]
    val q = StreamApply.start(changes.toDF(), dir, "id", "seq", "action", ckpt)
    try {
      changes.addData(Change(1, 1, "U", "a2"), Change(2, 1, "D", "b"),
        Change(4, 1, "I", "d"))
      q.processAllAvailable()
      assert(spark.read.parquet(dir).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq(1L -> "a2", 3L -> "c", 4L -> "d"))

      // a second batch applies on top of the first batch's snapshot
      changes.addData(Change(4, 2, "U", "d2"), Change(3, 2, "D", "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(dir).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq(1L -> "a2", 4L -> "d2"))
    } finally q.stop()
  }
}
