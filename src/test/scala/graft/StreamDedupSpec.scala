package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup

case class KeyedMsg(k: String, ts: Timestamp)

/** Streaming exact dedup: at-least-once upstream → exactly-once-per-key
  * downstream inside the watermark horizon, with watermark-bounded
  * state. */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  test("redelivered keys within the watermark are dropped across batches") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KeyedMsg]
    val out = StreamDedup.dedupedStream(input.toDF(), "ts", Seq("k"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(min: Int) = new Timestamp(min * 60000L)
    try {
      input.addData(KeyedMsg("a", t(1)), KeyedMsg("b", t(2)), KeyedMsg("a", t(3)))
      q.processAllAvailable()
      // redelivery in a LATER batch, still inside the horizon
      input.addData(KeyedMsg("a", t(4)), KeyedMsg("c", t(5)))
      q.processAllAvailable()
      val keys = spark.table("dedup_out").collect().map(_.getString(0)).sorted
      assert(keys.toSeq === Seq("a", "b", "c"))
    } finally q.stop()
  }
}
