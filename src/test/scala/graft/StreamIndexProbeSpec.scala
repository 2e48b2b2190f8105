package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamIndexProbe

case class ArrivingDoc(doc_id: Long, text: String)

/** Streaming dedup-against-history: arriving docs probe the frozen
  * MinHash index; the pair ledger across micro-batches equals the
  * one-shot batch probe of the same docs. */
class StreamIndexProbeSpec extends SparkSuite {
  import spark.implicits._

  test("streamed probes accumulate to the one-shot batch probe") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val idx = Files.createTempDirectory("sip_idx").toString
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx, parts = 16)

    // arrivals: near-dup copies of docs 0-5 (one appended token) under
    // fresh ids — some in batch 1, some in batch 2
    val arrivals = corpus.filter($"doc_id" < 6)
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("text", concat($"text", lit(" tail")))
      .collect().map(r => ArrivingDoc(r.getLong(0), r.getString(1)))

    val out = Files.createTempDirectory("sip_out").toString
    val ckpt = Files.createTempDirectory("sip_ckpt").toString
    val stream = MemoryStream[ArrivingDoc]
    val q = StreamIndexProbe.start(stream.toDF(), idx, out, ckpt,
      "doc_id", "text", threshold = 0.5)
    try {
      stream.addData(arrivals.take(3).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(arrivals.drop(3).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "index_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ledger = rows(spark.read.parquet(out))
    val oneShot = rows(Dedup.probeMinhashIndex(spark, idx,
      arrivals.toSeq.toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5))
    assert(ledger === oneShot)
    // every planted near-dup found its original
    assert((0 until 6).forall(i =>
      ledger.exists(p => p._1 == 100000L + i && p._2 == i)),
      s"planted pair missing from $ledger")
  }
}
