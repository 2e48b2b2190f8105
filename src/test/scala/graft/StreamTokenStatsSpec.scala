package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TokenIndex
import graft.streaming.StreamTokenStats

case class ArrivingTextDoc(doc_id: Long, text: String, source: String)

/** Streaming token-stats maintenance: the served (source, token, cnt)
  * table must equal a one-shot batch build over everything ingested so
  * far, after every micro-batch, with or without a seeded base — and a
  * replayed epoch must not double-count. */
class StreamTokenStatsSpec extends SparkSuite {
  import spark.implicits._

  private def docRows(from: Int, until: Int) = {
    val corpus = graft.core.Tables.table(spark, sf0001, "documents")
      .filter(col("doc_id") >= from && col("doc_id") < until)
      .select("doc_id", "text", "source")
    corpus.collect().map(r =>
      ArrivingTextDoc(r.getLong(0), r.getString(1), r.getString(2)))
  }

  private def stats(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("served stats == one-shot build after every micro-batch (seeded base)") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = graft.core.Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text", "source")
    val dir = Files.createTempDirectory("sts").toString
    val ckpt = Files.createTempDirectory("sts_ckpt").toString
    StreamTokenStats.seedBase(all.filter(col("doc_id") < 20),
      dir, "doc_id", "text", "source")

    val stream = MemoryStream[ArrivingTextDoc]
    val q = StreamTokenStats.start(stream.toDF(), dir, ckpt,
      "text", "source")
    try {
      stream.addData(docRows(20, 30).toIndexedSeq)
      q.processAllAvailable()
      val afterB1 = stats(StreamTokenStats.servedStats(spark, dir))
      val wantB1 = stats(TokenIndex.counts(
        all.filter(col("doc_id") < 30), "doc_id", "text", "source"))
      assert(afterB1 === wantB1)

      stream.addData(docRows(30, 40).toIndexedSeq)
      q.processAllAvailable()
      val afterB2 = stats(StreamTokenStats.servedStats(spark, dir))
      val wantB2 = stats(TokenIndex.counts(
        all.filter(col("doc_id") < 40), "doc_id", "text", "source"))
      assert(afterB2 === wantB2)
    } finally q.stop()
  }

  test("a replayed epoch overwrites its own deltas — no double counting") {
    val all = graft.core.Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text", "source")
    val dir = Files.createTempDirectory("sts_replay").toString
    val batch = all.filter(col("doc_id") < 10)
    // simulate the foreachBatch body running twice for the same epoch
    // (crash between the write and the checkpoint commit)
    (1 to 2).foreach { _ =>
      TokenIndex.counts(batch, "doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/deltas/batch=7")
    }
    val got = stats(StreamTokenStats.servedStats(spark, dir))
    val want = stats(TokenIndex.counts(batch, "doc_id", "text", "source"))
    assert(got === want)
  }
}
