package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFns

/** Continuous maintenance of the [[graft.operators.TokenIndex]]
  * token-stats table: each micro-batch's documents tokenize into
  * delta counts written to their own `batch=<id>` directory with
  * overwrite — a crash-replayed epoch rewrites its own deltas instead
  * of double-counting them (the [[StreamIndexProbe]] exactly-once
  * discipline, applied to the LSM delta tail). Serving merges the
  * optional batch-built base plus every delta directory with one
  * dictionary-scale sum — counts are mergeable, so batch boundaries
  * and replay order can never change the served table.
  *
  * This is the text tier's continuous-ingestion story: the corpus
  * tokenize cost is paid once per document as it ARRIVES, and
  * domain-shift/vocabulary questions (t39's KL, top-token profiles)
  * are answered from dictionary-scale state at any moment — no
  * nightly full-corpus pass. */
object StreamTokenStats {

  /** Start maintaining `statsDir/deltas` from a streaming documents
    * frame. `statsDir/base` may hold a batch-built starting point
    * ([[seedBase]]). */
  def start(docs: DataFrame, statsDir: String, checkpoint: String,
      textCol: String, srcCol: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // a reset checkpoint restarts ids at 0 — the overwrite below
          // would then destroy committed old epochs; detect and refuse
          EpochGuard.check(batch.sparkSession, s"$statsDir/deltas", batchId)
          batch
            .select(col(srcCol).as("source"),
              explode(TextFns.tokens(col(textCol))).as("token"))
            .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite")
            .parquet(s"$statsDir/deltas/batch=$batchId")
        }
      }
      .start()

  /** Seed the base table from an existing corpus (one batch tokenize —
    * [[graft.operators.TokenIndex.buildTokenStats]]'s layout). */
  def seedBase(docs: DataFrame, statsDir: String, idCol: String,
      textCol: String, srcCol: String): Unit =
    graft.operators.TokenIndex.counts(docs, idCol, textCol, srcCol)
      .write.mode("overwrite").parquet(s"$statsDir/base")

  /** The served (source, token, cnt) table: base ∪ deltas, sum-merged.
    * Equal to a one-shot batch build over everything ingested so far. */
  def servedStats(spark: SparkSession, statsDir: String): DataFrame = {
    // Hadoop FS, not java.io.File: base/deltas may live on HDFS/S3
    // where a local-file existence probe would silently report absent
    def readIf(path: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.parquet(path).select("source", "token", "cnt"))
      else None
    }
    val parts = readIf(s"$statsDir/base").toSeq ++
      readIf(s"$statsDir/deltas").toSeq
    require(parts.nonEmpty, s"no token stats under $statsDir")
    parts.reduce(_.unionByName(_))
      .groupBy("source", "token").agg(sum("cnt").as("cnt"))
  }
}
