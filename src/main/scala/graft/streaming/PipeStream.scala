package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** S8 + ST1-ST3 + S6: the Snowpipe / CDC-stream analog.
  *
  * Snowflake side: files land on a stage, a pipe's COPY INTO ingests each
  * file exactly once (load history), a STREAM exposes the changes with
  * `METADATA$ACTION`, and consuming DML advances the stream offset
  * transactionally (A4:300-345; assignment3/py_snowpipe.py:55-82).
  *
  * Spark side: a Structured Streaming file source watches the landing
  * directory; the checkpoint IS the load history + stream offset — commit
  * happens only after the batch's sink write succeeds, giving the same
  * exactly-once-per-file contract across restarts (SURVEY.md §7.4.1:
  * never hand-roll offset files). `pathGlobFilter` is the COPY pattern
  * (A4:387); the empty-batch short-circuit is the
  * `system$stream_has_data` gate (ST6).
  */
object PipeStream {

  /** Drain everything currently staged into the target table, then stop
    * (Trigger.AvailableNow ≡ a manual `ALTER PIPE REFRESH` / task run).
    * Each row carries the CDC metadata columns `_action` (append-only
    * source → always INSERT, ST2) and `_batch_id`. */
  def drain(spark: SparkSession, landingDir: String, schema: StructType,
      targetDir: String, checkpointDir: String,
      pattern: Option[String] = None): Unit = {
    val reader = spark.readStream.schema(schema)
    pattern.foreach(p => reader.option("pathGlobFilter", p))
    val src = reader.json(landingDir)
      .withColumn("_action", lit("INSERT"))

    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { // ST6: skip compute on empty micro-batch
          batch.withColumn("_batch_id", lit(batchId))
            .write.mode(SaveMode.Append).parquet(targetDir)
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Continuous form (ST4): same pipeline on a processing-time cadence —
    * the reference's `schedule='3 minute'` loader task (A4:380-388).
    * Caller owns the returned query's lifecycle (ST10 suspend/resume =
    * stop/start). */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
      targetDir: String, checkpointDir: String, cadence: String,
      pattern: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    pattern.foreach(p => reader.option("pathGlobFilter", p))
    reader.json(landingDir)
      .withColumn("_action", lit("INSERT"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(cadence))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.withColumn("_batch_id", lit(batchId))
            .write.mode(SaveMode.Append).parquet(targetDir)
        }
      }
      .start()
  }
}
