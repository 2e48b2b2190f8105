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

  /** The one pipeline both triggers share: watch the landing dir, stamp
    * the CDC metadata columns, land each micro-batch in its own
    * `batch=<id>` epoch directory WITH OVERWRITE. foreachBatch is
    * at-least-once — a crash between the sink write and the checkpoint
    * commit replays the batch — and a flat-directory append would land
    * those rows twice; the per-epoch overwrite makes the replay rewrite
    * its own directory instead (the [[StreamIndexProbe]] /
    * [[StreamTokenStats]] discipline), keeping the exactly-once-per-file
    * contract the scaladoc promises end to end, not just at the source. */
  private def build(spark: SparkSession, landingDir: String,
      schema: StructType, targetDir: String, checkpointDir: String,
      trigger: Trigger, pattern: Option[String]) = {
    val reader = spark.readStream.schema(schema)
    pattern.foreach(p => reader.option("pathGlobFilter", p))
    reader.json(landingDir)
      .withColumn("_action", lit("INSERT"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { // ST6: skip compute on empty micro-batch
          batch.withColumn("_batch_id", lit(batchId))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$targetDir/batch=$batchId")
        }
      }
  }

  /** Drain everything currently staged into the target table, then stop
    * (Trigger.AvailableNow ≡ a manual `ALTER PIPE REFRESH` / task run).
    * Each row carries the CDC metadata columns `_action` (append-only
    * source → always INSERT, ST2) and `_batch_id` (also the epoch
    * directory's partition value). */
  def drain(spark: SparkSession, landingDir: String, schema: StructType,
      targetDir: String, checkpointDir: String,
      pattern: Option[String] = None): Unit =
    build(spark, landingDir, schema, targetDir, checkpointDir,
      Trigger.AvailableNow(), pattern).start().awaitTermination()

  /** Continuous form (ST4): same pipeline on a processing-time cadence —
    * the reference's `schedule='3 minute'` loader task (A4:380-388).
    * Caller owns the returned query's lifecycle (ST10 suspend/resume =
    * stop/start). */
  def start(spark: SparkSession, landingDir: String, schema: StructType,
      targetDir: String, checkpointDir: String, cadence: String,
      pattern: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    build(spark, landingDir, schema, targetDir, checkpointDir,
      Trigger.ProcessingTime(cadence), pattern).start()
}
