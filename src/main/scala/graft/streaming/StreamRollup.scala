package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Tables
import graft.operators.Incremental

/** Continuous materialized-rollup maintenance — the streaming half of
  * [[graft.operators.Incremental]]: each micro-batch is partially
  * aggregated by the caller-supplied `rollup` and merged by summation
  * into the stored rollup table, an atomic snapshot swap per batch
  * (same swap discipline as [[StreamApply]]).
  *
  * This is the dynamic-table / incremental-matview pattern: the stored
  * state is keys × fixed-width mergeable aggregates, each batch touches
  * |rollup| + |batch rollup| rows, and the fact history is never
  * re-read.
  *
  * Exactly-once: `foreachBatch` is at-least-once, and summation — unlike
  * [[graft.operators.Cdc.applyChanges]] — is NOT idempotent, so a
  * crash-replayed batch must be detected, not re-merged. The applied
  * micro-batch id is committed ATOMICALLY with the data (a marker file
  * inside the same snapshot swap, [[Tables.replaceAtomic]]); a replayed
  * batch finds its own id (or a later one) already recorded and
  * no-ops. Crash before the swap → marker still holds the previous id →
  * the replay merges against the PRE-swap snapshot. Either way the
  * batch lands exactly once.
  *
  * Scale posture: the merge is one key-partitioned shuffle of
  * rollup-sized (not fact-sized) frames; the rewrite cost is bounded by
  * the rollup's own cardinality — the entire point of keeping a rollup
  * instead of the facts.
  */
object StreamRollup {

  private val MarkerFile = "_applied_batch"

  private[graft] def appliedBatchId(spark: SparkSession, dir: String): Long =
    Tables.readMarker(spark, dir, MarkerFile).map(_.toLong).getOrElse(-1L)

  /** One batch's merge, exactly once: skips ids at or below the marker
    * (crash replay), otherwise merges and swaps with the new id riding
    * the same atomic rename. Exposed for direct testing. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
      rollupDir: String, keys: Seq[String],
      rollup: DataFrame => DataFrame): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // a batch whose swap crashed between the two renames left the
    // snapshot moved aside; heal BEFORE the marker/snapshot reads or
    // the replayed batch crash-loops on the missing directory forever
    Tables.recoverReplaceAtomic(spark, rollupDir)
    val applied = appliedBatchId(spark, rollupDir)
    // legal crash replay re-delivers AT MOST the last applied batch
    // (foreachBatch replays only the final uncommitted micro-batch);
    // a batchId BELOW the marker means the stream restarted against a
    // fresh/reset checkpoint whose ids restart at 0 — silently skipping
    // until the counter catches up would discard every batch while the
    // runs look SUCCEEDED. Fail loudly; the operator either restores the
    // original checkpoint or re-seeds the rollup dir alongside the new one.
    if (batchId == applied) return
    require(batchId > applied,
      s"StreamRollup: batch $batchId is below the applied marker " +
        s"$applied at $rollupDir — the streaming checkpoint was reset " +
        "or replaced; restore it, or rebuild/re-seed the rollup " +
        "directory to match the new checkpoint's history")
    val stored = spark.read.parquet(rollupDir)
    Tables.replaceAtomic(spark, rollupDir,
      Incremental.mergeRollups(stored, rollup(batch), keys),
      marker = Some(MarkerFile -> batchId.toString))
  }

  /** Start maintaining the rollup at `rollupDir` (which must already
    * exist with the rollup's schema — seed it with an empty or initial
    * `rollup(batch)` write). `rollup` must partially aggregate a batch
    * into (keys ++ mergeable sums); `keys` are the grouping columns. */
  def start(stream: DataFrame, rollupDir: String, keys: Seq[String],
      rollup: DataFrame => DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, rollupDir, keys, rollup)
      }
      .start()
}
