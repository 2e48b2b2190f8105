package graft.streaming

import org.apache.spark.sql.DataFrame
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
  * re-read. Exactly-once comes from the checkpoint: a batch is merged
  * once, and after a crash the un-checkpointed batch replays against
  * the PRE-swap snapshot (the swap and the checkpoint commit together
  * per micro-batch epoch).
  *
  * Scale posture: the merge is one key-partitioned shuffle of
  * rollup-sized (not fact-sized) frames; the rewrite cost is bounded by
  * the rollup's own cardinality — the entire point of keeping a rollup
  * instead of the facts.
  */
object StreamRollup {

  /** Start maintaining the rollup at `rollupDir` (which must already
    * exist with the rollup's schema — seed it with an empty or initial
    * `rollup(batch)` write). `rollup` must partially aggregate a batch
    * into (keys ++ mergeable sums); `keys` are the grouping columns. */
  def start(stream: DataFrame, rollupDir: String, keys: Seq[String],
      rollup: DataFrame => DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val stored = spark.read.parquet(rollupDir)
          Tables.replaceAtomic(spark, rollupDir,
            Incremental.mergeRollups(stored, rollup(batch), keys))
        }
      }
      .start()
}
