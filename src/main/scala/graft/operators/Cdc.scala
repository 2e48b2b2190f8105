package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC application — materialize a change feed onto a snapshot table
  * (the APPLY-CHANGES-INTO half of a CDC pipeline; the feed itself
  * comes from [[graft.streaming.PipeStream]]-style ingestion, whose
  * `_action` column this consumes).
  *
  * Semantics: per key, only the LATEST change (by a caller-supplied
  * monotonic sequence — CDC position, commit LSN, event time) applies;
  * earlier changes in the same batch are superseded. `I`/`U` upsert the
  * row, `D` deletes it, keys without changes pass through.
  *
  * Scale shape: one window over the (small, recent) change batch to
  * pick latest-per-key, then ONE key-partitioned full-outer join
  * against the snapshot — the snapshot never shuffles twice and is
  * never collected. Deletes are physical here (batch materialization);
  * retention-grade deletes with an audit trail live in
  * [[graft.pii.Masking]].
  */
object Cdc {

  /** Apply `changes` (key, seqCol ordering, actionCol in {I,U,D}, plus
    * the target's attribute columns) to `target`. Returns the next
    * snapshot with the target's schema. */
  def applyChanges(target: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, actionCol: String): DataFrame = {
    val attrs = target.columns.toSeq
    require(attrs.contains(keyCol), s"target must carry key column $keyCol")
    val missing = attrs.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes must carry every target column; missing: ${missing.mkString(", ")}")
    // latest change per key; ties on (seq, action) — a malformed feed —
    // break on a content hash so the pick is still stable across runs
    // and partitionings, never row_number's arbitrary arrival order
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, col(actionCol).desc,
        xxhash64(attrs.map(col): _*))
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((keyCol +: attrs.filterNot(_ == keyCol)).map(col) :+
        col(actionCol).as("__action"): _*)
      .withColumn("__chg", lit(1))
    val j = target.as("t")
      .join(latest.as("c"), col(s"t.$keyCol") === col(s"c.$keyCol"), "full_outer")
    val hasChange = col("c.__chg").isNotNull
    // coalesce: a NULL action (malformed feed) must behave like any
    // other unknown action — an upsert — not silently DELETE the row
    // (`action === "D"` is NULL for it, and filter(!NULL) drops the row)
    val deleted = hasChange && coalesce(col("c.__action") === "D", lit(false))
    // dropping `deleted` rows covers both real deletes and D on an
    // unknown key (its full-outer row has no target side to keep);
    // everything else is an upsert (change side) or a pass-through
    j.filter(!deleted)
      .select(attrs.map(c =>
        when(hasChange, col(s"c.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
