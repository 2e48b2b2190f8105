package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the MERGE-shaped half of a
  * warehouse ETL surface, as a pure batch transformation (no storage
  * engine required: read dim + updates, write the next dim version).
  *
  * SCD type 2: every change to a tracked attribute closes the current
  * version row (`valid_to` = as-of) and opens a new one; history is the
  * set of closed rows. Scale shape: ONE key-partitioned full-outer join
  * between the open slice and the updates (closed history passes through
  * untouched — at 100 TB that's the bulk of the table, and it never
  * shuffles), then three narrow projections unioned. Attribute
  * comparison is null-safe (`<=>`), so NULL→value and value→NULL both
  * count as changes.
  */
object Scd {

  /** Apply `updates` (one row per key, effective `asOf`) to `current`
    * (an SCD2 dim with `valid_from`/`valid_to`, open rows having NULL
    * `valid_to`). Returns the full next dim state.
    *
    * `updates` must carry the dim's full attribute set (every column
    * except `valid_from`/`valid_to`); `trackedCols` is the subset whose
    * changes open a new version — untracked attributes ride along and
    * take the update's value when a new version opens (type-1
    * overwrite-on-version semantics for the rest). */
  def scd2Merge(current: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], asOf: Column): DataFrame = {
    val attrs = current.columns.toSeq
      .filterNot(c => c == "valid_from" || c == "valid_to")
    val missing = attrs.filterNot(updates.columns.contains)
    require(missing.isEmpty,
      s"updates must carry every dim attribute; missing: ${missing.mkString(", ")}")
    require(trackedCols.nonEmpty,
      "scd2Merge needs at least one tracked column — with none, no " +
        "update could ever open a new version")
    require(trackedCols.forall(attrs.contains),
      "trackedCols must be attribute columns of the dimension")
    val closedHistory = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val u = updates.select(attrs.map(col): _*).withColumn("__upd", lit(1))
    val j = open.withColumn("__cur", lit(1)).as("cur")
      .join(u.as("upd"), col(s"cur.$keyCol") === col(s"upd.$keyCol"), "full_outer")
    val changed = trackedCols
      .map(c => !(col(s"cur.$c") <=> col(s"upd.$c"))).reduce(_ || _)
    val isNew = col("cur.__cur").isNull
    val hasUpd = col("upd.__upd").isNotNull
    def fromSide(side: String, validTo: Column, validFrom: Column) =
      attrs.map(c => col(s"$side.$c").as(c)) :+
        validFrom.as("valid_from") :+ validTo.as("valid_to")
    val nullTo = lit(null).cast(open.schema("valid_to").dataType)
    // open rows that survive as-is: no update arrived, or it changed nothing
    val kept = j.filter(col("cur.__cur").isNotNull && (!hasUpd || !changed))
      .select(fromSide("cur", col("cur.valid_to"), col("cur.valid_from")): _*)
    // open rows whose tracked attributes changed: close them at asOf
    val nowClosed = j.filter(col("cur.__cur").isNotNull && hasUpd && changed)
      .select(fromSide("cur", asOf, col("cur.valid_from")): _*)
    // new versions: changed keys and brand-new keys open at asOf
    val opened = j.filter(hasUpd && (isNew || changed))
      .select(fromSide("upd", nullTo, asOf): _*)
    closedHistory
      .unionByName(kept).unionByName(nowClosed).unionByName(opened)
  }

  /** Point-in-time read over an SCD2 history: the dimension exactly as
    * it stood at `asOf` — rows whose validity interval contains the
    * instant, `[valid_from, valid_to)` half-open with NULL `valid_to`
    * meaning still open. A pure partition-prunable filter: no join, no
    * window, and at most one version per key by the SCD2 invariant
    * (non-overlapping intervals per key — [[ScdSpec]] asserts it). */
  def asOfSnapshot(dim: DataFrame, asOf: Column): DataFrame =
    dim.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
}
