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
    * `valid_to`). Returns the full next dim state. */
  def scd2Merge(current: DataFrame, updates: DataFrame, keyCol: String,
      trackedCols: Seq[String], asOf: Column): DataFrame = {
    val attrs = keyCol +: trackedCols
    val closedHistory = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val u = updates.select(attrs.map(col): _*).withColumn("__upd", lit(1))
    val j = open.withColumn("__cur", lit(1)).as("cur")
      .join(u.as("upd"), col(s"cur.$keyCol") === col(s"upd.$keyCol"), "full_outer")
    val changed = trackedCols
      .map(c => !(col(s"cur.$c") <=> col(s"upd.$c"))).reduce(_ || _)
    val isNew = col("cur.__cur").isNull
    val hasUpd = col("upd.__upd").isNotNull
    // open rows that survive as-is: no update arrived, or it changed nothing
    val kept = j.filter(col("cur.__cur").isNotNull && (!hasUpd || !changed))
      .select(col(s"cur.$keyCol").as(keyCol) +:
        trackedCols.map(c => col(s"cur.$c").as(c)) :+
        col("cur.valid_from").as("valid_from") :+
        col("cur.valid_to").as("valid_to"): _*)
    // open rows whose attributes changed: close them at asOf
    val nowClosed = j.filter(col("cur.__cur").isNotNull && hasUpd && changed)
      .select(col(s"cur.$keyCol").as(keyCol) +:
        trackedCols.map(c => col(s"cur.$c").as(c)) :+
        col("cur.valid_from").as("valid_from") :+
        asOf.as("valid_to"): _*)
    // new versions: changed keys and brand-new keys open at asOf
    val opened = j.filter(hasUpd && (isNew || changed))
      .select(col(s"upd.$keyCol").as(keyCol) +:
        trackedCols.map(c => col(s"upd.$c").as(c)) :+
        asOf.as("valid_from") :+
        lit(null).cast(open.schema("valid_to").dataType).as("valid_to"): _*)
    closedHistory
      .unionByName(kept).unionByName(nowClosed).unionByName(opened)
  }
}
