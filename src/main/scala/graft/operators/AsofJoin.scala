package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with the same
  * key and `rightTime <= leftTime` — the point-in-time lookup behind
  * feature stores, slowly-changing enrichment, and market-data joins.
  *
  * Algorithm: tag both sides, UNION, and take a running
  * `last(right_id, ignoreNulls)` over (key, time) order within each key
  * partition. One shuffle on the key, one sort, O(L+R) work — crucially
  * NO per-key fan-out: the naive `join(key && rt <= lt)` + rank
  * materializes |matching rights| rows per left row before pruning,
  * which detonates on keys with long histories at 100 TB. Ties: a right
  * row at exactly the left row's time DOES match (right sorts before
  * left at equal time), and among right rows with equal time the
  * largest `rightId` wins — both choices are deterministic and replayed
  * by the oracle.
  *
  * Skew: one window partition per key. A pathologically hot key (one
  * entity holding a large fraction of all rows) would serialize on one
  * task; the standard mitigation is time-range sub-partitioning with a
  * per-range boundary fix-up pass (carry each range's last right row
  * into the next range) — same algebra, two stages. */
object AsofJoin {

  def joinAsOf(left: DataFrame, leftKey: String, leftTime: String, leftId: String,
      right: DataFrame, rightKey: String, rightTime: String, rightId: String): DataFrame = {
    val ridType = right.schema(rightId).dataType
    val rtType = right.schema(rightTime).dataType
    val lidType = left.schema(leftId).dataType
    val l = left.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__is_l"), col(leftId).as("__lid"),
      lit(null).cast(ridType).as("__rid"), lit(null).cast(rtType).as("__rt"))
    // a NULL right time would sort FIRST (nulls-first ascending) and be
    // picked as "latest right row" for every left row — it can never
    // satisfy rightTime <= leftTime, so it must not enter the union.
    // A NULL right KEY must not either: Window.partitionBy groups all
    // null keys into ONE partition (unlike equi-join semantics, where
    // NULL matches nothing), so null-key left rows would be silently
    // enriched from unrelated null-key history.
    val r = right.filter(col(rightTime).isNotNull && col(rightKey).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__is_l"), lit(null).cast(lidType).as("__lid"),
        col(rightId).as("__rid"), col(rightTime).as("__rt"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__is_l"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m_rid", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__m_rt", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1 && col("__m_rid").isNotNull)
      .select(col("__lid").as(leftId), col("__m_rid").as(rightId),
        col("__m_rt").as(rightTime))
  }
}
