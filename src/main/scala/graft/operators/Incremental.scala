package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: the merge step of a
  * rollup kept up to date batch-by-batch instead of recomputed from
  * scratch (the Snowflake dynamic-table / Spark-native matview shape;
  * reference cadence: the scheduled full-refresh tasks in A4).
  *
  * Works for MERGEABLE aggregates — those whose partial states combine
  * by summation (count, sum; avg as sum+count, variance as co-moment
  * triples). At 100 TB this is the difference between touching one
  * day's delta and re-shuffling the whole history: the stored rollup is
  * keys × fixed-width state, the merge is a key-partitioned shuffle of
  * |old rollup| + |delta rollup| rows, and the full fact table is never
  * re-read.
  */
object Incremental {

  /** Merge partial rollups sharing the `keys` grouping: every non-key
    * column is summed. `rollup(a) ⊎ rollup(b) == rollup(a ∪ b)` for
    * count/sum states (IncrementalSpec asserts the property on random
    * splits). Both inputs must carry identical schemas. */
  def mergeRollups(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"rollup schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val valueCols = a.columns.filterNot(keys.contains)
    require(valueCols.nonEmpty, "nothing to merge: every column is a key")
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => sum(c).as(c)).toSeq: _*)
  }
}
