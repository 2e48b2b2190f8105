package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the manual fallback for distributions
  * AQE's skew-join split can't fix (e.g. one key holding 30% of a
  * 100 TB fact table, or a skewed aggregation key).
  *
  * Exactness: both helpers are algebraic two-phase rewrites — the salted
  * result equals the unsalted result row-for-row; only the shuffle
  * layout changes (hot keys spread over `salts` reducers).
  */
object Skew {

  /** Two-stage salted aggregation: phase 1 aggregates (key, salt) partial
    * groups — the hot key's rows land on `salts` different reducers —
    * phase 2 combines partials per key. Exact for sum/count (and any
    * algebraic aggregate expressed as sum-of-partials). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n"))
  }

  /** Salted join for a skewed large side against a small (but not
    * broadcast-able-by-stats) side: the large side gets a per-row salt,
    * the small side is replicated once per salt value, and the join runs
    * on (key, salt) — hot keys spread over `salts` reducers. Semantics
    * identical to `large.join(small, keys)` (inner). */
  def saltedJoin(large: DataFrame, small: DataFrame, keyCols: Seq[String],
      salts: Int = 16): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(s, keyCols :+ "__salt").drop("__salt")
  }
}
