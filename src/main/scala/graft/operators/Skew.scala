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
    // pmod(x, 0) is null (non-ANSI), which would silently empty the
    // aggregation instead of erroring
    require(salts >= 1, s"salts ($salts) must be >= 1")
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
    // salts=0 would null every large-side salt (pmod by zero) and the
    // "semantics identical to large.join(small, keys)" contract would
    // silently become an empty result
    require(salts >= 1, s"salts ($salts) must be >= 1")
    val l = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(s, keyCols :+ "__salt").drop("__salt")
  }

  /** The attach-join discipline for a fact-side frame against a
    * lookup-side frame whose size depends on corpus scale (a vocabulary,
    * a df table): broadcast it while the optimizer's size estimate says
    * it fits the broadcast threshold, otherwise fall through to
    * [[saltedJoin]] — NEVER a plain shuffled join on the raw key, whose
    * hot entries ("the", a template shingle) would funnel into one
    * reducer at 100 TB. Same stats-guard pattern as
    * [[Caches.spreadByKey]]: the sentinel estimate of stats-less
    * sources reads as unknown and takes the salted (safe) branch, and
    * aggregate estimates without CBO overestimate, which also errs
    * toward salting. Inner-join semantics, exact either way. */
  def broadcastOrSalted(large: DataFrame, small: DataFrame,
      keyCols: Seq[String], salts: Int = 16): DataFrame = {
    val conf = small.sparkSession.sessionState.conf
    val threshold = scala.util.Try(conf.autoBroadcastJoinThreshold)
      .getOrElse(10L * 1024 * 1024)
    val sentinel = scala.util.Try(conf.defaultSizeInBytes)
      .getOrElse(Long.MaxValue)
    val est = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && est < BigInt(sentinel) && est <= BigInt(threshold))
      large.join(broadcast(small), keyCols)
    else saltedJoin(large, small, keyCols, salts)
  }
}
