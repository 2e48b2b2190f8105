package graft.plans

import org.apache.spark.sql.DataFrame

/** Physical-plan snapshot helpers: normalize a plan string so that
  * run-to-run noise (expression ids, plan ids, absolute paths, stats)
  * disappears and only STRUCTURE remains — the thing that must not
  * silently regress (a new shuffle, a lost broadcast, a cartesian
  * product slipping in). Used by [[graft.Explain]] to dump versioned
  * snapshots and by PlanRegressionSpec to gate changes.
  *
  * Known benign churn the normalizer can NOT scrub: multi-column
  * count-distinct plans (g11) order their Expand/gid groups by
  * ExpressionSet iteration, which depends on the session-global id
  * counter — so adding queries elsewhere permutes g11's recorded
  * column order run-to-run. The permutation is structure-preserving
  * (same node types, same exchange count), and the REGRESSION GATE
  * only checks CartesianProduct + shuffle counts, which are invariant
  * under it — expect the g11 snapshot text to re-dirty on full
  * `graft.Explain` regenerations and commit it without alarm. */
object PlanSnapshots {

  /** The pre-execution physical plan (for AQE plans this is the initial
    * plan — deterministic for fixed code + data, unlike the adaptively
    * re-optimized final plan). */
  def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  def normalize(plan: String): String = plan
    .replaceAll("#\\d+", "#x")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("file:[^,\\s\\]\\)]*", "<path>")
    .replaceAll("Location [^,\\]]*\\[[^\\]]*\\]", "Location <path>")
    .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
    // JVM lambda identities (class counter + address) change every run
    // and would re-dirty committed snapshots with structure-free diffs
    .replaceAll("\\$Lambda\\$\\d+/0x[0-9a-f]+@[0-9a-f]+", "\\$Lambda\\$x")
    .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+@[0-9a-f]+", "Lambda\\$x")
    // higher-order-function lambda variables and CSE aliases carry
    // session-global counters (lambda x_35, _common_expr_8) whose values
    // depend on how many OTHER queries were planned first — adding a
    // query would re-dirty every snapshot after it in the dump order
    .replaceAll("lambda ([a-zA-Z]+)_\\d+", "lambda $1_n")
    .replaceAll("_common_expr_\\d+", "_common_expr_n")

  /** Shuffle exchanges only — BroadcastExchange is usually the GOOD
    * outcome and is counted separately. */
  def shuffleCount(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange"))

  def broadcastCount(plan: String): Int =
    plan.linesIterator.count(_.contains("BroadcastExchange"))

  def hasCartesian(plan: String): Boolean =
    plan.contains("CartesianProduct")
}
