package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.plans.PlanSnapshots

/** Plan-shape regression gate over EVERY declared query at sf0.001:
  *
  *  - no CartesianProduct may ever appear (scalar-stat cross joins must
  *    compile to BroadcastNestedLoopJoin over a broadcast 1-row side);
  *  - the shuffle-exchange count per query must not EXCEED the
  *    checked-in budget (plans/exchange_budget.tsv, regenerated via
  *    `SPARK_GRAFT_PLAN_DIR=plans runMain graft.Explain`) — a new
  *    shuffle is a deliberate, reviewed change, not a silent one.
  *
  * The eager dedup/similarity operators (Caches.scoped) materialize
  * during construction, so their recorded top-level plan is just the
  * checkpoint scan — for THOSE, the gate additionally captures their
  * interior physical plans via [[graft.operators.Caches.planProbe]] at
  * materialization time and applies the same no-cartesian +
  * shuffle-budget checks to the probed interiors (budget rows keyed
  * `name#interior` in plans/exchange_budget.tsv, snapshot text in
  * plans/name.interior.txt). A regression inside cosinePairs or
  * ivfPqTopK fails here, not just in the bench total.
  */
class PlanRegressionSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val budgets: Map[String, Int] = {
    val p = Paths.get("plans/exchange_budget.tsv")
    assert(Files.exists(p),
      "plans/exchange_budget.tsv missing — regenerate with " +
        "SPARK_GRAFT_PLAN_DIR=plans sbt \"runMain graft.Explain\"")
    Files.readAllLines(p).asScala.filter(_.nonEmpty)
      .map { l => val Array(n, c) = l.split("\t"); n -> c.toInt }.toMap
  }

  test("no declared query plans a CartesianProduct; shuffles within budget; planning stays cheap") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    // analysis+optimization+physical-planning time budget per query: the
    // round-5 PCA regression was an unrolled-expression tree that cost
    // seconds to PLAN before a single row moved, and it poisoned the
    // whole driver bench (JIT compile storm). Catch the next one here.
    // First plan in the JVM pays class-loading warmup, so one query is
    // planned untimed up front; 1.5s is ~15x the typical heavy plan.
    val planBudgetMs = 1500L
    SparkEntry.queries("q01_count_global")(spark, sfDir).queryExecution.executedPlan
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // capture eager operators' interior plans during construction
      // (AQE off so exchanges are plain nodes, matching how the
      // budgets were recorded; restored before the top plan evaluates
      // so declared-plan snapshots/counts are unaffected)
      val probed = scala.collection.mutable.Buffer
        .empty[org.apache.spark.sql.execution.SparkPlan]
      graft.operators.Caches.planProbe.set(probed)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t0 = System.nanoTime()
      val df =
        try fn(spark, sfDir)
        finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          graft.operators.Caches.planProbe.remove()
        }
      val plan = PlanSnapshots.normalize(PlanSnapshots.planString(df))
      val planMs = (System.nanoTime() - t0) / 1000000L
      // eager operators (Caches.scoped) EXECUTE at sf0.001 during
      // construction — their elapsed time is data work, not planning,
      // and their plan is the checkpoint scan; the bench owns their
      // cost. Recognizable by the ExistingRDD scan in the plan.
      val eager = plan.contains("Scan ExistingRDD")
      if (!eager && planMs > planBudgetMs) {
        // re-plan once before flagging: a GC pause or noisy neighbor
        // can breach the budget on a loaded host — only a REPEATABLE
        // breach is a plan-weight regression
        val t1 = System.nanoTime()
        fn(spark, sfDir).queryExecution.executedPlan
        val retryMs = (System.nanoTime() - t1) / 1000000L
        if (retryMs > planBudgetMs)
          offenders += s"$name: planning took ${planMs}ms then ${retryMs}ms" +
            s" > ${planBudgetMs}ms"
      }
      if (PlanSnapshots.hasCartesian(plan))
        offenders += s"$name: CartesianProduct in plan"
      val shuffles = PlanSnapshots.shuffleCount(plan)
      budgets.get(name).foreach { budget =>
        if (shuffles > budget)
          offenders += s"$name: $shuffles shuffle exchanges > budget $budget"
      }
      // interior gate: every probed (eager) query must have a recorded
      // interior budget, no interior cartesian, and interior shuffles
      // within that budget — this is the check the checkpoint scan at
      // the top level would otherwise hide
      if (probed.nonEmpty) {
        if (PlanSnapshots.interiorHasCartesian(probed.toSeq))
          offenders += s"$name: CartesianProduct in interior (probed) plan"
        val interior = PlanSnapshots.interiorShuffleCount(probed.toSeq)
        budgets.get(s"$name#interior") match {
          case Some(budget) =>
            if (interior > budget)
              offenders += s"$name: $interior interior shuffle exchanges" +
                s" > budget $budget"
          case None =>
            offenders += s"$name: eager query with no $name#interior row in" +
              " plans/exchange_budget.tsv — regenerate with" +
              " SPARK_GRAFT_PLAN_DIR=plans sbt \"runMain graft.Explain\""
        }
      }
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("filter queries push their predicates into the parquet scan") {
    // the scans must carry PushedFilters — a filter evaluated only
    // post-scan reads the whole table at 100 TB
    val filterQueries = Seq("q11_filter_compare", "q12_between",
      "q13_in_list", "q16_null_pred")
    filterQueries.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val scanLines = PlanSnapshots.planString(df).linesIterator
        .filter(_.contains("PushedFilters"))
        .toSeq
      assert(scanLines.exists(l => l.contains("PushedFilters: [") &&
          !l.contains("PushedFilters: []")),
        s"$name: no non-empty PushedFilters in scan\n" +
          scanLines.mkString("\n"))
    }
  }

  test("every declared query has a recorded exchange budget") {
    val missing = SparkEntry.queries.keySet -- budgets.keySet
    assert(missing.isEmpty,
      s"queries without a plan snapshot budget: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
