package graft.operators

import graft.operators.Caches.EagerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph traversal: breadth-first hop counts by frontier
  * expansion — the reachability/radius probe of the graph-analytics
  * tier ([[PageRank]] is its spectral sibling on the same edge lists).
  *
  * Scale shape: state is two distributed fixed-width frames — `visited`
  * (node, hop) and the current `frontier` (node) — never collected.
  * Each hop is one equi-join of the frontier onto the edge list (keyed
  * by src), one distinct, and one anti-join against `visited`: the
  * standard Pregel-without-Pregel BFS, `maxHops` narrow shuffles total.
  * Frontier frames are localCheckpoint'ed each hop so lineage stays
  * O(1) per iteration instead of nesting `maxHops` deep, and the edge
  * list is materialized once for all hops. Integer hop counts — no
  * floating-point determinism questions. */
object Graph {

  /** Minimum hop count from `source` to every node reachable within
    * `maxHops` over the DIRECTED edge list: (node, hop), hop 0 = the
    * source itself. Unreachable nodes are absent. */
  def bfsHops(edges0: DataFrame, srcCol: String, dstCol: String,
      source: Long, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops ($maxHops) must be >= 1")
    val spark = edges0.sparkSession
    import spark.implicits._
    val edges = edges0
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    Caches.scoped(edges) {
      var visited = Seq((source, 0)).toDF("node", "hop").eagerCheckpoint()
      var frontier = visited.select("node")
      // frontier/visited are checkpoint-backed (unknown-size sentinel to
      // the optimizer), so without the count-gated hints every hop
      // re-shuffles the FULL edge list to meet a frontier-sized table.
      // The counts replace the isEmpty probe (same one job per hop) and
      // bound both build sides; the edge count (one job over the
      // persisted set) gates worth-it — on a graph whose frontier or
      // visited set approaches the edge count, the fixed broadcast cost
      // loses to the narrow shuffle and the hint correctly stays off.
      val eCnt = edges.count()
      var frontierCount = 1L
      var visitedCount = 1L
      var hop = 0
      while (hop < maxHops && frontierCount > 0) {
        hop += 1
        frontier = edges
          .join(Caches.broadcastIfWorthIt(
            frontier.withColumnRenamed("node", "src"), frontierCount, eCnt),
            "src")
          .select(col("dst").as("node")).distinct()
          .join(Caches.broadcastIfWorthIt(visited, visitedCount, eCnt),
            Seq("node"), "left_anti")
          .eagerCheckpoint()
        frontierCount = frontier.count()
        visitedCount += frontierCount
        // visited is a LAZY union over the (already checkpointed)
        // frontiers — depth is bounded by maxHops, so there is no
        // lineage blow-up to truncate, and each hop saves one
        // materialization job
        visited = visited
          .unionByName(frontier.withColumn("hop", lit(hop)))
      }
      visited
    }
  }

  /** DuckDB twin over an edge CTE named `e` (src, dst, distinct): a
    * recursive walk whose UNION-distinct keeps each (node, hop) pair
    * once, min-reduced to the BFS hop count. */
  def bfsHopsOracleSql(edgeCte: String, source: Long, maxHops: Int): String =
    s"""WITH RECURSIVE $edgeCte,
       |walk(node, hop) AS (
       |  SELECT CAST($source AS BIGINT) AS node, 0 AS hop
       |  UNION
       |  SELECT e.dst AS node, w.hop + 1 AS hop
       |  FROM walk w JOIN e ON e.src = w.node
       |  WHERE w.hop < $maxHops)
       |SELECT node, CAST(MIN(hop) AS INT) AS hop
       |FROM walk GROUP BY node ORDER BY node""".stripMargin
}
