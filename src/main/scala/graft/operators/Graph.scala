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
      // one job over the persisted set: gates BOTH the local finish and
      // the per-hop broadcast hints below
      val eCnt = edges.count()
      localBfs(edges, eCnt, source, maxHops).getOrElse {
        // sub-broadcast-cap graphs above the local-finish gate (or with
        // the gate conf'd off) still run the frontier loop without
        // per-hop AQE stage-jobs + driver re-plans — the same lever
        // that took the CC/PageRank loops 2-4x down at bench scale; a
        // no-op above the cap, where AQE earns its overhead
        Caches.withIterationConf(spark, eCnt, bytesPerRow = 16L) {
          var visited = Seq((source, 0)).toDF("node", "hop").eagerCheckpoint()
          var frontier = visited.select("node")
          // frontier/visited are checkpoint-backed (unknown-size sentinel to
          // the optimizer), so without the count-gated hints every hop
          // re-shuffles the FULL edge list to meet a frontier-sized table.
          // The counts replace the isEmpty probe (same one job per hop) and
          // bound both build sides; the edge count gates worth-it — on a
          // graph whose frontier or visited set approaches the edge count,
          // the fixed broadcast cost loses to the narrow shuffle and the
          // hint correctly stays off.
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
    }
  }

  /** Driver-side BFS finish for edge sets that PROVABLY fit on the
    * driver — gate + typed collect via the shared
    * [[Caches.boundedEdgeCollect]] funnel (cap conf
    * `spark.graft.bfs.localFinishEdges`, honest memory math documented
    * there); the walk itself runs on a primitive CSR (one long[] of
    * node ids, int[] offsets/targets, ~40 MB steady at the cap) with
    * the only boxed structure the node→index map, bounded by #nodes,
    * not #edges. Above the cap (or with the conf at 0) the frontier
    * loop runs unchanged — GraphSpec pins local ≡ distributed.
    *
    * Hop counts are EXACTLY the distributed loop's: both assign each
    * node the round of its FIRST visit, and round order is identical
    * (level-synchronous BFS is deterministic). Returns None when the
    * gate says distributed; Some((node, hop) as a LocalRelation)
    * otherwise. */
  private def localBfs(edges: DataFrame, nEdges: Long, source: Long,
      maxHops: Int): Option[DataFrame] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val rows = Caches.boundedEdgeCollect(edges, nEdges,
      "spark.graft.bfs.localFinishEdges") match {
      case Some(r) => r
      case None => return None
    }
    // node -> dense index (the one boxed structure, bounded by #nodes)
    val nodeIdx = new java.util.HashMap[java.lang.Long, Integer](
      2 * rows.length)
    def idx(id: Long): Int = {
      val i = nodeIdx.get(id)
      if (i != null) i.intValue
      else { val j = nodeIdx.size(); nodeIdx.put(id, j); j }
    }
    val m = rows.length
    val es = new Array[Int](m)
    val ed = new Array[Int](m)
    var i = 0
    while (i < m) { es(i) = idx(rows(i)._1); ed(i) = idx(rows(i)._2); i += 1 }
    val n = nodeIdx.size()
    val ids = new Array[Long](n)
    nodeIdx.forEach((k, v) => ids(v.intValue) = k.longValue)
    // CSR: counting sort of targets by source
    val off = new Array[Int](n + 1)
    i = 0; while (i < m) { off(es(i) + 1) += 1; i += 1 }
    i = 0; while (i < n) { off(i + 1) += off(i); i += 1 }
    val pos = java.util.Arrays.copyOf(off, n)
    val adj = new Array[Int](m)
    i = 0; while (i < m) { adj(pos(es(i))) = ed(i); pos(es(i)) += 1; i += 1 }
    // level-synchronous walk on int frontiers
    val dist = new Array[Int](n)
    java.util.Arrays.fill(dist, -1)
    val srcIdx = nodeIdx.get(source)
    var frontier = new Array[Int](0)
    if (srcIdx != null) { dist(srcIdx.intValue) = 0; frontier = Array(srcIdx.intValue) }
    var hop = 0
    val next = new scala.collection.mutable.ArrayBuilder.ofInt
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      next.clear()
      frontier.foreach { u =>
        var j = off(u)
        while (j < off(u + 1)) {
          val v = adj(j)
          if (dist(v) < 0) { dist(v) = hop; next += v }
          j += 1
        }
      }
      frontier = next.result()
    }
    val outRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    i = 0
    while (i < n) { if (dist(i) >= 0) outRows += ((ids(i), dist(i))); i += 1 }
    // a source with no edge rows still reports itself at hop 0 — the
    // distributed loop's seed-frontier behavior
    if (srcIdx == null) outRows += ((source, 0))
    Some(outRows.toSeq.toDF("node", "hop"))
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
