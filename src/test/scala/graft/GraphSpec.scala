package graft

import graft.operators.Graph

/** BFS hop counts: distributed frontier expansion must equal a
  * driver-side reference BFS on randomized graphs, and the hop budget /
  * reachability contracts must hold. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long)], source: Long,
      maxHops: Int): Map[Long, Int] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = Map(source -> 0)
    var frontier = Seq(source)
    (1 to maxHops).foreach { h =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], source: Long,
      maxHops: Int): Map[Long, Int] =
    Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst", source, maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("randomized directed graphs: distributed ≡ reference") {
    val rng = new scala.util.Random(17)
    (1 to 3).foreach { trial =>
      val n = 30 + trial * 10
      val edges = (0 until n * 2).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val maxHops = 2 + trial
      assert(run(edges, 0L, maxHops) === ref(edges, 0L, maxHops),
        s"trial $trial diverged")
    }
  }

  test("hop budget truncates; unreachable nodes are absent; source is hop 0") {
    // chain 0 → 1 → 2 → 3 → 4, island 9 → 10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
    val got = run(edges, 0L, maxHops = 2)
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2))
    val full = run(edges, 0L, maxHops = 10)
    assert(full === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
  }

  test("cycles terminate at first visit") {
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L))
    assert(run(edges, 0L, maxHops = 5) === Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("driver local finish ≡ distributed frontier loop") {
    // the localBfs gate (spark.graft.bfs.localFinishEdges) must be a
    // pure execution-strategy switch: same (node, hop) rows whether the
    // walk runs on the driver (default: these fixtures are under the
    // cap) or through the frontier-expansion joins (gate conf'd off)
    val rng = new scala.util.Random(41)
    val n = 60
    val edges = (0 until n * 3).map(_ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
    val local = run(edges, 0L, maxHops = 4)
    val distributed =
      try {
        spark.conf.set("spark.graft.bfs.localFinishEdges", "0")
        run(edges, 0L, maxHops = 4)
      } finally spark.conf.unset("spark.graft.bfs.localFinishEdges")
    assert(local === distributed)
    assert(local === ref(edges, 0L, maxHops = 4))
  }
}
