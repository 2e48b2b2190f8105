package graft

import graft.operators.Dedup

/** Containment pairs: the count-based inverted index must equal the
  * per-pair set definition, the embedded-quote case must score 1.0
  * where jaccard collapses, and the salted hot path must stay exact. */
class ContainmentSpec extends SparkSuite {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int,
      t: Double): Set[(Long, Long, Double)] = {
    def sh(s: String): Set[String] = {
      val toks = s.trim.toLowerCase.split("\\s+").toSeq
      if (toks.size < k) Set(toks.mkString(" "))
      else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    val sets = rows.map { case (id, s0) => id -> sh(s0) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size) if c >= t
    } yield (ia, ib,
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
  }

  private def run(rows: Seq[(Long, String)], t: Double,
      hotDf: Int = 4096): Set[(Long, Long, Double)] =
    Dedup.containmentPairs(rows.toDF("doc_id", "text"), "doc_id", "text",
        threshold = t, hotDf = hotDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("embedded quote scores 1.0 while jaccard misses it") {
    val page = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (20 to 26).map(i => s"w$i").mkString(" ")
    val rows = Seq(1L -> page, 2L -> quote)
    val got = run(rows, t = 0.9)
    assert(got === Set((1L, 2L, 1.0)))
    assert(Dedup.ngramJaccardPairs(rows.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5).count() === 0L)
  }

  test("randomized: inverted index equals brute force, salted path exact") {
    val rng = new scala.util.Random(23)
    val words = Vector("a", "b", "c", "d", "e", "f")
    (1 to 3).foreach { trial =>
      val rows = (0 until 50).map { i =>
        (i.toLong, (0 until 4 + rng.nextInt(10))
          .map(_ => words(rng.nextInt(words.size))).mkString(" "))
      }
      val want = brute(rows, k = 3, t = 0.5)
      assert(run(rows, t = 0.5) === want, s"trial $trial diverged")
      assert(run(rows, t = 0.5, hotDf = 2) === want,
        s"trial $trial salted path diverged")
    }
  }
}
