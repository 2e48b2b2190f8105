package graft

import org.apache.spark.sql.functions._

import graft.operators.EditDistance

/** PassJoin edit-distance pairs: the blocked join must EQUAL the
  * all-pairs truth — candidate-generation recall holes are the bug class
  * this family cannot tolerate, so equality is asserted on randomized
  * corpora built to stress every path (collapsed duplicates, short
  * strings, empty strings, hot segment keys). */
class EditDistanceSpec extends SparkSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** All-pairs truth over the collapsed normalized prefixes. */
  private def brute(corpus: Seq[(Long, String)], prefixLen: Int,
      maxDist: Int): Set[(Long, Long, Long)] = {
    val reps = corpus
      .map { case (id, t) => (id, t.trim.toLowerCase.take(prefixLen)) }
      .groupBy(_._2).map { case (pre, rows) => (rows.map(_._1).min, pre) }
      .toSeq
    (for {
      (ia, pa) <- reps; (ib, pb) <- reps
      if ia < ib && math.abs(pa.length - pb.length) <= maxDist
      d = lev(pa, pb) if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet
  }

  private def run(corpus: Seq[(Long, String)], prefixLen: Int, maxDist: Int,
      hotDf: Int = 4096): Set[(Long, Long, Long)] =
    EditDistance.editPairs(corpus.toDF("doc_id", "text"), "doc_id", "text",
        prefixLen, maxDist, hotDf = hotDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("randomized: blocked join equals all-pairs truth") {
    val rng = new scala.util.Random(7)
    val alphabet = "abcd ".toCharArray
    (1 to 4).foreach { trial =>
      // base strings plus k-edit mutants so true pairs are dense
      val base = (0 until 25).map(_ =>
        (0 until 8 + rng.nextInt(12)).map(_ =>
          alphabet(rng.nextInt(alphabet.length))).mkString)
      val mutants = base.flatMap { s =>
        (0 until rng.nextInt(3)).map { _ =>
          val edits = 1 + rng.nextInt(4)
          (1 to edits).foldLeft(s) { (cur, _) =>
            if (cur.isEmpty) "a"
            else rng.nextInt(3) match {
              case 0 => cur.updated(rng.nextInt(cur.length),
                alphabet(rng.nextInt(alphabet.length))) // substitute
              case 1 => cur.patch(rng.nextInt(cur.length), Nil, 1) // delete
              case _ => cur.patch(rng.nextInt(cur.length + 1),
                Seq(alphabet(rng.nextInt(alphabet.length))), 0) // insert
            }
          }
        }
      }
      val corpus = (base ++ mutants).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val k = 1 + trial % 3
      assert(run(corpus, prefixLen = 12, maxDist = k) ===
        brute(corpus, 12, k), s"trial $trial (k=$k) diverged")
    }
  }

  test("shorts, empties, and cross length-class pairs") {
    val corpus: Seq[(Long, String)] = Seq(
      1L -> "", 2L -> "a", 3L -> "ab", 4L -> "abc", 5L -> "abcd",
      6L -> "abcde", 7L -> "abcdefgh", 8L -> "abcdefghx",
      9L -> "  abc  ", // trims to "abc" — collapses with id 4
      10L -> "zzzzzzzzzzzz")
    val k = 2
    assert(run(corpus, prefixLen = 8, maxDist = k) === brute(corpus, 8, k))
  }

  test("identical prefixes collapse to one representative (dist 0 never emitted)") {
    val corpus = (0L until 40L).map(i => (i, "same prefix here")) :+
      (99L, "same prefix herX")
    val out = run(corpus, prefixLen = 16, maxDist = 2)
    assert(out === Set((0L, 99L, 1L)))
  }

  test("hot segment keys: salted path equals unsalted") {
    // 60 strings sharing segment-heavy structure → segment df > 2
    val rng = new scala.util.Random(11)
    val corpus = (0 until 60).map { i =>
      val tail = (0 until 4).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      (i.toLong, "common head " + tail)
    }
    val hot = run(corpus, prefixLen = 16, maxDist = 3, hotDf = 2)
    val cold = run(corpus, prefixLen = 16, maxDist = 3, hotDf = 1 << 20)
    assert(hot === cold)
    assert(hot === brute(corpus, 16, 3))
  }

  test("null and whitespace-only texts never pair, never throw") {
    val corpus = Seq((1L, "abcdef"), (2L, null.asInstanceOf[String]),
      (3L, "   "), (4L, "abcdxf"))
    // null drops (null prefix); "   " trims to "" (lp 0) and pairs with
    // nothing within k=2 of length 6 strings
    assert(run(corpus, prefixLen = 8, maxDist = 2) === Set((1L, 4L, 1L)))
  }
}
