package graft

import graft.operators.Overlap

/** Source-overlap matrix invariants: duplicated groups hit jaccard 1,
  * disjoint groups are absent, and the matrix is the ordered upper
  * triangle. */
class OverlapSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    Overlap.sourceOverlap(rows.toDF("doc_id", "source", "text"),
        "doc_id", "source", "text", k = 2)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap

  test("identical groups score 1, disjoint pairs are absent, triangle is ordered") {
    val rows = Seq(
      (1L, "a", "x y z w"), (2L, "a", "p q r"),
      (3L, "b", "x y z w"), (4L, "b", "p q r"), // b duplicates a
      (5L, "c", "completely different words here"),
      (6L, "d", "x y z w only"))                // partial overlap with a/b
    val m = run(rows)
    assert(m(("a", "b"))._4 === 1.0)
    assert(!m.contains(("b", "a")), "lower triangle must not appear")
    assert(!m.keySet.exists { case (x, y) => x == "c" || y == "c" },
      "disjoint group must not pair")
    val (na, nb, shared, j) = m(("a", "d"))
    assert(shared > 0 && shared < math.min(na, nb).toInt + 1)
    assert(j > 0.0 && j < 1.0)
    // counts reconcile with the jaccard
    assert(j === BigDecimal(shared.toDouble / (na + nb - shared))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("randomized: jaccard bounds and count consistency") {
    val rng = new scala.util.Random(5)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rows = (0 until 120).map { i =>
      val t = (0 until 3 + rng.nextInt(8))
        .map(_ => words(rng.nextInt(words.size))).mkString(" ")
      (i.toLong, s"src${rng.nextInt(5)}", t)
    }
    run(rows).foreach { case ((sa, sb), (na, nb, shared, j)) =>
      assert(sa < sb)
      assert(shared >= 1 && shared <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
