package graft

import org.apache.spark.sql.functions._

import graft.operators.Tfidf

class TfidfSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d"), // grams: "a b c", "b c d"
    (2L, "a b c e"), // grams: "a b c", "b c e"
    (3L, "x y z w") // grams: "x y z", "y z w"
  ).toDF("doc_id", "text")

  test("cosinePairs finds the shared-gram pair with the exact weight") {
    val out = Tfidf.cosinePairs(corpus, "doc_id", "text",
        nGram = 3, dfCap = 64, threshold = 0.1)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    // w_shared = round(1 * ln(3/2), 6) = 0.405465; w_single = round(ln 3, 6)
    val wS = BigDecimal(math.log(3.0 / 2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w1 = BigDecimal(math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nrm = math.sqrt(r6(wS * wS) + r6(w1 * w1))
    val exp = BigDecimal(r6(wS * wS) / (nrm * nrm))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) === exp)
  }

  test("dfCap drops hot grams from both norms and pairs") {
    // every doc shares "a b c" (df = 3 > cap 2) -> no surviving postings
    val hot = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    assert(Tfidf.cosinePairs(hot, "doc_id", "text",
      nGram = 3, dfCap = 2, threshold = 0.0).count() === 0)
  }

  test("identical documents reach cosine 1.0 and ordering is id_a < id_b") {
    val dup = Seq((7L, "p q r s t"), (2L, "p q r s t"), (9L, "zz yy xx ww"))
      .toDF("doc_id", "text")
    val out = Tfidf.cosinePairs(dup, "doc_id", "text",
        nGram = 3, dfCap = 64, threshold = 0.5)
      .collect()
    assert(out.length === 1)
    assert((out.head.getLong(0), out.head.getLong(1)) === ((2L, 7L)))
    assert(out.head.getDouble(2) === 1.0)
  }

  test("incremental ≡ full recompute filtered to new endpoints") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val pred = col("doc_id") % 10 === 3
    val inc = graft.operators.Tfidf.incrementalCosinePairs(
        d, "doc_id", "text", pred)
      .orderBy("id_a", "id_b").collect().toSeq
    val full = graft.operators.Tfidf.cosinePairs(d, "doc_id", "text")
      .filter(col("id_a") % 10 === 3 || col("id_b") % 10 === 3)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(inc === full)
    assert(inc.nonEmpty, "vacuous increment — pick a different predicate")
  }

  test("both-new pairs are not double-counted by the increment probe") {
    // identical docs 2 and 7 BOTH new: the pair arrives from both probe
    // orientations; a double-counted dot would give cos 2.0, not 1.0
    val dup = Seq((7L, "p q r s t"), (2L, "p q r s t"), (9L, "zz yy xx ww"))
      .toDF("doc_id", "text")
    val out = graft.operators.Tfidf.incrementalCosinePairs(
        dup, "doc_id", "text", newPred = lit(true),
        nGram = 3, dfCap = 64, threshold = 0.5)
      .collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 1.0)
  }

  test("corpus near-dups surface at sf0.001 with bounded pair count") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = Tfidf.cosinePairs(d, "doc_id", "text").count()
    assert(n >= 1 && n <= d.count())
  }
}
