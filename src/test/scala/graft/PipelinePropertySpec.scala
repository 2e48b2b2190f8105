package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Quantiles, Tfidf}

/** Seeded randomized invariants for the round-6 operators — the
  * property net UNDER the oracle gate: these hold for ANY corpus, not
  * just the driver testdata, so a semantics regression that happens to
  * keep the oracle green on the fixed corpus still trips here. */
class PipelinePropertySpec extends SparkSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val alphabet = "abcdefg".toCharArray

  private def randomCorpus(nDocs: Int, maxLen: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val words = (0 to rng.nextInt(maxLen)).map(_ =>
        (0 to rng.nextInt(4)).map(_ => alphabet(rng.nextInt(alphabet.length)))
          .mkString)
      (i.toLong, words.mkString(" "))
    }

  test("tfidf: cosine bounds, ordering, and incremental ≡ filtered-full on random corpora") {
    (1 to 3).foreach { trial =>
      val corpus = randomCorpus(30 + trial * 10, 12).toDF("doc_id", "text")
      val full = Tfidf.cosinePairs(corpus, "doc_id", "text",
        nGram = 2, dfCap = 16, threshold = 0.0).collect()
      full.foreach { r =>
        assert(r.getLong(0) < r.getLong(1), "pair ordering violated")
        assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0001,
          s"cosine out of range: ${r.getDouble(2)}")
      }
      val inc = Tfidf.incrementalCosinePairs(corpus, "doc_id", "text",
          newPred = col("doc_id") % 3 === 0,
          nGram = 2, dfCap = 16, threshold = 0.0)
        .orderBy("id_a", "id_b").collect().toSeq
      val fullFiltered = Tfidf.cosinePairs(corpus, "doc_id", "text",
          nGram = 2, dfCap = 16, threshold = 0.0)
        .filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(inc === fullFiltered, s"trial $trial: incremental diverged")
    }
  }

  test("bpe: merge counts are non-increasing and merges concatenate") {
    (1 to 3).foreach { trial =>
      val corpus = randomCorpus(40, 8).toDF("doc_id", "text")
      val merges = Bpe.merges(corpus, "text", iters = 6).collect()
      merges.foreach(r =>
        assert(r.getString(1) + r.getString(2) === r.getString(3)))
      val counts = merges.map(_.getLong(4)).toSeq
      assert(counts === counts.sorted.reverse,
        s"trial $trial: merge counts increased: $counts")
    }
  }

  test("quantiles: buckets are monotone in score and ties cohere") {
    (1 to 3).foreach { trial =>
      val scores = (0 until 60).map(i =>
        (i.toLong, (rng.nextInt(12)).toDouble)).toDF("id", "s")
      val out = Quantiles.cumShareBuckets(scores, "s",
          Seq(("head", 1, 3), ("middle", 2, 3)), "tail")
        .select("s", "bucket").collect()
        .map(r => (r.getDouble(0), r.getString(1)))
      val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
      // same score -> same bucket
      out.groupBy(_._1).foreach { case (s, grp) =>
        assert(grp.map(_._2).distinct.length === 1, s"tie split at score $s")
      }
      // bucket rank is monotone in score
      val byScore = out.distinct.sortBy(_._1).map(t => rank(t._2))
      assert(byScore === byScore.sorted, s"trial $trial: non-monotone buckets")
    }
  }
}
