package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CorpusDiff, Quantiles, Similarity, Tfidf}

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

  test("corpusDiff: classes partition v1 ∪ v2 and invert under swap") {
    (1 to 3).foreach { trial =>
      val v1 = randomCorpus(40, 6).toDF("doc_id", "text")
      // v2: random subset dropped, random subset revised, some new ids
      val v2 = v1.filter(abs(hash(col("doc_id") + trial)) % 5 =!= 0)
        .withColumn("text", when(abs(hash(col("doc_id") * 7 + trial)) % 4 === 0,
          concat(col("text"), lit(" rev"))).otherwise(col("text")))
        .unionByName(v1.filter(abs(hash(col("doc_id") - trial)) % 6 === 0)
          .withColumn("doc_id", col("doc_id") + 1000L))
      val fwd = CorpusDiff.diff(v1, v2, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // exactly one verdict per id in the union, and counts reconcile
      val ids1 = v1.select("doc_id").collect().map(_.getLong(0)).toSet
      val ids2 = v2.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(fwd.keySet === (ids1 ++ ids2), s"trial $trial: ids not partitioned")
      assert(fwd.count(_._2 == "added") === (ids2 -- ids1).size)
      assert(fwd.count(_._2 == "removed") === (ids1 -- ids2).size)
      // diff is an involution up to added <-> removed
      val bwd = CorpusDiff.diff(v2, v1, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      fwd.foreach { case (id, c) =>
        val expect = c match {
          case "added" => "removed"; case "removed" => "added"; case x => x
        }
        assert(bwd(id) === expect, s"trial $trial: id $id $c vs ${bwd(id)}")
      }
    }
  }

  test("mutualKnnEdges ⊆ both directed lists and is swap-invariant") {
    (1 to 3).foreach { trial =>
      // random directed top-k lists (not from any metric — the edge
      // builder must not care)
      val lists = (0 until 200).map { _ =>
        (rng.nextInt(30).toLong, rng.nextInt(30).toLong)
      }.filter(p => p._1 != p._2).distinct
      val topk = lists.toDF("query_id", "neighbor_id")
      val edges = Similarity.mutualKnnEdges(topk)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val l = lists.toSet
      val expected = l.filter { case (a, b) => a < b && l.contains((b, a)) }
      assert(edges === expected, s"trial $trial")
    }
  }

  test("spanScrub: token accounting, subsequence, and affected = d07's later docs") {
    import graft.operators.Dedup
    (1 to 3).foreach { trial =>
      // random corpus with planted shared runs so spans exist
      val run = (0 until 20 + trial * 3).map(i => s"run${trial}x$i")
      val base = randomCorpus(20, 10)
      val corpus = (base ++ Seq(
        (100L + trial, (run ++ base(trial)._2.split(" ").take(3)).mkString(" ")),
        (200L + trial, ("lead" +: run).mkString(" "))
      )).toDF("doc_id", "text")
      val out = Dedup.scrubDupSpans(corpus, "doc_id", "text",
          k = 5, minSpan = 15)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      assert(out.nonEmpty, s"trial $trial: planted runs not scrubbed")
      val toks = corpus.collect()
        .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
          .split("\\s+").toSeq).toMap
      out.foreach { case (id, removed, clean) =>
        val orig = toks(id)
        val kept = if (clean.isEmpty) Seq.empty[String]
          else clean.split(" ").toSeq
        // removed + kept account for every original token
        assert(kept.length + removed === orig.length, s"trial $trial doc $id")
        // kept tokens are a subsequence of the original token stream
        val it = orig.iterator
        assert(kept.forall(t => it.contains(t)), s"doc $id not a subsequence")
      }
      // exactly the docs that are the LATER side of a >=minSpan pair
      val laterDocs = Dedup.dupSpans(corpus, "doc_id", "text",
          k = 5, minSpan = 15)
        .collect().map(_.getLong(1)).toSet
      assert(out.map(_._1).toSet === laterDocs, s"trial $trial")
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
