package graft

import graft.operators.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("merges learns the classic low/lower sequence") {
    // freq: "low" x5, "lower" x2 -> pairs: (l,o)=7, (o,w)=7, (w,e)=2,
    // (e,r)=2. Argmax ties (l,o) vs (o,w) at 7 -> lexicographic picks
    // (l,o). After merge: (lo,w)=7 wins round 2 -> "low" is one symbol.
    // Round 3 ties (low,e) vs (e,r) at 2 -> lexicographic picks (e,r).
    val df = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .map(w => Tuple1(w)).toDF("text")
    val out = Bpe.merges(df, "text", iters = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getString(3), r.getLong(4))).toSeq ===
      Seq((1L, "lo", 7L), (2L, "low", 7L), (3L, "er", 2L)))
    assert(out(2).getString(1) === "e" && out(2).getString(2) === "r")
  }

  test("merge application is boundary-safe and greedy left-to-right") {
    // "aaa" x3: round 1 pair (a,a) counted twice per word (overlapping
    // count = 6), merge rewrites greedily left-to-right -> <aa><a>
    val df = Seq.fill(3)("aaa").map(w => Tuple1(w)).toDF("text")
    val out = Bpe.merges(df, "text", iters = 2).collect()
    assert((out(0).getString(3), out(0).getLong(4)) === (("aa", 6L)))
    // round 2: remaining adjacency is (aa, a) x3
    assert((out(1).getString(1), out(1).getString(2), out(1).getLong(4)) ===
      (("aa", "a", 3L)))
  }

  test("drains cleanly when no pairs remain") {
    val df = Seq("a b", "a b").map(w => Tuple1(w)).toDF("text")
    // vocab {a, b}: single-char words have no adjacent pairs at all
    assert(Bpe.merges(df, "text", iters = 4).count() === 0)
  }

  test("encode counts post-merge symbols per document") {
    // after 2 merges on {"low" x5, "lower" x2}: "low" -> 1 symbol <low>,
    // "lower" -> 3 symbols <low><e><r>
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val out = Bpe.encode(corpus, "doc_id", "text", iters = 2)
      .orderBy("id").collect()
    assert(out.length === 7)
    out.take(5).foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === ((1L, 1L, 1.0)))
    }
    out.drop(5).foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === ((1L, 3L, 3.0)))
    }
  }

  test("encode with zero effective merges counts characters") {
    val corpus = Seq((1L, "ab cde")).toDF("doc_id", "text")
    // only 1 distinct doc; merges reduce symbols but n_tokens stays 2
    val r = Bpe.encode(corpus, "doc_id", "text", iters = 1)
      .collect().head
    assert(r.getLong(1) === 2L)
    // one merge applied somewhere: 5 chars total -> 4 symbols
    assert(r.getLong(2) === 4L)
  }

  test("tokens containing wrapper brackets fail fast") {
    val df = Seq((1L, "ok <br> ok")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.merges(df, "text", iters = 2).collect()
    }
    assert(e.getMessage.contains("<"))
  }

  test("corpus run yields the requested number of merges") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = Bpe.merges(d, "text", iters = 4).collect()
    assert(out.length === 4)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    // each learned merge concatenates its operands
    out.foreach(r => assert(r.getString(1) + r.getString(2) === r.getString(3)))
  }
}
