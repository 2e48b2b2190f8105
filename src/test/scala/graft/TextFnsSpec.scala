package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

class TextFnsSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokenCount splits on whitespace runs") {
    val n = one("  one   two\tthree\nfour ")
      .select(TextFns.tokenCount(col("text"))).collect()(0).getLong(0)
    assert(n === 4L)
  }

  test("bpeish tokens split punctuation and digit runs") {
    val toks = one("don't stop, v2.0!")
      .select(TextFns.bpeishTokens(col("text"))).collect()(0).getSeq[String](0)
    assert(toks === Seq("don", "'", "t", "stop", ",", "v2", ".", "0", "!"))
  }

  test("langId picks the language with most marker hits, und when none") {
    val d = Seq(
      "the cat and the dog sat on the mat",
      "der hund und die katze ist nicht da",
      "el perro y la casa de la abuela con los gatos",
      "le chat et les maisons dans la ville",
      "xyzzy plugh qwerty").toDF("text")
    val out = d.select(TextFns.langId(col("text"))).collect().map(_.getString(0))
    assert(out === Array("en", "de", "es", "fr", "und"))
  }

  test("fingerprint is case- and whitespace-insensitive, content-sensitive") {
    val d = Seq(
      ("Hello   World", "hello world", "hello worlds")).toDF("a", "b", "c")
    val r = d.select(TextFns.fingerprint(col("a")), TextFns.fingerprint(col("b")),
      TextFns.fingerprint(col("c"))).collect()(0)
    assert(r.getString(0) === r.getString(1))
    assert(r.getString(0) !== r.getString(2))
  }

  test("quality score stays in [0,1] on testdata") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val bad = docs.select(TextFns.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad === 0L)
  }

  test("ratios handle empty text via nullif guard (no div-by-zero)") {
    val r = one("").select(
      TextFns.alphaRatio(col("text")),
      TextFns.stopwordRatio(col("text"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("chunkTokens: stride/overlap arithmetic and short-doc fallback") {
    import spark.implicits._
    // 10 tokens, window 4, overlap 1 → stride 3 → chunks at 0,3,6,9
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b")).toDF("doc_id", "text")
    val got = TextFns.chunkTokens(d, "doc_id", "text", window = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // n=10, w=4, stride=3 → ceil((10-4)/3)+1 = 3 chunks; the last one
    // (start 6) already reaches token 10 — full coverage, no extra chunk
    assert(got.toSeq === Seq(
      (1L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 4L, "w7 w8 w9 w10"),
      (2L, 0L, 2L, "a b")))
    // every token appears in at least one chunk; overlap tokens in two
    val cover = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(cover === (1 to 10).map(i => s"w$i").toSet)
  }

  test("chunkTokens invariants hold on random docs and window shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docsDf = (1L to 30L).map { i =>
      i -> Seq.tabulate(1 + rnd.nextInt(120))(j => s"t$j").mkString(" ")
    }.toDF("doc_id", "text")
    for ((w, o) <- Seq((16, 0), (16, 4), (7, 6))) {
      val step = w - o
      val chunks = TextFns.chunkTokens(docsDf, "doc_id", "text", w, o)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val byDoc = chunks.groupBy(_._1)
      docsDf.collect().foreach { row =>
        val id = row.getLong(0)
        val toks = row.getString(1).split(" ").toSeq
        val cs = byDoc(id).sortBy(_._2)
        // indices are 0..n-1 contiguous; widths ≤ w; full ordered coverage
        assert(cs.map(_._2).toSeq === cs.indices.map(_.toLong))
        assert(cs.forall(_._3 <= w))
        cs.foreach { case (_, ci, _, text) =>
          assert(text.split(" ").toSeq ===
            toks.slice((ci * step).toInt, (ci * step).toInt + w))
        }
        val lastStart = (cs.last._2 * step).toInt
        assert(lastStart + w >= toks.size, "last chunk must reach the end")
      }
    }
  }

  test("classifierScore is deterministic, bounded, and tracks the weight table") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        TextFns.classifierScore(col("text")).as("s"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out(0)._2 === out(1)._2) // pure function of the text
    out.foreach { case (_, s) => assert(s >= -0.5 && s <= 0.5) }
    // replay the weight table on the driver: md5 first 4 hex digits →
    // bucket (mod 1024), weight = (bucket % 197)/196 - 0.5, mean
    def ref(text: String): Double = {
      val ws = text.split("\\s+").map { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val bucket = java.lang.Long.parseLong(md.take(4), 16) % 1024
        (bucket % 197).toDouble / 196.0 - 0.5
      }
      math.rint(ws.sum / ws.length * 1e4) / 1e4
    }
    out.foreach { case (id, s) =>
      val text = if (id <= 2) "alpha beta gamma" else "zeta eta theta iota"
      assert(math.abs(s - ref(text)) < 1e-9, s"doc $id")
    }
  }

  test("t35 token entropy: hand-computed H and normalized form") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t35").toString
    Seq(
      (1L, "a a b b"),  // H = ln 2, 2 types → norm 1
      (2L, "a a a a"),  // zero entropy
      (3L, "a b c d"),  // H = ln 4, uniform → norm 1
      (4L, "a"),        // single token: H = 0, types = 1 → norm 0 (guard)
      (5L, "a a a b")   // H = ln4 − (3 ln 3)/4; norm = H / ln 2
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.PipelineQueries.t35TokenEntropy(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val h5 = math.log(4) - 3 * math.log(3) / 4
    assert(out(1L) === ((r4(math.log(2)), 1.0)))
    assert(out(2L) === ((0.0, 0.0)))
    assert(out(3L) === ((r4(math.log(4)), 1.0)))
    assert(out(4L) === ((0.0, 0.0)))
    assert(out(5L) === ((r4(h5), r4(h5 / math.log(2)))))
  }
}
