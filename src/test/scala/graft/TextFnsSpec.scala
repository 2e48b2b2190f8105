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
}
