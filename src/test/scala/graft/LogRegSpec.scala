package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.LogReg

class LogRegSpec extends SparkSuite {
  import spark.implicits._

  private def fit(iters: Int) = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    LogReg.logregFit(docs, "text", col("lang") === "en", iters = iters)
  }

  test("GD descends: fitted log-loss beats the zero-coefficient start") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = fit(3).collect()
    assert(rows.length === LogReg.featureNames.size)
    val betas = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // log-loss under the fitted coefficients vs under beta = 0 (whose
    // loss is exactly ln 2 per row) — three ascent steps must improve it
    val y = (col("lang") === "en").cast("double")
    val z = lit(betas("b0_bias")) +
      lit(betas("b1_len")) * least(lit(1.0),
        graft.functions.TextFns.tokenCount(col("text")).cast("double") / 100.0) +
      lit(betas("b2_alpha")) * graft.functions.TextFns.alphaRatio(col("text")) +
      lit(betas("b3_stop")) * graft.functions.TextFns.stopwordRatio(col("text"))
    val s = lit(1.0) / (lit(1.0) + exp(-z))
    val loss = docs.agg(avg(-(y * log(s) + (lit(1.0) - y) * log(lit(1.0) - s))))
      .head().getDouble(0)
    assert(loss < math.log(2.0),
      s"fitted loss $loss should beat the ln(2) zero-coefficient loss")
    val acc = rows.head.getDouble(3)
    val n = rows.head.getLong(2)
    assert(n === docs.count())
    val enFrac = docs.filter(col("lang") === "en").count().toDouble / n
    val majority = math.max(enFrac, 1 - enFrac)
    assert(acc >= majority - 0.05,
      s"train acc $acc far below majority-class $majority")
  }

  test("each iteration is a proper ascent step: 1-iter and 3-iter fits differ") {
    val b1 = fit(1).collect().map(_.getDouble(1)).toSeq
    val b3 = fit(3).collect().map(_.getDouble(1)).toSeq
    assert(b1 !== b3)
    // determinism: re-running the same fit reproduces coefficients exactly
    assert(fit(3).collect().map(_.getDouble(1)).toSeq === b3)
  }

  test("gopher rule signals match hand-computed values on crafted text") {
    val df = Seq(
      (1L, "the cat and the hat sat on a mat"), // stopword-rich, clean
      (2L, "### ### ... ... ...")               // symbol soup
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
      TextFns.tokenCount(col("text")).as("n"),
      TextFns.meanWordLen(col("text")).as("mwl"),
      TextFns.symbolRatio(col("text")).as("sym"),
      TextFns.alphaWordFrac(col("text")).as("awf"),
      TextFns.stopwordHits(col("text")).as("hits"))
      .orderBy("doc_id").collect()
    // doc 1: 9 tokens / 24 letters; stopwords: the,and,the,on,a = 5
    assert(r(0).getLong(1) === 9L)
    assert(r(0).getDouble(2) === math.rint(24.0 / 9 * 1e4) / 1e4)
    assert(r(0).getDouble(3) === 0.0)
    assert(r(0).getDouble(4) === 1.0)
    assert(r(0).getLong(5) === 5L)
    // doc 2: 5 tokens, 6 hashes + 3 ellipses = 9 symbols, no letters
    assert(r(1).getLong(1) === 5L)
    assert(r(1).getDouble(3) === 1.8)
    assert(r(1).getDouble(4) === 0.0)
    assert(r(1).getLong(5) === 0L)
  }
}
