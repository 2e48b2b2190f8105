package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.TokenIndex
import graft.queries.PipelineQueries

/** Materialized token-stats index: serving must equal the inline
  * corpus-pass queries, and incremental append must equal a one-shot
  * build — counts are mergeable, so batch boundaries can't matter. */
class TokenIndexSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def kl(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("served KL from the index == inline t39 over the same corpus") {
    val docs = Tables.table(spark, sfDir, "documents")
    val idx = Files.createTempDirectory("tok_index").toString
    TokenIndex.buildTokenStats(docs, "doc_id", "text", "source", idx)
    val served = kl(TokenIndex.serveDomainKl(spark, idx))
    val inline = kl(PipelineQueries.t39DomainKl(spark, sfDir))
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("append ≡ one-shot build, for any split and any batch order") {
    val docs = Tables.table(spark, sfDir, "documents")
    val incr = Files.createTempDirectory("tok_incr").toString
    val full = Files.createTempDirectory("tok_full").toString
    TokenIndex.buildTokenStats(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", "source", incr)
    TokenIndex.appendTokenStats(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", "source", incr)
    TokenIndex.appendTokenStats(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", "source", incr)
    TokenIndex.buildTokenStats(docs, "doc_id", "text", "source", full)
    def stats(dir: String) = TokenIndex.tokenStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(stats(incr) === stats(full))
    // deltas really accumulated (more physical rows than merged keys)
    val raw = spark.read.parquet(s"$incr/token_stats").count()
    assert(raw > stats(incr).size,
      "append should leave delta rows, not rewrite the index")
    // compaction folds them without changing the merged view
    TokenIndex.compact(spark, incr)
    assert(spark.read.parquet(s"$incr/token_stats").count() ===
      stats(full).size.toLong)
    assert(stats(incr) === stats(full))
    // and serving is unchanged after compaction
    assert(kl(TokenIndex.serveDomainKl(spark, incr)) ===
      kl(TokenIndex.serveDomainKl(spark, full)))
  }

  test("top tokens from the index match a direct corpus count") {
    val docs = Tables.table(spark, sfDir, "documents")
    val idx = Files.createTempDirectory("tok_top").toString
    TokenIndex.buildTokenStats(docs, "doc_id", "text", "source", idx)
    val got = TokenIndex.serveTopTokens(spark, idx, 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }
}
