package graft.operators

import graft.operators.Caches.EagerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Materialized corpus token statistics — the text-tier member of the
  * build-once/serve-many index family ([[Similarity.buildIvfIndex]],
  * [[Dedup]]'s MinHash index): ONE corpus tokenize pass reduces to a
  * persisted `(source, token, cnt)` table that then serves every
  * distribution-shaped query (per-source KL, top-token profiles,
  * unigram LM denominators) without ever re-reading the corpus.
  *
  * Incremental maintenance is LSM-shaped: [[appendTokenStats]]
  * tokenizes ONLY the increment and appends delta rows — no
  * read-modify-write of the settled index — and [[tokenStats]]
  * sum-merges deltas on read (a dictionary-scale aggregate). Nightly
  * maintenance therefore costs ∝ increment; a periodic [[compact]]
  * rewrite folds accumulated deltas back to one row per (source,
  * token) when the delta tail grows. At 100 TB the corpus tokenize is
  * the single most expensive text pass there is — this index is how
  * t39/t08-class questions get answered daily without paying it
  * daily. */
object TokenIndex {

  private[graft] def counts(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame =
    Caches.spreadByKey(docs, col(idCol))
      .select(col(srcCol).as("source"),
        explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))

  /** Build the index from scratch: one tokenize, one dictionary-scale
    * shuffle, one parquet write. */
  def buildTokenStats(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, indexDir: String): Unit =
    counts(docs, idCol, textCol, srcCol)
      .write.mode("overwrite").parquet(s"$indexDir/token_stats")

  /** Append an increment's counts as delta rows — tokenizes ONLY
    * `newDocs`; the settled index is untouched. Takes the index's
    * maintenance lock: an append committing between [[compact]]'s
    * merge snapshot and its directory swap would be deleted with the
    * swapped-out backup, silently losing those counts forever. */
  def appendTokenStats(newDocs: DataFrame, idCol: String, textCol: String,
      srcCol: String, indexDir: String): Unit =
    graft.core.Tables.withMaintenanceLock(newDocs.sparkSession, indexDir) {
      counts(newDocs, idCol, textCol, srcCol)
        .write.mode("append").parquet(s"$indexDir/token_stats")
    }

  /** The merged view: sum delta rows per (source, token). Exactly the
    * table [[buildTokenStats]] would produce over the union corpus —
    * counts are mergeable, so append order and batch boundaries can
    * never change the result. Heals a crashed [[compact]] swap first:
    * without it every serve after such a crash would fail on the
    * missing settled dir until a compact was manually re-run. */
  def tokenStats(spark: SparkSession, indexDir: String): DataFrame = {
    val target = new org.apache.hadoop.fs.Path(s"$indexDir/token_stats")
    val old = new org.apache.hadoop.fs.Path(s"$indexDir/token_stats.old")
    graft.core.Tables.recoverSwap(
      target.getFileSystem(spark.sparkContext.hadoopConfiguration),
      target, old)
    spark.read.parquet(s"$indexDir/token_stats")
      .groupBy("source", "token").agg(sum("cnt").as("cnt"))
  }

  /** Fold accumulated deltas back to one row per key (run when the
    * delta tail grows past taste; serving is correct either way).
    *
    * Crash-safe by construction: the merged table is written COMPLETE
    * to a temp sibling and only then renamed over the settled dir — the
    * earlier read-then-overwrite-in-place shape (via localCheckpoint)
    * could lose the whole index if an executor died mid-overwrite,
    * after the target had already been truncated. The settled dir is
    * never truncated before its replacement exists on disk. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    graft.core.Tables.withMaintenanceLock(spark, indexDir) {
      val target = new org.apache.hadoop.fs.Path(s"$indexDir/token_stats")
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/token_stats.compacting")
      val old = new org.apache.hadoop.fs.Path(s"$indexDir/token_stats.old")
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a crash between the two renames left no settled table — restore
      // the backup and re-merge (a re-run is a pure re-merge, idempotent)
      graft.core.Tables.recoverSwap(fs, target, old)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      tokenStats(spark, indexDir).write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(old)) fs.delete(old, true)
      if (!fs.rename(target, old))
        throw new java.io.IOException(s"compact could not move $target aside")
      if (!fs.rename(tmp, target)) {
        fs.rename(old, target) // roll back — the settled table survives
        throw new java.io.IOException(s"compact swap failed for $target")
      }
      fs.delete(old, true); ()
    }

  /** t39's per-source KL divergence served FROM THE INDEX — the same
    * math as the inline query, zero corpus reads. */
  def serveDomainKl(spark: SparkSession, indexDir: String): DataFrame = {
    val sc = tokenStats(spark, indexDir)
      .withColumnRenamed("cnt", "cs").eagerCheckpoint()
    val st = sc.groupBy("source").agg(sum("cs").cast("double").as("ns"))
    val cc = sc.groupBy("token").agg(sum("cs").cast("double").as("c"))
    val nt = cc.agg(sum("c").as("n"))
    sc.join(broadcast(cc), "token").join(broadcast(st), "source")
      .crossJoin(broadcast(nt))
      .groupBy(col("source"), col("ns"))
      .agg(round(sum((col("cs").cast("double") / col("ns")) *
        log((col("cs").cast("double") / col("ns")) /
          (col("c") / col("n")))), 4).as("kl"))
      .select(col("source"), col("ns").cast("long").as("n_tokens"), col("kl"))
      .orderBy("source")
  }

  /** Corpus-wide top-`n` tokens by total frequency, from the index
    * (tie by token text — deterministic). */
  def serveTopTokens(spark: SparkSession, indexDir: String,
      n: Int): DataFrame =
    tokenStats(spark, indexDir)
      .groupBy("token").agg(sum("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(n)
}
