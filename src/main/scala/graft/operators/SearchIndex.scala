package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Materialized full-text (BM25) search index — the lexical retrieval
  * twin of the ANN index families, and the serving tier t17's inline
  * BM25 stands in for: build once, then answer keyword queries from a
  * partition-pruned postings scan instead of re-tokenizing the corpus.
  *
  * Layout under `indexDir`:
  *  - `postings` — (token, doc_id, tf, dl) PARTITIONED BY
  *    `tok_p = pmod(xxhash64(token), parts)`: a query's terms map to a
  *    handful of tok_p directories, collected into a LITERAL partition
  *    filter at serve time (the [[Dedup.probeMinhashIndex]] /
  *    [[Similarity.ivfServeTopK]] discipline);
  *  - `stats` — one (n_docs, sum_dl) partial row PER build/append
  *    batch: exact integer sums, so corpus-level N and avgdl are a
  *    3-row aggregate at serve time, never a corpus scan;
  *  - `meta` — the frozen partition count.
  *
  * Unlike the IVF/PQ families there is NO drifting yardstick: postings
  * are a pure per-document function, and df/N/avgdl are recomputed at
  * serve time from the (pruned) postings and the stats partials — so
  * [[appendToBm25Index]] is ALWAYS exactly a one-shot rebuild, and a
  * serve is ALWAYS exactly the inline BM25 over the current corpus
  * (Bm25IndexSpec asserts both, byte-for-byte against t17's inline
  * formulation). */
object SearchIndex {

  private def postingsRows(docs: DataFrame, idCol: String, textCol: String,
      parts: Int): DataFrame =
    Caches.spreadByKey(docs, col(idCol))
      .select(col(idCol).cast("long").as("doc_id"),
        TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))
      .withColumn("tok_p", pmod(xxhash64(col("token")), lit(parts.toLong)))

  private def statsRow(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Caches.spreadByKey(docs, col(idCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextFns.tokens(col(textCol))).cast("long")).as("sum_dl"))

  /** Build the index: one tokenize + grouped-tf pass over the corpus,
    * one writer task per touched tok_p partition. `parts` bounds the
    * serve-time collect and the directory fan-out. */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, parts: Int = 64): Unit = {
    require(parts >= 1, s"parts ($parts) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(parts).toDF("parts")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
    statsRow(docs, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/stats")
    postingsRows(docs, idCol, textCol, parts)
      .repartition(col("tok_p"))
      .write.mode("overwrite").partitionBy("tok_p")
      .parquet(s"$indexDir/postings")
  }

  /** Append new documents — cost ∝ increment: the increment pays one
    * tokenize/tf pass and lands in its tok_p partitions plus ONE new
    * stats partial row; the settled postings are never read. Exactly
    * equivalent to a one-shot rebuild, always. */
  def appendToBm25Index(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, idCol: String, textCol: String): Unit = {
    val parts = spark.read.parquet(s"$indexDir/meta").head.getInt(0)
    statsRow(newDocs, idCol, textCol)
      .coalesce(1).write.mode("append").parquet(s"$indexDir/stats")
    postingsRows(newDocs, idCol, textCol, parts)
      .repartition(col("tok_p"))
      .write.mode("append").partitionBy("tok_p")
      .parquet(s"$indexDir/postings")
  }

  /** Serve a keyword query: top-k documents by BM25 (Lucene's variant,
    * t17's exact arithmetic — idf = ln(1 + (N-df+0.5)/(df+0.5)),
    * default k1 = 1.2, b = 0.75). The terms' tok_p values become a
    * LITERAL partition filter (computed by the same xxhash64 the build
    * used, via a 1-row local job), so the scan reads |terms| directory
    * slivers of the postings, never the corpus; df comes exactly from
    * the pruned rows, N/avgdl from the stats partials. Top-k plans as
    * TakeOrderedAndProject. */
  def bm25Serve(spark: SparkSession, indexDir: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Serve needs at least one term")
    import spark.implicits._
    val parts = spark.read.parquet(s"$indexDir/meta").head.getInt(0)
    val ps = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(parts.toLong)))
      .distinct().collect().map(_.getLong(0)) // bounded by |terms|
    val tf = graft.core.Tables.antiTombstones(spark,
        s"$indexDir/tombstones",
        spark.read.parquet(s"$indexDir/postings")
          .filter(col("tok_p").isin(ps.toSeq: _*))
          .filter(col("token").isin(terms: _*)), "doc_id")
      .select(col("doc_id"), col("token"),
        col("tf").cast("double").as("tf"), col("dl").cast("double").as("len"))
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum("n_docs").as("__n"), sum("sum_dl").as("__s"))
      .select(col("__n").cast("double").as("n_docs"),
        (col("__s").cast("double") / col("__n")).as("avg_len"))
    val dfreq = tf.groupBy("token")
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avg_len")))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfPart)
      .groupBy("doc_id")
      .agg(round(sum("term_score"), 4).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), col("doc_id")).limit(k)
  }

  /** Delete documents from the index WITHOUT a rebuild — the
    * [[Dedup.deleteFromMinhashIndex]] contract for the lexical tier:
    * ids land in the `tombstones` table (every serve anti-joins it),
    * and because N/avgdl live in ADDITIVE stats partials, the delete
    * also appends one NEGATIVE partial holding exactly the victims'
    * (count, Σdl) — computed from their own postings rows, so a
    * tombstoned index serves exactly like one whose deleted docs were
    * never appended (Bm25IndexSpec asserts it; df needs no adjustment,
    * it is recomputed from the anti-joined rows). The victim scan is
    * postings-wide but column-pruned (doc_id, dl) — deletes are rare
    * by contract. Terminal until [[purgeBm25Tombstones]]. */
  def deleteFromBm25Index(spark: SparkSession, indexDir: String,
      ids: DataFrame): Unit = {
    // already-tombstoned ids must not subtract their stats AGAIN — their
    // postings rows are still physically present until a purge, so a
    // repeated delete would double-count the negative partial; the
    // anti-join makes deletion idempotent (Bm25IndexSpec asserts it)
    // materialized BEFORE any write: the filtered set both feeds an
    // append INTO the tombstone table it reads and is scanned twice
    import graft.operators.Caches.EagerOps
    val victims = broadcast(graft.core.Tables.antiTombstones(spark,
      s"$indexDir/tombstones",
      ids.select(col(ids.columns.head).cast("long").as("doc_id")).distinct(),
      "doc_id").eagerCheckpoint())
    spark.read.parquet(s"$indexDir/postings")
      .join(victims, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("dl")).groupBy("doc_id")
      .agg(first("dl").as("dl"))
      .agg((-count(lit(1))).as("n_docs"), (-sum("dl")).as("sum_dl"))
      .coalesce(1).write.mode("append").parquet(s"$indexDir/stats")
    graft.core.Tables.appendTombstones(spark, s"$indexDir/tombstones",
      victims)
  }

  /** Physically drop tombstoned docs' postings rows and clear the
    * tombstone table. The stats NEGATIVES stay — they are the lasting
    * correct adjustment, not a tombstone artifact. Victims spread
    * across token partitions, so unlike the id-partitioned indexes the
    * rewrite typically touches most tok_p directories
    * ([[graft.core.Tables.purgeRows]] still skips untouched ones);
    * serves are identical before and after. */
  def purgeBm25Tombstones(spark: SparkSession, indexDir: String): Unit = {
    val tomb = s"$indexDir/tombstones"
    val path = new org.apache.hadoop.fs.Path(tomb)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    graft.core.Tables.withMaintenanceLock(spark, indexDir) {
      graft.core.Tables.purgeRows(spark, s"$indexDir/postings", "doc_id",
        spark.read.parquet(tomb))
      fs.delete(path, true)
    }
  }

  /** Fold the append-file pile back to target-size files per tok_p
    * partition — [[graft.core.Tables.compactTable]]'s staged atomic
    * swaps, under the same maintenance lock the other index families
    * take. Pure layout change; serves are identical before and after. */
  def compactBm25Index(spark: SparkSession, indexDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    graft.core.Tables.withMaintenanceLock(spark, indexDir) {
      graft.core.Tables.compactTable(spark, s"$indexDir/postings",
        targetBytes)
    }
}
