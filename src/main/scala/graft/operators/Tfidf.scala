package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{DecSum, TextFns}

/** Sparse lexical similarity: exact tf-idf cosine over an n-gram
  * inverted index, with a document-frequency cap as the scale contract.
  *
  * This is the token-space twin of the dense tiers in
  * [[Similarity]] — the representation is the classic IR one (tf·idf
  * weights over shingles) and the all-pairs product is computed the only
  * way that survives a 100 TB corpus: as an inverted-index self-join
  * keyed by gram, never as a dense cross product. Reference analog: the
  * duplicate-detection family of the DQ tier (SURVEY.md §2.10 G1) recast
  * as a ranked similarity, same family as d02/d04.
  *
  * Scale posture, in order of the plan:
  *
  *  - Grams are keyed by a 16-hex-char md5 prefix AT EXPLODE TIME and
  *    the raw gram string is dropped on the spot — no exchange after
  *    the document spread ever carries unbounded text (TfidfSpec pins
  *    this, the same width ratchet ShuffleWidthSpec holds over the
  *    hash-dedup tier). The 2⁻⁶⁴ collision floor is shared with the
  *    oracle, which keys by the same md5 prefix.
  *  - tf is a map-side-combinable `groupBy(id, gram_key)` count — and
  *    because the spread already hash-partitions by id, the grouping is
  *    exchange-free. The postings then take EXACTLY ONE gram_key
  *    exchange (the inverted-index shuffle): df rides a window count
  *    over that same partitioning instead of a separate aggregate +
  *    attach join, and the pair self-join runs co-partitioned on the
  *    persisted postings — no further key exchange anywhere in the
  *    operator.
  *  - `dfCap` bounds the per-gram posting list: a gram seen in more than
  *    `dfCap` documents is dropped from BOTH the norms and the pair
  *    products (classic stop-gram pruning — at corpus scale "the" pairs
  *    every document with every other; its idf ≈ 0 contribution is not
  *    worth a quadratic join). The published cosine is therefore EXACT
  *    in the capped gram space, and the cap makes the join fanout
  *    ≤ dfCap²/2 per gram — the same hot-bucket contract
  *    [[Dedup.withBucketStats]] enforces for the hash families.
  *  - Singleton grams (df = 1) stay in the norms (they dilute cosine,
  *    as they should) but never reach the pair join: `df >= 2` prunes
  *    them before the shuffle, which at web scale removes the long tail
  *    (typically >half of all postings).
  *
  * Determinism: weights are `round(tf·ln(N/df), 6)` doubles (row-local,
  * order-free), every cross-row sum carries `round(term, 6)` cast to
  * DECIMAL(38,6) — exact integer-scaled addition, so results are
  * independent of partitioning on any engine (the [[Pca]] recipe).
  */
object Tfidf {

  import DecSum.decSum6

  /** All k-gram shingles WITH multiplicity (tf needs counts;
    * [[Dedup.shingles]] is the distinct variant). Documents shorter
    * than k tokens contribute their whole text as one gram. */
  private def rawShingles(textCol: Column, k: Int): Column = {
    // let-binding via a 1-element transform (the Dedup.shingles fix):
    // interpreted HOF lambdas re-evaluate embedded subtrees per element,
    // so slicing the tokenize EXPRESSION would re-run the regex split of
    // the whole text once per gram — the bound lambda variable `ts` is
    // evaluated once and read at O(k) per shingle
    val toksOnce = array(TextFns.tokens(textCol))
    flatten(transform(toksOnce, ts =>
      when(size(ts) < k, array(concat_ws(" ", ts)))
        .otherwise(transform(
          sequence(lit(1), size(ts) - lit(k - 1)),
          i => concat_ws(" ", slice(ts, i, lit(k)))))))
  }

  /** The weighted-postings front half shared by [[cosinePairs]] and
    * [[incrementalCosinePairs]] — (id, df, gram_key, w), gram tf ×
    * corpus idf, df-capped. ONE copy: the incremental twin's equality
    * contract ("exactly cosinePairs(all), filtered") depends on the two
    * weight pipelines staying byte-identical, so they must not be able
    * to drift. One inverted-index exchange; df as a window count over
    * it. */
  private def weightedPostings(df: DataFrame, idCol: String,
      textCol: String, nGram: Int, dfCap: Int): DataFrame = {
    val spread = Caches.spreadByKey(df, col(idCol))
    val tf = spread
      .select(col(idCol).as("id"),
        explode(rawShingles(col(textCol), nGram)).as("gram"))
      .select(col("id"), substring(md5(col("gram")), 1, 16).as("gram_key"))
      .groupBy("id", "gram_key")
      .agg(count(lit(1)).cast("double").as("tf"))
    val stats = df.agg(count(lit(1)).cast("double").as("n_docs"))
    // an un-numbered repartition on purpose: AQE picks the exchange
    // width from the postings bytes (measured: pinning it to the full
    // shuffle width costs more in per-partition sort of the skewed
    // posting lists than the extra parallelism buys back)
    val keyed = tf.repartition(col("gram_key"))
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("gram_key"))
        .cast("double"))
      .filter(col("df") <= dfCap)
    keyed
      .crossJoin(broadcast(stats))
      .select(col("id"), col("df"), col("gram_key"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("w"))
  }

  /** `(id_a, id_b, cos)` for every pair with capped-space tf-idf cosine
    * ≥ `threshold`, `id_a < id_b`. */
  def cosinePairs(df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 3, dfCap: Int = 64,
      threshold: Double = 0.35): DataFrame = {
    require(nGram >= 1 && dfCap >= 2, "nGram >= 1, dfCap >= 2")
    val w = weightedPostings(df, idCol, textCol, nGram, dfCap)

    Caches.scoped(w) {
      val norms = w.groupBy("id")
        .agg(sqrt(decSum6(col("w") * col("w"))).as("nrm"))
      val postings = w.filter(col("df") >= 2).select("gram_key", "id", "w")
      val dots = postings.as("a")
        .join(postings.as("b"),
          col("a.gram_key") === col("b.gram_key") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(decSum6(col("a.w") * col("b.w")).as("dot"))
      dots
        .join(norms.withColumnRenamed("id", "id_a")
          .withColumnRenamed("nrm", "nrm_a"), "id_a")
        .join(norms.withColumnRenamed("id", "id_b")
          .withColumnRenamed("nrm", "nrm_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          round(col("dot") / (col("nrm_a") * col("nrm_b")), 4).as("cos"))
        .filter(col("cos") >= threshold)
    }
  }

  /** Daily-increment twin of [[cosinePairs]]: pairs with at least one
    * NEW endpoint (per `newPred`), exactly equal to
    * `cosinePairs(all).filter(id_a new ∨ id_b new)` — df, idf, and
    * norms stay CORPUS-wide, so the increment sees the same weights a
    * full recompute would.
    *
    * The scale contract is the [[Dedup.incrementalMinhashPairs]] shape:
    * the pair join probes with the increment's postings only, so its
    * cost is ∝ increment × df, never corpus². Orientation dedup is done
    * in the join condition — `a.id < b.id ∨ ¬b.is_new` keeps exactly
    * one orientation per pair (both-new pairs arrive in both orders
    * from the new-side probe; new×old pairs arrive once) — because the
    * dot is an AGGREGATE over shared grams and a distinct() after the
    * fact would be too late to stop double-counted terms. */
  def incrementalCosinePairs(df: DataFrame, idCol: String, textCol: String,
      newPred: Column, nGram: Int = 3, dfCap: Int = 64,
      threshold: Double = 0.35): DataFrame = {
    require(nGram >= 1 && dfCap >= 2, "nGram >= 1, dfCap >= 2")
    // a NULL predicate value means NOT new: without the coalesce a null
    // flag would turn the orientation predicate (a.id < b.id ∨
    // ¬b.is_new) null and silently drop new-vs-null-flag pairs whose
    // new endpoint has the larger id — an id-order-dependent loss
    val flags = df.select(col(idCol).as("id"),
      coalesce(newPred, lit(false)).as("is_new"))
    val w = weightedPostings(df, idCol, textCol, nGram, dfCap)
      .join(flags, "id") // doc-count-sized side; AQE broadcasts

    Caches.scoped(w) {
      val norms = w.groupBy("id")
        .agg(sqrt(decSum6(col("w") * col("w"))).as("nrm"))
      val postings = w.filter(col("df") >= 2)
        .select("gram_key", "id", "is_new", "w")
      val dots = postings.filter(col("is_new")).as("a")
        .join(postings.as("b"),
          col("a.gram_key") === col("b.gram_key") &&
            col("a.id") =!= col("b.id") &&
            (col("a.id") < col("b.id") || !col("b.is_new")))
        .groupBy(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"))
        .agg(decSum6(col("a.w") * col("b.w")).as("dot"))
      dots
        .join(norms.withColumnRenamed("id", "id_a")
          .withColumnRenamed("nrm", "nrm_a"), "id_a")
        .join(norms.withColumnRenamed("id", "id_b")
          .withColumnRenamed("nrm", "nrm_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          round(col("dot") / (col("nrm_a") * col("nrm_b")), 4).as("cos"))
        .filter(col("cos") >= threshold)
    }
  }

  /** DuckDB twin of [[cosinePairs]] over `documents(doc_id, text)` —
    * identical gram extraction, weighting, capping, and decimal-sum
    * arithmetic. `extraWhere` (over `id_a`/`id_b`) restricts the pair
    * set — the [[incrementalCosinePairs]] oracle is the FULL recompute
    * filtered to new-endpoint pairs, which is exactly that operator's
    * equality contract. */
  def cosinePairsOracleSql(nGram: Int, dfCap: Int,
      threshold: Double, extraWhere: String = ""): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(tk) < $nGram THEN [array_to_string(tk, ' ')]
       |         ELSE [array_to_string(tk[i:i+${nGram - 1}], ' ')
       |               for i in range(1, len(tk) - ${nGram - 2})]
       |    END) AS gram
       |  FROM toks),
       |tf AS (SELECT doc_id, substr(md5(gram), 1, 16) AS gram_key,
       |         CAST(COUNT(*) AS DOUBLE) AS tf
       |       FROM sh GROUP BY 1, 2),
       |dfs AS (SELECT gram_key AS dkey, CAST(COUNT(*) AS DOUBLE) AS df
       |        FROM tf GROUP BY gram_key HAVING COUNT(*) <= $dfCap),
       |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
       |w AS (SELECT doc_id, df, gram_key,
       |        ROUND(tf * LN(n_docs / df), 6) AS w
       |      FROM tf, dfs, n WHERE tf.gram_key = dfs.dkey),
       |nrm AS (SELECT doc_id,
       |    SQRT(CAST(SUM(CAST(ROUND(w * w, 6) AS DECIMAL(38,6))) AS DOUBLE)) AS nrm
       |  FROM w GROUP BY doc_id),
       |dots AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(SUM(CAST(ROUND(a.w * b.w, 6) AS DECIMAL(38,6))) AS DOUBLE) AS dot
       |  FROM w a JOIN w b
       |    ON a.gram_key = b.gram_key AND a.doc_id < b.doc_id
       |   AND a.df >= 2 AND b.df >= 2
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos
       |FROM dots JOIN nrm na ON dots.id_a = na.doc_id
       |          JOIN nrm nb ON dots.id_b = nb.doc_id
       |WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= $threshold
       |${if (extraWhere.isEmpty) "" else s"  AND ($extraWhere)\n"}ORDER BY id_a, id_b""".stripMargin
}
