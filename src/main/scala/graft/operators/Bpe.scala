package graft.operators

import graft.operators.Caches.EagerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Byte-pair-encoding merge training (Sennrich et al., ACL 2016) — the
  * tokenizer-vocabulary step of a pretraining pipeline, run the way BPE
  * is actually trained at corpus scale: over the WORD-FREQUENCY table,
  * never the raw text. One pass aggregates the corpus into
  * (word, count) — from then on every merge iteration costs
  * O(|vocab|), not O(|corpus|), which is the whole reason BPE training
  * is tractable on a 100 TB corpus (the vocab is millions of rows where
  * the corpus is trillions of tokens).
  *
  * Representation: a word's current symbol sequence is one string with
  * every symbol wrapped in angle brackets — "low" is `<l><o><w>`, and
  * after merging (l,o) it is `<lo><w>`. The wrappers make a literal
  * `replace` of `<a><b>` → `<ab>` boundary-safe: `<` occurs only at
  * symbol starts and `>` only at symbol ends, so a match can never
  * straddle a symbol boundary, and left-to-right non-overlapping
  * replacement (identical in the JVM and every SQL engine) IS the
  * greedy BPE merge order.
  *
  * Each iteration: split the wrapped string into symbols, count
  * adjacent pairs weighted by word frequency (map-side-combinable
  * groupBy — the shuffle carries (sym_a, sym_b, partial count), never
  * words), take the global argmax with the engine-invariant tiebreak
  * (count desc, then pair lexicographic), apply the merge, checkpoint
  * the small vocab state. The argmax collect is ONE row per iteration —
  * the same bounded-driver-state contract as the k-means/logreg fits.
  *
  * Determinism: counts are exact longs; the tiebreak is total; the
  * merge rewrite is literal (no regex). The DuckDB oracle
  * ([[mergesOracleSql]]) replays every iteration as a chained CTE with
  * a scalar-subquery argmax — digit-for-digit including tie rounds.
  */
object Bpe {

  /** Wrap every character of `word` as an initial symbol: "ab" → `<a><b>`.
    * DOTALL: Java's plain `.` excludes the Unicode line terminators
    * U+0085/U+2028/U+2029, which `\s+` tokenization does NOT strip — an
    * unwrapped character would break the `<`/`>` boundary-safety
    * invariant. RE2 (the DuckDB oracle) excludes only `\n` from `.`,
    * and `\n` never survives tokenization, so with DOTALL both engines
    * wrap every character. */
  private def wrapChars(word: org.apache.spark.sql.Column) =
    regexp_replace(word, "(?s)(.)", "<$1>")

  /** Learned state after `iters` merge rounds: the final vocab frame
    * `(word, cnt, rep)` plus the merge log.
    *
    * ONE localCheckpoint — the corpus-scan vocab aggregate — feeds the
    * whole loop; each round's vocab is just `i` chained literal
    * `replace` projections over it (narrow, re-executed per aggregate),
    * so there is no per-round checkpoint to leak and lineage stays
    * O(iters) projections deep. Cost per round: one combinable
    * aggregate over |vocab| rows.
    *
    * Contract: tokens must not contain the `<`/`>` wrapper characters —
    * a `<` inside a symbol would break the boundary-safety argument
    * (and the engines' wrapper-stripping disagrees on such words). The
    * vocab probe fails fast instead of learning corrupt merges;
    * production byte-level BPE maps bytes into a private alphabet
    * first, which is out of scope here. */
  private def learn(df: DataFrame, textCol: String,
      iters: Int): (DataFrame, Seq[(Long, String, String, String, Long)]) = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    var vocab = df
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), wrapChars(col("word")).as("rep"))
      .eagerCheckpoint()
    val bracketed = vocab.filter(col("word").contains("<") ||
      col("word").contains(">")).limit(1).collect()
    if (bracketed.nonEmpty) throw new IllegalArgumentException(
      s"BPE tokens must not contain '<' or '>' (found: ${bracketed.head.getString(0)})")

    val learned = collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var drained = false
    for (i <- 1 to iters if !drained) {
      val syms = split(regexp_replace(col("rep"), "^<|>$", ""), "><")
      val top = vocab
        .select(col("cnt"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("s")) - 1),
          j => struct(element_at(col("s"), j).as("lhs"),
            element_at(col("s"), j + 1).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("lhs"), col("rhs"))
        .head(1)
      if (top.isEmpty) drained = true
      else {
        val (a, b, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((i.toLong, a, b, a + b, pc))
        vocab = vocab.select(col("word"), col("cnt"),
          call_function("replace", col("rep"),
            lit(s"<$a><$b>"), lit(s"<$a$b>")).as("rep"))
      }
    }
    (vocab, learned.toSeq)
  }

  /** `(iter, lhs, rhs, merged, pair_count)` — the first `iters` BPE
    * merges learned from `textCol`'s whitespace tokens, one row per
    * iteration (fewer if the pair table drains first). */
  def merges(df: DataFrame, textCol: String, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    learn(df, textCol, iters)._2
      .toDF("iter", "lhs", "rhs", "merged", "pair_count")
      .orderBy("iter")
  }

  /** Segment every document with the vocab learned by `iters` merge
    * rounds: `(id, n_tokens, n_subwords, ratio)` where `n_subwords` is
    * the post-merge symbol count summed over the doc's words and
    * `ratio` = 4dp `n_subwords / n_tokens` — the tokenizer-efficiency
    * accounting (tokens-per-word) that drives packing and cost
    * estimates. The encode itself is ONE join from the exploded corpus
    * to the |vocab|-row segmentation table (AQE broadcasts it while it
    * fits; at web scale it's a plain key join on `word`) plus a
    * map-side-combinable per-doc sum — the corpus is never re-scanned
    * per merge round. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      iters: Int): DataFrame = {
    val vocab = learn(df, textCol, iters)._1
      .select(col("word"),
        size(split(regexp_replace(col("rep"), "^<|>$", ""), "><"))
          .cast("long").as("n_syms"))
    df.select(col(idCol).as("id"),
        explode(TextFns.tokens(col(textCol))).as("word"))
      .join(vocab, "word")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_syms").as("n_subwords"))
      .select(col("id"), col("n_tokens"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_tokens"), 4)
          .as("ratio"))
  }

  /** DuckDB twin of [[merges]] over `documents(text)`: `iters` chained
    * CTE stages, each recomputing the pair counts, selecting the argmax
    * via scalar subqueries, and rewriting the vocab — no value learned
    * by the Spark side is embedded. */
  def mergesOracleSql(iters: Int): String = {
    val finalRows = (1 to iters).map(i =>
      s"SELECT $i AS iter, lhs, rhs, lhs || rhs AS merged, pc FROM b$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${chainCtes(iters)}
       |SELECT CAST(iter AS BIGINT) AS iter, lhs, rhs, merged,
       |  CAST(pc AS BIGINT) AS pair_count
       |FROM ($finalRows)
       |ORDER BY iter""".stripMargin
  }

  /** One merge round as SQL: pair counts (`p_i`), argmax (`b_i`), vocab
    * rewrite (`w_i`). */
  private def stage(i: Int): String = {
    val prev = s"w${i - 1}"
    // MATERIALIZED is load-bearing: every stage references its
    // predecessor several times (pair scan + three scalar subqueries),
    // so DuckDB's default CTE inlining would expand the chain
    // exponentially in `iters`
    s"""p$i AS MATERIALIZED (
         |  SELECT (u).lhs AS lhs, (u).rhs AS rhs, SUM(cnt) AS pc FROM (
         |    SELECT cnt, unnest([{'lhs': s[j], 'rhs': s[j + 1]}
         |                        for j in range(1, len(s))]) AS u
         |    FROM (SELECT cnt,
         |            string_split(trim(rep, '<>'), '><') AS s
         |          FROM $prev)
         |    WHERE len(s) >= 2)
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT lhs, rhs, CAST(pc AS BIGINT) AS pc FROM p$i
         |        ORDER BY pc DESC, lhs, rhs LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT word, cnt,
         |    CASE WHEN (SELECT COUNT(*) FROM b$i) = 0 THEN rep
         |         ELSE replace(rep,
         |           '<' || (SELECT lhs FROM b$i) || '><' || (SELECT rhs FROM b$i) || '>',
         |           '<' || (SELECT lhs FROM b$i) || (SELECT rhs FROM b$i) || '>')
         |    END AS rep
         |  FROM $prev)""".stripMargin
  }

  /** The shared `w0 … w_iters` merge-round CTE chain. */
  private def chainCtes(iters: Int): String =
    s"""w0 AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    regexp_replace(word, '(.)', '<\\1>', 'g') AS rep
       |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |        FROM documents)
       |  GROUP BY word),
       |${(1 to iters).map(stage).mkString(",\n")}""".stripMargin

  /** DuckDB twin of [[encode]]: the same merge-round chain, then the
    * final vocab's symbol counts joined back onto the exploded corpus. */
  def encodeOracleSql(iters: Int): String =
    s"""WITH ${chainCtes(iters)},
       |v AS (SELECT word,
       |        CAST(len(string_split(trim(rep, '<>'), '><')) AS BIGINT) AS n_syms
       |      FROM w$iters),
       |d AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |      FROM documents)
       |SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_syms) AS BIGINT) AS n_subwords,
       |  ROUND(CAST(SUM(n_syms) AS DOUBLE) / COUNT(*), 4) AS ratio
       |FROM d JOIN v USING (word)
       |GROUP BY doc_id ORDER BY id""".stripMargin
}
