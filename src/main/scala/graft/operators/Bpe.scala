package graft.operators

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

  /** Wrap every character of `word` as an initial symbol: "ab" → `<a><b>`. */
  private def wrapChars(word: org.apache.spark.sql.Column) =
    regexp_replace(word, "(.)", "<$1>")

  /** `(iter, lhs, rhs, merged, pair_count)` — the first `iters` BPE
    * merges learned from `textCol`'s whitespace tokens, one row per
    * iteration (fewer if the pair table drains first). */
  def merges(df: DataFrame, textCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val spark = df.sparkSession
    import spark.implicits._

    var vocab = df
      .select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), wrapChars(col("word")).as("rep"))
      .localCheckpoint()

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
        vocab = vocab.select(col("cnt"),
            call_function("replace", col("rep"),
              lit(s"<$a><$b>"), lit(s"<$a$b>")).as("rep"))
          .localCheckpoint()
      }
    }
    learned.toSeq.toDF("iter", "lhs", "rhs", "merged", "pair_count")
      .orderBy("iter")
  }

  /** DuckDB twin of [[merges]] over `documents(text)`: `iters` chained
    * CTE stages, each recomputing the pair counts, selecting the argmax
    * via scalar subqueries, and rewriting the vocab — no value learned
    * by the Spark side is embedded. */
  def mergesOracleSql(iters: Int): String = {
    def stage(i: Int): String = {
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
         |  SELECT cnt, replace(rep,
         |      '<' || (SELECT lhs FROM b$i) || '><' || (SELECT rhs FROM b$i) || '>',
         |      '<' || (SELECT lhs FROM b$i) || (SELECT rhs FROM b$i) || '>') AS rep
         |  FROM $prev)""".stripMargin
    }
    val finalRows = (1 to iters).map(i =>
      s"SELECT $i AS iter, lhs, rhs, lhs || rhs AS merged, pc FROM b$i")
      .mkString("\nUNION ALL ")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
       |    regexp_replace(word, '(.)', '<\\1>', 'g') AS rep
       |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |        FROM documents)
       |  GROUP BY word),
       |${(1 to iters).map(stage).mkString(",\n")}
       |SELECT CAST(iter AS BIGINT) AS iter, lhs, rhs, merged,
       |  CAST(pc AS BIGINT) AS pair_count
       |FROM ($finalRows)
       |ORDER BY iter""".stripMargin
  }
}
