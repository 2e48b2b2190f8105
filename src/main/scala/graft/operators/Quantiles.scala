package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed share-of-corpus bucketing — the CCNet move (Wenzek et
  * al., LREC 2020): rank every document by a quality score and cut the
  * corpus into head/middle/tail at fixed cumulative shares.
  *
  * The naive form is `ntile(3) OVER (ORDER BY score)` — a GLOBAL window
  * that drags the whole corpus through one task (the anti-pattern
  * [[Packing]] exists to avoid). This operator uses the two-phase shape
  * that scales: the window runs over the DISTINCT-SCORE table, not the
  * corpus. Scores are 4dp-rounded, so that table is bounded by the
  * score range (thousands of rows at any corpus size, shuffled as
  * (double, count) pairs); the corpus itself is touched by exactly one
  * combinable count aggregate and one attach join keyed on the score.
  *
  * Tie semantics (which ntile does NOT have): equal scores always land
  * in the same bucket — the cut moves to the score boundary. That is
  * the determinism contract that makes the result engine-invariant and
  * partition-independent; it also matches what CCNet actually ships
  * (documents with identical perplexity are interchangeable).
  *
  * Cuts are (label, num, den) rationals evaluated as `num·1.0/den` by
  * both engines — identical IEEE doubles, so the `frac <= cut`
  * comparisons agree bit-for-bit. */
object Quantiles {

  /** `(…, bucket)`: rows whose cumulative count share (ascending
    * `scoreCol` order) is ≤ num/den get that cut's label; the rest get
    * `lastLabel`. */
  def cumShareBuckets(scores: DataFrame, scoreCol: String,
      cuts: Seq[(String, Int, Int)], lastLabel: String): DataFrame = {
    require(cuts.nonEmpty, "need at least one cut")
    // the foldRight CASE chain evaluates cuts in the given order, so
    // descending shares would shadow every earlier (smaller) cut —
    // rows meant for it silently land in the larger bucket's label;
    // enforce the ascending precondition instead of mislabeling
    val shares = cuts.map { case (_, num, den) =>
      require(den > 0 && num >= 0, s"cut shares must be ratios, got $num/$den")
      num.toDouble / den
    }
    require(shares.zip(shares.tail).forall { case (a, b) => a < b },
      s"cuts must ascend strictly by share, got ${shares.mkString(", ")}")
    // null scores are excluded from the distribution AND the output
    // (the attach join is inner): Spark's window orders NULLS FIRST
    // where DuckDB defaults NULLS LAST, so a null group in `dist` would
    // shift every cut differently per engine
    val dist = scores.filter(col(scoreCol).isNotNull)
      .groupBy(scoreCol).agg(count(lit(1)).as("__n"))
    val cum = dist
      .withColumn("__cum",
        sum(col("__n")).over(Window.orderBy(scoreCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = dist.agg(sum(col("__n")).as("__total"))
    val frac = col("__cum").cast("double") / col("__total").cast("double")
    val bucket = cuts.foldRight(lit(lastLabel): org.apache.spark.sql.Column) {
      case ((label, num, den), rest) =>
        when(frac <= lit(num) * lit(1.0) / lit(den), lit(label)).otherwise(rest)
    }
    scores
      .join(cum.crossJoin(broadcast(total))
        .select(col(scoreCol), bucket.as("bucket")), Seq(scoreCol))
  }

  /** DuckDB twin over a scores CTE named `sc` with column `scoreCol`. */
  def cumShareBucketsSql(scoreCol: String,
      cuts: Seq[(String, Int, Int)], lastLabel: String): String = {
    val cases = cuts.map { case (label, num, den) =>
      s"WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= $num * 1.0 / $den THEN '$label'"
    }.mkString(" ")
    s"""dist AS (SELECT $scoreCol, COUNT(*) AS n FROM sc
       |        WHERE $scoreCol IS NOT NULL GROUP BY $scoreCol),
       |c AS (SELECT $scoreCol,
       |        SUM(n) OVER (ORDER BY $scoreCol ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM dist),
       |t AS (SELECT SUM(n) AS total FROM dist),
       |bk AS (SELECT $scoreCol,
       |         CASE $cases ELSE '$lastLabel' END AS bucket
       |       FROM c, t)""".stripMargin
  }
}
