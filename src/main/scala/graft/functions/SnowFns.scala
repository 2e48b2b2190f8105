package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snowflake-dialect column-function aliases and plan-level rewrites.
  *
  * The reference's query surface is Snowflake SQL (`IFF`, `DATEADD`,
  * `DATEDIFF`, `LEFT`/`RIGHT`, `QUALIFY`, `UNPIVOT` — SURVEY.md §2.8/§2.5/
  * §2.7). Our public surface is the Spark DataFrame API, so these are thin
  * Scala shims over built-in (codegen'd) expressions — NOT parser
  * extensions — exactly as SURVEY.md §4 prescribes. Each cites the
  * reference usage it re-expresses.
  */
object SnowFns {

  /** Snowflake `IFF(pred, a, b)` (A4:749-756, 802-805). */
  def iff(pred: Column, ifTrue: Column, ifFalse: Column): Column =
    when(pred, ifTrue).otherwise(ifFalse)

  /** Snowflake `DATEADD(unit, n, ts)` (A4:396, 703). Units as Snowflake
    * spells them; n may be negative. */
  def dateadd(unit: String, n: Int, ts: Column): Column =
    timestamp_add(normUnit(unit), lit(n), ts)

  /** Snowflake `DATEDIFF(unit, a, b)` (A4:703, 714-728). Matches
    * Snowflake's argument order (start, end) AND its boundary-crossing
    * semantics: DATEDIFF counts unit boundaries crossed, not complete
    * elapsed units — `DATEDIFF(day, '23:00', next day '01:00')` is 1 in
    * Snowflake though only 2h elapsed. Truncating both sides to the
    * unit first makes Spark's complete-units diff equal the crossing
    * count (both stamps are unit-aligned after the trunc). */
  def datediffUnits(unit: String, start: Column, end: Column): Column = {
    val u = normUnit(unit)
    timestamp_diff(u, date_trunc(u, start), date_trunc(u, end))
  }

  private def normUnit(unit: String): String = unit.trim.toUpperCase match {
    case "SECONDS" | "SECOND" | "SEC" | "S" => "SECOND"
    case "MINUTES" | "MINUTE" | "MIN"       => "MINUTE"
    case "HOURS" | "HOUR" | "H"             => "HOUR"
    case "DAYS" | "DAY" | "D"               => "DAY"
    case "WEEKS" | "WEEK" | "W"             => "WEEK"
    case "MONTHS" | "MONTH" | "MON"         => "MONTH"
    case "QUARTERS" | "QUARTER" | "Q"       => "QUARTER"
    case "YEARS" | "YEAR" | "Y"             => "YEAR"
    case other => other
  }

  /** Snowflake `LEFT(s, n)` (A4:947). */
  def left(s: Column, n: Int): Column = substring(s, 1, n)

  /** Snowflake `RIGHT(s, n)` (A4:947) — last n chars, empty-safe. */
  def right(s: Column, n: Int): Column = substring(s, -n, n)

  /** Snowflake `NULLIFZERO(x)` family guard: divide-by-zero → null
    * (A4:790-794, 852-853). */
  def nullifZero(x: Column): Column = nullif(x, lit(0))

  /** Snowflake `QUALIFY row_number() over (partition by keys order by ord)
    * = 1` (A4:902-907) — Spark has no QUALIFY, so this is the documented
    * rewrite (SURVEY.md W2): rank within the window, keep rank 1, drop the
    * helper column. Returns the latest/first row per key group. */
  def qualifyRowNumber1(df: DataFrame, partitionBy: Seq[String],
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    // collision-proof helper name: a fixed "__rn" would silently
    // overwrite (and then drop) a caller column of the same name
    val rn = Iterator.from(0).map(i => s"__rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Snowflake `UNPIVOT(value FOR name IN (c1, c2, …))` (A4:797-807):
    * one input row → one output row per listed column, carrying the id
    * columns through. stack() keeps the projection inside whole-stage
    * codegen (no explode of a built map). */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      nameCol: String = "metric_name",
      valueColName: String = "metric_value"): DataFrame = {
    // names are interpolated into a SQL string — escape them (quote in
    // a column name would otherwise break the literal / identifier)
    def lit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def ident(s: String) = "`" + s.replace("`", "``") + "`"
    val pairs = valueCols
      .flatMap(c => Seq(lit(c), ident(c))).mkString(", ")
    df.select((idCols.map(col) :+
      expr(s"stack(${valueCols.size}, $pairs) as " +
        s"(${ident(nameCol)}, ${ident(valueColName)})")): _*)
  }
}
