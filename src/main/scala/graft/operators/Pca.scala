package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column via fixed-iteration
  * power iteration — the corpus-level "dominant direction" screen of an
  * embedding-quality report (a collapsed embedding space shows one
  * component soaking up most of the variance; a healthy space spreads
  * it). Reference analog: the embedding-profile tier of the DQ layer
  * (SURVEY.md §2.11 recast for vectors, same family as v05-v07).
  *
  * Algorithm (deterministic by construction, identical on any engine):
  *
  *  1. quantize every component to 6 decimals (`xq_i = round(x_i, 6)`)
  *     — the same cross-engine determinism quantization the quality
  *     score uses at 4dp;
  *  2. mean-center: `m_i = Σ xq_i / n`, with the sums carried as
  *     DECIMAL(38,6) — exact integer-scaled arithmetic, so the total is
  *     independent of partitioning and row order (a plain double sum is
  *     not reproducible across partition layouts, let alone engines);
  *  3. two unrolled power-iteration steps from the uniform unit vector
  *     v0 = (1/√dim, …): `s_i = Σ_rows (xq_i − m_i)·⟨xq − m, v⟩`,
  *     per-row terms rounded to 6dp and summed in DECIMAL(38,6),
  *     then normalized;
  *  4. Rayleigh quotient λ̂ = Σ ⟨xq − m, v1⟩² / n and its share of the
  *     total variance — the "how collapsed is this space" gauge.
  *
  * Scale posture: three full scans of the vectors (mean pass + one per
  * iteration), each a single map-side-combinable aggregation whose
  * partial state is `2·dim` decimals; the 1-row stats frames ride back
  * in as broadcast joins. No shuffle ever carries vectors — only the
  * dim-wide sum rows move. The per-component arithmetic is textually
  * unrolled (dim literal terms, left-associated — the PQ-tier ADC
  * pattern), which keeps it inside whole-stage codegen and makes the
  * DuckDB oracle bit-identical; for dim beyond a few hundred you would
  * switch to the array-aggregate form and a rows-only check.
  *
  * All stage expressions are generated once by [[planText]] and shared
  * verbatim between the Spark side (via `expr`) and the DuckDB oracle
  * (via [[oracleSql]]) — only the element accessor differs
  * (`element_at(v, i)` vs `v[i]`, both 1-based).
  */
object Pca {

  /** Stage expression texts, engine-neutral except `elem`. */
  final case class PlanText(
      statsAggs: Seq[String], meanSelects: Seq[String],
      dot0: String, it1Aggs: Seq[String], norm1: String,
      v1Selects: Seq[String], dot1: String, it2Aggs: Seq[String],
      norm2: String)

  /** round-to-6dp double of component `i` — quantized identically by
    * both engines, and recovered exactly by the DECIMAL(38,6) cast. */
  private def xq(elem: Int => String)(i: Int): String =
    s"ROUND(CAST(${elem(i)} AS DOUBLE), 6)"

  /** Partition-order-independent sum: per-row term rounded to 6dp, cast
    * to DECIMAL(38,6) (exact), summed, returned as DOUBLE. */
  private def decSum(term: String): String =
    s"CAST(SUM(CAST(ROUND($term, 6) AS DECIMAL(38,6))) AS DOUBLE)"

  def planText(dim: Int, elem: Int => String): PlanText = {
    val x = xq(elem) _
    val is = 1 to dim
    // v0 = uniform unit vector; 1/sqrt(dim) for dim=64 is exactly 0.125,
    // and for any dim both engines evaluate the same literal division
    val v0 = s"(1.0 / SQRT(CAST($dim AS DOUBLE)))"
    PlanText(
      statsAggs =
        Seq("CAST(COUNT(*) AS DOUBLE) AS n") ++
          is.map(i => s"${decSum(x(i))} AS sx_$i") ++
          is.map(i => s"${decSum(s"${x(i)} * ${x(i)}")} AS sxx_$i"),
      meanSelects =
        Seq("n") ++
          is.map(i => s"sx_$i / n AS m_$i") :+
          (is.map(i => s"(sxx_$i / n - (sx_$i / n) * (sx_$i / n))")
            .mkString(" + ") + " AS vtot"),
      dot0 = "(" + is.map(i => s"(${x(i)} - m_$i)").mkString(" + ") +
        s") * $v0",
      it1Aggs = is.map(i => s"${decSum(s"(${x(i)} - m_$i) * dot0")} AS s1_$i"),
      norm1 = "SQRT(" + is.map(i => s"s1_$i * s1_$i").mkString(" + ") + ")",
      v1Selects = is.map(i => s"s1_$i / norm1 AS v1_$i"),
      dot1 = is.map(i => s"(${x(i)} - m_$i) * v1_$i").mkString(" + "),
      it2Aggs =
        is.map(i => s"${decSum(s"(${x(i)} - m_$i) * dot1")} AS s2_$i") :+
          s"${decSum("dot1 * dot1")} AS r2",
      norm2 = "SQRT(" + is.map(i => s"s2_$i * s2_$i").mkString(" + ") + ")")
  }

  /** (component, loading, lambda_hat, var_share) — `dim` rows, loadings
    * of the unit top component (sign is the deterministic one the
    * iteration converges to from v0), λ̂ and its share of total variance
    * constant across rows. */
  def topComponent(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    df.select(size(col(vecCol)).as("d")).head(1).foreach { r =>
      require(r.getInt(0) == dim, s"vector dim ${r.getInt(0)} != $dim")
    }
    val t = planText(dim, i => s"element_at($vecCol, $i)")
    def agg1(d: DataFrame, aggs: Seq[String]): DataFrame =
      d.agg(expr(aggs.head), aggs.tail.map(expr): _*)
    val mstats = agg1(df, t.statsAggs).select(t.meanSelects.map(expr): _*)
    val v1 = agg1(
        df.crossJoin(broadcast(mstats)).withColumn("dot0", expr(t.dot0)),
        t.it1Aggs)
      .withColumn("norm1", expr(t.norm1))
      .select(t.v1Selects.map(expr): _*)
    val fin = agg1(
        df.crossJoin(broadcast(mstats)).crossJoin(broadcast(v1))
          .withColumn("dot1", expr(t.dot1)),
        t.it2Aggs)
      .crossJoin(broadcast(mstats))
      .withColumn("norm2", expr(t.norm2))
    val loadings = (1 to dim).map(i => expr(s"ROUND(s2_$i / norm2, 6)"))
    fin.select(
        expr("ROUND(r2 / n, 6)").as("lambda_hat"),
        expr("ROUND((r2 / n) / vtot, 6)").as("var_share"),
        posexplode(array(loadings: _*)))
      .select((col("pos") + 1).cast("long").as("component"),
        col("col").as("loading"), col("lambda_hat"), col("var_share"))
      .orderBy("component")
  }

  /** DuckDB twin: identical stage texts over `table`.`vecCol` with the
    * 1-based list accessor. */
  def oracleSql(table: String, vecCol: String, dim: Int): String = {
    val t = planText(dim, i => s"$vecCol[$i]")
    val v2List = (1 to dim).map(i => s"s2_$i / norm2").mkString(", ")
    s"""WITH stats AS (SELECT ${t.statsAggs.mkString(", ")} FROM $table),
       |m AS (SELECT ${t.meanSelects.mkString(", ")} FROM stats),
       |p1 AS (SELECT ${t.dot0} AS dot0, $vecCol, m.* FROM $table, m),
       |it1 AS (SELECT ${t.it1Aggs.mkString(", ")} FROM p1),
       |v1 AS (SELECT ${t.v1Selects.mkString(", ")}
       |       FROM (SELECT *, ${t.norm1} AS norm1 FROM it1)),
       |p2 AS (SELECT ${t.dot1} AS dot1, $vecCol, m.*, v1.*
       |       FROM $table, m, v1),
       |it2 AS (SELECT ${t.it2Aggs.mkString(", ")} FROM p2),
       |f AS (SELECT *, ${t.norm2} AS norm2 FROM it2, m)
       |SELECT CAST(comp AS BIGINT) AS component,
       |  ROUND(list_value($v2List)[comp], 6) AS loading,
       |  ROUND(r2 / n, 6) AS lambda_hat,
       |  ROUND((r2 / n) / vtot, 6) AS var_share
       |FROM f, (SELECT unnest(range(1, ${dim + 1})) AS comp)
       |ORDER BY component""".stripMargin
  }
}
