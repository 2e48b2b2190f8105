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
  * iteration). Each scan is ONE map-side-combinable aggregation — a
  * native [[graft.functions.DecVecSumAgg]] sums all `dim` decimal
  * lanes in a single buffer, so each stage's exchange carries one
  * `dim`-wide partial per partition and the only per-row work is a
  * `zip_with`/`aggregate` fold over the array column (dot products)
  * plus the lane additions. The 1-row stats frames ride back in as
  * broadcast joins (both downstream stages join the same canonical
  * `broadcast(mstats)`, so ReuseExchange computes stage 1 once). The
  * expression tree is O(1) in `dim`: the round-5 form unrolled ~6·dim
  * DECIMAL expressions textually, which cost ~9 s of analysis/codegen
  * at dim=64 and was unusable at dim=768 — this form runs both dims
  * with the same three-job plan.
  *
  * Bit-parity with the oracle is preserved because the ARITHMETIC is
  * unchanged: every per-row term is rounded to 6dp then summed as
  * DECIMAL(38,6) (exact, order-free), and every double fold
  * (`aggregate(..., 0d, _+_)`) associates left in component order —
  * the same association the unrolled oracle text spells out. The
  * unrolled stage texts ([[planText]]) survive solely as the DuckDB
  * oracle ([[oracleSql]]), practical there because DuckDB plans the
  * dim≤64 oracle query once.
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

  // the shared determinism recipe — the column twin of [[decSum]]'s text
  private val dec638 = graft.functions.DecSum.dec386
  private def decSumC(term: Column): Column =
    graft.functions.DecSum.decSum6(term)

  /** Left fold `0.0 + a(0) + a(1) + …` — the association the unrolled
    * oracle text uses (IEEE-identical to seeding with the first term,
    * up to the sign of a zero, which the downstream 6dp decimal
    * quantization erases). */
  private def foldSum(a: Column): Column =
    aggregate(a, lit(0.0d), (acc, x) => acc + x)

  /** Per-term ROUND(·,6) → DECIMAL(38,6) over an array column — the
    * element-wise twin of [[decSum]]'s inner cast, feeding
    * [[graft.functions.DecVecSumAgg]]. */
  private def decTerms(a: Column): Column =
    transform(a, t => round(t, 6).cast(dec638))

  private def toDoubles(a: Column): Column =
    transform(a, d => d.cast("double"))

  /** (component, loading, lambda_hat, var_share) — `dim` rows, loadings
    * of the unit top component (sign is the deterministic one the
    * iteration converges to from v0), λ̂ and its share of total variance
    * constant across rows. Null vectors are rejected up front (the
    * exploded aggregation would silently drop them from `n`). */
  def topComponent(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    // Dim guard rides inside the scans instead of a separate probe job:
    // assert_true returns null on pass (filter keeps every row) and
    // throws on the first null, ragged, or null-element vector. These
    // MUST fail fast — a null vector would silently drop from n, and a
    // null ELEMENT would skip its lane's sum while still counting in n,
    // biasing every mean/loading with no error.
    val checked = df.filter(assert_true(
      coalesce(size(col(vecCol)), lit(-1)) === dim &&
        forall(col(vecCol), x => x.isNotNull),
      lit(s"$vecCol: null, ragged, or non-$dim-dim vector")).isNull)
    // xq: every component quantized to 6dp, once, as an array column
    val xq = transform(col(vecCol), x => round(x.cast("double"), 6))
    val v0 = expr(s"1.0 / SQRT(CAST($dim AS DOUBLE))")

    import graft.functions.DecVecSumAgg.decVecSum

    // stage 1 — per-component Σxq, Σxq² and n, one aggregate buffer each
    val stats = checked.agg(
        decVecSum(decTerms(xq), dim).as("sxD"),
        decVecSum(decTerms(zip_with(xq, xq, (a, b) => a * b)), dim).as("sxxD"),
        count(lit(1)).cast("double").as("n"))
      .select(col("n"), toDoubles(col("sxD")).as("sx"),
        toDoubles(col("sxxD")).as("sxx"))
    val mstats = stats.select(col("n"),
      transform(col("sx"), s => s / col("n")).as("mA"),
      foldSum(zip_with(col("sxx"), col("sx"),
        (sxx, sx) => sxx / col("n") - (sx / col("n")) * (sx / col("n"))))
        .as("vtot"))

    // dx = xq − m (per row); dot products are left folds in component
    // order. Both stages join the SAME broadcast(mstats) — canonically
    // identical exchanges, so ReuseExchange computes stage 1 once.
    def withDx(d: DataFrame): DataFrame =
      d.crossJoin(broadcast(mstats))
        .withColumn("dx", zip_with(xq, col("mA"), (x, m) => x - m))

    // stage 2 — s1 = Σ_rows (x_i − m_i)·⟨xq − m, v0⟩, then v1 = s1/‖s1‖
    val d0 = withDx(checked).withColumn("dot0", foldSum(col("dx")) * v0)
    val v1 = d0.agg(decVecSum(
          decTerms(transform(col("dx"), d => d * col("dot0"))), dim).as("s1D"))
      .select(toDoubles(col("s1D")).as("s1"))
      .withColumn("norm1", sqrt(foldSum(transform(col("s1"), s => s * s))))
      .select(transform(col("s1"), s => s / col("norm1")).as("v1A"))

    // stage 3 — s2 = Σ (x_i − m_i)·⟨xq − m, v1⟩ and r2 = Σ⟨xq−m,v1⟩²,
    // in the same single-buffer pass; n and vtot are row-constants from
    // the mstats broadcast, carried via max() so the tail needs no
    // third stats join.
    val d1 = withDx(checked).crossJoin(broadcast(v1))
      .withColumn("dot1",
        foldSum(zip_with(col("dx"), col("v1A"), (d, v) => d * v)))
    val it2 = d1.agg(decVecSum(
          decTerms(transform(col("dx"), d => d * col("dot1"))), dim).as("s2D"),
        decSumC(col("dot1") * col("dot1")).as("r2"),
        max(col("n")).as("n"), max(col("vtot")).as("vtot"))
      .select(toDoubles(col("s2D")).as("s2"), col("r2"),
        col("n"), col("vtot"))

    it2
      .withColumn("norm2", sqrt(foldSum(transform(col("s2"), s => s * s))))
      .select(round(col("r2") / col("n"), 6).as("lambda_hat"),
        round((col("r2") / col("n")) / col("vtot"), 6).as("var_share"),
        posexplode(transform(col("s2"), s => round(s / col("norm2"), 6))))
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
