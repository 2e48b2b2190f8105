package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed full-batch gradient-descent logistic regression over
  * text-derived quality features — the trainable twin of the fixed-weight
  * hashing classifier ([[TextFns.classifierScore]]): the quality/domain
  * filter of CCNet/DataComp-class pipelines, fit on the corpus itself.
  *
  * Scale shape: each GD iteration is ONE map-side-combinable aggregate
  * over the corpus (a scan producing 5 numbers), exactly how MLlib's
  * own LBFGS/OWLQN treeAggregate loop is built — no shuffle wider than
  * the 1-row gradient, coefficient state lives on the driver (4 doubles,
  * bounded). 100 TB cost = `iters + 1` corpus scans.
  *
  * Determinism contract (the [[Similarity.kmeansFit]] recipe): features
  * are 4 dp, sigmoids are 9 dp, per-row gradient terms are 13 dp —
  * 9 dp × 4 dp products are EXACTLY 13 decimal digits, so the decimal
  * cast is lossless — summed as DECIMAL(38,13) (order-independent),
  * and coefficients re-quantized to 8 dp every step. DuckDB replays the
  * identical arithmetic from [[oracleSql]]'s unrolled-CTE chain.
  */
object LogReg {

  /** Feature names in output order; index 0 is the bias/intercept. */
  val featureNames: Seq[String] = Seq("b0_bias", "b1_len", "b2_alpha", "b3_stop")

  private def featureCols(textCol: Column): Seq[Column] = Seq(
    lit(1.0),
    round(least(lit(1.0), TextFns.tokenCount(textCol).cast("double") / 100.0), 4),
    TextFns.alphaRatio(textCol),
    TextFns.stopwordRatio(textCol))

  private def sigmoid(z: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-z)), 9)

  /** Fit on `df`: label = `labelCol` (0/1), features derived from
    * `textCol`. Returns one row per coefficient:
    * (feature, beta, n_train, train_acc). */
  def logregFit(df: DataFrame, textCol: String, labelCol: Column,
      iters: Int = 3, lr: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    val feats = df.select(
      (labelCol.cast("double").as("y") +:
        featureCols(col(textCol)).zipWithIndex.map { case (c, j) => c.as(s"x$j") }): _*)

    def z(betas: Array[Double]): Column =
      betas.zipWithIndex.map { case (b, j) => lit(b) * col(s"x$j") }
        .reduce(_ + _)

    var betas = Array.fill(featureNames.size)(0.0)
    for (_ <- 1 to iters) {
      val resid = col("y") - sigmoid(z(betas))
      val grads = featureNames.indices.map(j =>
        sum(round(resid * col(s"x$j"), 13).cast("decimal(38,13)")).as(s"g$j"))
      val row = feats.agg(count(lit(1)).as("n"), grads: _*).head()
      val n = row.getLong(0).toDouble
      betas = betas.zipWithIndex.map { case (b, j) =>
        BigDecimal(b + lr * row.getDecimal(j + 1).doubleValue() / n)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }

    // final pass: training accuracy under the fitted coefficients — a
    // real corpus scan, so the declared plan keeps its aggregate stage
    val pred = (sigmoid(z(betas)) > 0.5).cast("double")
    val stats = feats.agg(count(lit(1)).as("n_train"),
      round(avg((pred === col("y")).cast("double")), 4).as("train_acc"))
    import spark.implicits._
    val coefs = featureNames.zip(betas).toDF("feature", "beta")
    coefs.crossJoin(broadcast(stats))
      .select(col("feature"), col("beta"), col("n_train"), col("train_acc"))
      .orderBy("feature")
  }

  /** DuckDB twin: the same fit unrolled iteration-by-iteration as a CTE
    * chain (i0 → g1 → i1 → … → i`iters`), generated from the same
    * constants so the two sides cannot drift. `labelSql` must be a 0/1
    * expression over `table`'s columns. */
  def oracleSql(table: String, textCol: String, labelSql: String,
      iters: Int = 3, lr: Double = 1.0): String = {
    val nf = featureNames.size
    val featSql = Seq(
      "1.0",
      s"ROUND(LEAST(1.0, CAST(${TextFns.tokenCountSql(textCol)} AS DOUBLE) / 100.0), 4)",
      TextFns.alphaRatioSql(textCol),
      TextFns.stopwordRatioSql(textCol))
    val featSel = featSql.zipWithIndex.map { case (f, j) => s"$f AS x$j" }.mkString(", ")
    def zSql(b: String) = (0 until nf).map(j => s"$b.b$j * x$j").mkString(" + ")
    def sigSql(b: String) = s"ROUND(1.0 / (1.0 + exp(-(${zSql(b)}))), 9)"
    val i0 = (0 until nf).map(j => s"CAST(0.0 AS DOUBLE) AS b$j").mkString(", ")
    val chain = (1 to iters).flatMap { t =>
      val g = (0 until nf).map(j =>
        s"SUM(CAST(ROUND((y - ${sigSql("b")}) * x$j, 13) AS DECIMAL(38,13))) AS g$j")
        .mkString(", ")
      val upd = (0 until nf).map(j =>
        s"ROUND(b.b$j + $lr * (CAST(g.g$j AS DOUBLE) / g.n), 8) AS b$j").mkString(", ")
      Seq(
        s"g$t AS (SELECT count(*) AS n, $g FROM f CROSS JOIN i${t - 1} b)",
        s"i$t AS (SELECT $upd FROM g$t g CROSS JOIN i${t - 1} b)")
    }
    val rows = featureNames.zipWithIndex
      .map { case (nm, j) => s"SELECT '$nm' AS feature, b$j AS beta FROM i$iters" }
      .mkString(" UNION ALL ")
    s"""WITH f AS (SELECT CAST($labelSql AS DOUBLE) AS y, $featSel FROM $table),
       |i0 AS (SELECT $i0),
       |${chain.mkString(",\n")},
       |acc AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
       |  ROUND(AVG(CASE WHEN (CASE WHEN ${sigSql("b")} > 0.5 THEN 1.0 ELSE 0.0 END) = y
       |    THEN 1.0 ELSE 0.0 END), 4) AS train_acc
       |  FROM f CROSS JOIN i$iters b)
       |SELECT feature, beta, n_train, train_acc
       |FROM ($rows) CROSS JOIN acc ORDER BY feature""".stripMargin
  }
}
