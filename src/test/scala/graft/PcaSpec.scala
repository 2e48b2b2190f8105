package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.DecVecSumAgg
import graft.operators.Pca

class PcaSpec extends SparkSuite {
  import spark.implicits._

  private val dec = DecimalType(38, 6)

  test("DecVecSumAgg equals the explode+groupBy decimal sum, nulls included") {
    val rnd = new scala.util.Random(7)
    val dim = 5
    val data = Seq.fill(400)(Seq.fill(dim)(rnd.nextDouble() * 20 - 10))
    // element 2 all-null (SUM over empty → null); others null ~20% of rows
    val terms = transform(col("v"),
      (x, i) => when(i === 2 || x < -6.0, lit(null))
        .otherwise(round(x * lit(3.7), 6)).cast(dec))
    val df = data.toDF("v").repartition(7).select(terms.as("t"))

    val native = df.agg(DecVecSumAgg.decVecSum(col("t"), dim).as("s"))
      .select(explode(col("s"))).collect().map(r => Option(r.getDecimal(0)))
    val twin = df.select(posexplode(col("t")).as(Seq("i", "x")))
      .groupBy("i").agg(sum(col("x")).as("s")).orderBy("i")
      .collect().map(r => Option(r.getDecimal(1)))
    assert(native.length === dim)
    assert(native.toSeq === twin.toSeq)
    assert(native(2).isEmpty, "all-null lane must eval to null like SUM")
  }

  test("DecVecSumAgg rejects a non-decimal child at analysis time") {
    val e = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("v")
        .agg(DecVecSumAgg.decVecSum(col("v"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"),
      s"expected a type error, got: ${e.getMessage}")
  }

  /** Pure-Scala twin of the documented arithmetic: ROUND(·,6) per term,
    * exact DECIMAL(38,6) sums, left-associated double folds. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def decSum(ts: Seq[Double]): Double =
    ts.map(t => new JBD(java.lang.Double.toString(r6(t))).setScale(6, RoundingMode.HALF_UP))
      .foldLeft(JBD.ZERO)(_.add(_)).doubleValue()

  test("topComponent matches an exact driver-side reference at dim 4") {
    val rnd = new scala.util.Random(42)
    val dim = 4
    val rows = Seq.fill(60)(Seq.fill(dim)(rnd.nextGaussian() +
      (if (rnd.nextBoolean()) 2.0 else -2.0)))
    val xq = rows.map(_.map(r6))
    val n = xq.size.toDouble
    val sx = (0 until dim).map(i => decSum(xq.map(_(i))))
    val sxx = (0 until dim).map(i => decSum(xq.map(v => v(i) * v(i))))
    val m = sx.map(_ / n)
    val vtot = (0 until dim).foldLeft(0.0)((a, i) =>
      a + (sxx(i) / n - (sx(i) / n) * (sx(i) / n)))
    val v0 = 1.0 / math.sqrt(dim.toDouble)
    val dot0 = xq.map(v =>
      (0 until dim).foldLeft(0.0)((a, i) => a + (v(i) - m(i))) * v0)
    val s1 = (0 until dim).map(i =>
      decSum(xq.zip(dot0).map { case (v, d) => (v(i) - m(i)) * d }))
    val norm1 = math.sqrt(s1.foldLeft(0.0)((a, s) => a + s * s))
    val v1 = s1.map(_ / norm1)
    val dot1 = xq.map(v =>
      (0 until dim).foldLeft(0.0)((a, i) => a + (v(i) - m(i)) * v1(i)))
    val s2 = (0 until dim).map(i =>
      decSum(xq.zip(dot1).map { case (v, d) => (v(i) - m(i)) * d }))
    val r2 = decSum(dot1.map(d => d * d))
    val norm2 = math.sqrt(s2.foldLeft(0.0)((a, s) => a + s * s))
    val expected = (1 to dim).map(i => (i.toLong, r6(s2(i - 1) / norm2),
      r6(r2 / n), r6((r2 / n) / vtot)))

    val got = Pca.topComponent(rows.toDF("embedding"), "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("dim-768 vectors run on the same three-stage plan") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(150)(Seq.fill(768)(rnd.nextGaussian())).toDF("embedding")
    val out = Pca.topComponent(df, "embedding", 768).collect()
    assert(out.length === 768)
    val norm = math.sqrt(out.map(_.getDouble(1)).map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loadings norm $norm")
    assert(out.map(_.getDouble(3)).forall(v => v > 0 && v <= 1.0))
  }

  test("null and ragged vectors fail fast instead of skewing n") {
    val df = spark.range(10).select(
      when(col("id") === 7, lit(null))
        .otherwise(array(col("id").cast("double"),
          (col("id") * 2).cast("double"))).as("embedding"))
    val e = intercept[Exception] {
      Pca.topComponent(df, "embedding", 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("non-2-dim")))
  }
}
