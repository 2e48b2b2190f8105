package graft

import org.apache.spark.sql.functions._

import graft.operators.Projection

class ProjectionSpec extends SparkSuite {
  import spark.implicits._

  test("basis vector projects to its own sign column, scaled") {
    // x = 2.5 * e_3 (dimIn 8): p_j = sign(3, j) * 2.5 / sqrt(4)
    val df = Seq((1L, Array.tabulate(8)(i => if (i == 2) 2.5f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Projection.randProject(df, "vec_id", "embedding", 8, 4)
      .orderBy("component").collect()
    assert(out.length === 4)
    (1 to 4).foreach { j =>
      val exp = BigDecimal(Projection.sign("rp", 3, j) * 2.5 / math.sqrt(4.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(j - 1).getDouble(2) === exp)
    }
  }

  test("projection is shuffle-free") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = Projection.randProject(e, "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("JL property: projected distances approximate original distances") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 40)
    val p = Projection.randProject(e, "vec_id", "embedding", 64, 16)
    val orig = e.select(col("vec_id"),
      sqrt(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, b) => a + b)).as("n0"))
    val proj = p.groupBy(col("id").as("vec_id"))
      .agg(sqrt(sum(col("val") * col("val"))).as("n1"))
    val ratios = orig.join(proj, "vec_id")
      .select((col("n1") / col("n0")).as("r")).collect().map(_.getDouble(0))
    // E[‖Px‖/‖x‖] = 1; with dimOut 16 the spread is wide but bounded
    assert(ratios.forall(r => r > 0.3 && r < 2.5),
      s"ratios out of JL band: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.75 && mean < 1.25, s"mean ratio $mean")
  }

  test("sign matrix is deterministic and tag-sensitive") {
    val a = (1 to 8).map(i => Projection.sign("rp", i, 1))
    assert(a === (1 to 8).map(i => Projection.sign("rp", i, 1)))
    assert(a.exists(_ == 1) || a.exists(_ == -1))
    val b = (1 to 64).flatMap(i => (1 to 16).map(j => Projection.sign("alt", i, j)))
    val c = (1 to 64).flatMap(i => (1 to 16).map(j => Projection.sign("rp", i, j)))
    assert(b !== c)
  }
}
