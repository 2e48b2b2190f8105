package graft

import org.apache.spark.sql.functions._
import graft.gen.{CarCatalog, OrderGenerator}
import graft.query.Explorer

/** Golden-output test (SURVEY.md §5): the reference freezes its expected
  * analytics in the assignment5 screenshots on a 100k-row load
  * (BASELINE.md). Our generator is seeded, so the same aggregates are
  * EXACTLY reproducible — these values were frozen from the first run of
  * seed=42 and must never drift (any change to generator logic that
  * moves them is a breaking change to the data contract). Re-frozen
  * once, deliberately: the per-row RNG widened from java.util.Random's
  * 48-bit state to SplittableRandom's full 64 bits (duplicate-row
  * collisions at 10⁸+ rows — see OrderGenerator.rowRng), which moved
  * every drawn value.
  */
class GoldenSpec extends SparkSuite {

  private lazy val flat = Explorer.flatten(
    OrderGenerator.enrich(
      OrderGenerator.rawOrders(spark, 100000, seed = 42),
      CarCatalog.df(spark))).cache()

  test("monitoring tiles on the 100k golden load") {
    val t = Explorer.metricTiles(flat).collect()(0)
    assert(t.getAs[Long]("TOTAL_ORDERS") === 100000L)
    assert(t.getAs[Double]("AVG_HORSEPOWER") === 215.3874)
    assert(t.getAs[Double]("AVG_DAYS") === 3.998)
    assert(t.getAs[Long]("UNIQUE_CUSTOMERS") === 68365L)
  }

  test("orders by brand on the 100k golden load") {
    val rows = Explorer.ordersBySegment(flat, "BRAND", 10).collect()
      .map(r => (r.getString(0), r.getAs[Long]("ORDERS"),
        r.getAs[Double]("AVG_HP")))
    assert(rows.head === (("Harrier", 10507L, 273.028)))
    // the UNKNOWN tier: models absent from the catalog, horsepower 0
    // (the reference's ~10% UNKNOWN shape, BASELINE.md)
    assert(rows.contains(("UNKNOWN", 10276L, 0.0)))
    assert(rows.map(_._2).sum === 100000L)
  }

  test("regional spread is near-uniform with nullable addresses") {
    val byState = flat.filter(col("STATE").isNotNull)
      .groupBy("STATE").count()
    assert(byState.count() === 50)
    val mx = byState.agg(max("count")).collect()(0).getLong(0)
    val mn = byState.agg(min("count")).collect()(0).getLong(0)
    assert(mx === 1482L)
    assert(mn > 1250L && mx < 1550L) // near-uniform across states
  }
}
