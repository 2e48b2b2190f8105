package graft

import org.apache.spark.sql.functions._
import graft.gen.{CarCatalog, OrderGenerator}

class GeneratorSpec extends SparkSuite {
  import spark.implicits._

  test("generation is deterministic and partitioning-independent") {
    val a = OrderGenerator.rawOrders(spark, 500, seed = 7)
      .orderBy("txid").collect()
    val b = OrderGenerator.rawOrders(spark, 500, seed = 7)
      .repartition(13).orderBy("txid").collect()
    assert(a.toSeq === b.toSeq)
    val c = OrderGenerator.rawOrders(spark, 500, seed = 8)
      .orderBy("txid").collect()
    assert(a.toSeq !== c.toSeq)
  }

  test("generated shape matches the reference distributions") {
    val raw = OrderGenerator.rawOrders(spark, 5000, seed = 42).cache()
    val enriched = OrderGenerator.enrich(raw, CarCatalog.df(spark)).cache()
    assert(enriched.count() === 5000)
    // days uniform 1..7 → avg ≈ 4.0 (BASELINE.md)
    val avgDays = enriched.agg(avg("days")).as[Double].collect()(0)
    assert(avgDays > 3.8 && avgDays < 4.2, s"avgDays=$avgDays")
    // ~3/29 ≈ 10.3% UNKNOWN brand with horsepower 0 (BASELINE.md)
    val unk = enriched.filter($"brand" === "UNKNOWN")
    val unkFrac = unk.count().toDouble / 5000
    assert(unkFrac > 0.07 && unkFrac < 0.14, s"unkFrac=$unkFrac")
    assert(unk.agg(max("horsepower")).as[Long].collect()(0) === 0L)
    // txids unique; purchase_time within the trailing-2y window
    assert(enriched.select("txid").distinct().count() === 5000)
    val tsBounds = enriched.agg(
      min("purchase_time").cast("long"), max("purchase_time").cast("long"))
      .as[(Long, Long)].collect()(0)
    assert(tsBounds._2 * 1000L <= OrderGenerator.anchorMillis)
    assert(tsBounds._1 * 1000L >= OrderGenerator.anchorMillis - 2L * 366 * 24 * 3600 * 1000)
    // nullable PII: both present and absent values occur
    Seq("address", "phone", "email", "emergency_contact").foreach { c =>
      val nulls = enriched.filter(col(c).isNull).count()
      assert(nulls > 0 && nulls < 5000, s"$c nulls=$nulls")
    }
    raw.unpersist(); enriched.unpersist()
  }

  test("carDetails variant prices buy_price inside the U(0.80,0.95) band") {
    val raw = OrderGenerator.rawOrders(spark, 2000, seed = 42)
    val cat = CarCatalog.df(spark)
    val det = OrderGenerator.carDetails(OrderGenerator.enrich(raw, cat), cat)
      .join(cat.select($"name", $"prix_estime".as("px")),
        $"car_model" === $"name")
    val bad = det.filter($"buy_price" < $"px" * 0.80 - 1 ||
      $"buy_price" > $"px" * 0.95 + 1).count()
    assert(bad === 0)
    assert(det.select("txid").distinct().count() === det.count())
  }

  test("enrich plan broadcasts the catalog dim") {
    val plan = OrderGenerator.enrich(
      OrderGenerator.rawOrders(spark, 10), CarCatalog.df(spark))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
