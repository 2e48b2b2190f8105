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

  test("golden: seeded 100k run reproduces BASELINE.md's aggregate shapes exactly") {
    // The reference's de-facto expected outputs are the assignment5
    // screenshot aggregates over a 100,000-row load (BASELINE.md "Golden
    // analytics values"). Exact equality is asserted against OUR seeded
    // run (seed=42); the reference values anchor the SHAPES: ~10.2%
    // UNKNOWN, avg days ≈ 4.0, avg HP in the few-hundreds, near-uniform
    // state spread, unique customers a large fraction of total.
    val enriched = OrderGenerator.enrich(
      OrderGenerator.rawOrders(spark, 100000, seed = 42L),
      CarCatalog.df(spark)).cache()
    try {
      assert(enriched.count() === 100000L) // reference: Total orders 100,000
      val (hp, days) = enriched
        .agg(round(avg("horsepower"), 4), round(avg("days"), 4))
        .as[(Double, Double)].collect()(0)
      assert(hp === 215.3874, s"avg hp=$hp") // reference shape: 227.7
      assert(days === 3.998, s"avg days=$days") // reference shape: 4.0
      // unique customers (distinct EMAIL) — reference shape: 46,082/100k
      assert(enriched.filter($"email".isNotNull).select("email")
        .distinct().count() === 68365L)
      // UNKNOWN brand — reference shape: 10,249 ≈ 10.2%
      assert(enriched.filter($"brand" === "UNKNOWN").count() === 10276L)
      // orders by brand with per-brand avg HP (reference: analytics1/
      // monitoring2 table; UNKNOWN rows average exactly 0)
      val brands = enriched.groupBy("brand")
        .agg(count(lit(1)).as("n"), round(avg("horsepower"), 4).as("ahp"))
        .orderBy(desc("n")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(brands === Seq(
        ("Harrier", 10507L, 273.028), ("Glacier", 10502L, 248.2056),
        ("Aster", 10455L, 206.0904), ("Dray", 10454L, 282.8448),
        ("Cinder", 10402L, 256.4512), ("Boreal", 10394L, 231.7741),
        ("UNKNOWN", 10276L, 0.0), ("Flux", 10133L, 222.3152),
        ("Ember", 10068L, 197.4618), ("Ion", 6809L, 240.0367)))
      // orders by engine (reference: analytics4 — Electric dominant,
      // UNKNOWN mirrors the missing-catalog rows)
      val engines = enriched.groupBy("engine").agg(count(lit(1)).as("n"))
        .orderBy(desc("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(engines === Seq(("Electric", 37465L), ("Petrol", 20909L),
        ("Hybrid", 20896L), ("Diesel", 10454L), ("UNKNOWN", 10276L)))
      // top models (reference: monitoring2 top-5 ≈ 3.5k each)
      val models = enriched.groupBy("car_model").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("car_model")).limit(3).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(models === Seq(("Dray M13", 3552L), ("Harrier M17", 3539L),
        ("Aster M1", 3518L)))
      // regional spread: all 50 states, near-uniform (reference:
      // analytics2 — ~850-906/state; ours ~1.4k/state at 70% non-null)
      val (nStates, mn, mx) = enriched.filter($"address".isNotNull)
        .groupBy($"address.state").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), min("n"), max("n"))
        .as[(Long, Long, Long)].collect()(0)
      assert((nStates, mn, mx) === ((50L, 1302L, 1482L)))
    } finally enriched.unpersist()
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
