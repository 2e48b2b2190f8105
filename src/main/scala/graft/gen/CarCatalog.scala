package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Car-spec dimension row (shape of car_descriptions.json:3-16 — name,
  * brand, engine, horsepower, autonomy, nested consumption, type, price,
  * release year; values are our own synthetic catalog). */
case class CarSpec(
    name: String, brand: String, engine: String, horsepower: Long,
    autonomy: Long, consumption_l_100km: Double,
    consumption_kwh_100km: Long, car_type: String, prix_estime: Long,
    release_date: Long)

/** The 29-entry car catalog (car_descriptions.json): a broadcast-class
  * dimension. The generator's inventory deliberately contains models the
  * catalog lacks, reproducing the reference's ~10% UNKNOWN-brand rows
  * (data_generator.py:34-37; BASELINE.md golden values).
  */
object CarCatalog {

  private val brandDefs = Seq(
    ("Aster", "Electric"), ("Boreal", "Hybrid"), ("Cinder", "Petrol"),
    ("Dray", "Diesel"), ("Ember", "Electric"), ("Flux", "Electric"),
    ("Glacier", "Hybrid"), ("Harrier", "Petrol"), ("Ion", "Electric"))

  val specs: Seq[CarSpec] = (0 until 29).map { i =>
    val (brand, engine) = brandDefs(i % brandDefs.length)
    CarSpec(
      name = s"$brand M${i + 1}",
      brand = brand,
      engine = engine,
      horsepower = 90L + 25L * (i % 13),
      autonomy = 300L + 40L * (i % 11),
      consumption_l_100km =
        if (engine == "Electric") 0.0 else 4.5 + 0.3 * (i % 8),
      consumption_kwh_100km = if (engine == "Electric") 14L + (i % 6) else 0L,
      car_type = Seq("citadine", "berline", "SUV", "compacte")(i % 4),
      prix_estime = 18000L + 2500L * (i % 15),
      release_date = 2015L + (i % 10))
  }

  /** Order-inventory model names (data_generator.py:13-22): 26 models the
    * catalog knows + 3 it doesn't → ~10.3% of orders join to no catalog
    * row, the reference's UNKNOWN fraction. */
  val inventory: IndexedSeq[String] =
    (specs.take(26).map(_.name) ++ Seq("Nimbus N1", "Quasar Q5", "Zephyr Z9"))
      .toIndexedSeq

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(specs).toDF()
  }
}
