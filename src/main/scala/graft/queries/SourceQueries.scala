package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{CarCatalog, OrderGenerator}

/** S13 generator surface as declared queries. DuckDB cannot replay the
  * distributed splitmix generator itself, but the generator is SEEDED —
  * both aggregates are constants — so the oracles below pin the exact
  * rows as VALUES tables (GeneratorSpec asserts the same determinism
  * and the distribution shape).
  */
object SourceQueries {

  /** S13+J3: orders-by-brand over the seeded generator — the reference's
    * signature analytics query on its own generated data
    * (commands.sql:112-115 on data_generator.py output). */
  def s01GenOrders(s: SparkSession, dir: String): DataFrame =
    OrderGenerator.enrich(
        OrderGenerator.rawOrders(s, 2000, seed = 42), CarCatalog.df(s))
      .groupBy("brand").agg(count(lit(1)).as("n_orders"),
        round(avg("horsepower"), 4).as("avg_hp"))
      .orderBy(col("n_orders").desc, col("brand"))

  /** S13b: the car-details event variant with its margin-bearing
    * buy_price (data_generator_car_details.py:28-29). */
  def s02CarDetails(s: SparkSession, dir: String): DataFrame =
    OrderGenerator.carDetails(
        OrderGenerator.enrich(
          OrderGenerator.rawOrders(s, 2000, seed = 42), CarCatalog.df(s)),
        CarCatalog.df(s))
      .groupBy("brand").agg(count(lit(1)).as("n"),
        round(avg("buy_price"), 4).as("avg_buy_price"))
      .orderBy(col("n").desc, col("brand"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_gen_orders" -> s01GenOrders,
    "s02_car_details" -> s02CarDetails,
  )

  /** The generator is seeded and dir-independent, so both aggregates
    * are CONSTANTS — the oracle states the pinned rows as a VALUES
    * table (GeneratorSpec pins the same determinism), and the hash
    * gate catches any drift in the splitmix chain, the catalog, or
    * the enrich join. Floats CAST to DOUBLE so the comparator's
    * stringified values match the Spark dump (a bare VALUES decimal
    * would stringify with trailing zeros). */
  val oracles: Map[String, String] = Map(
    "s01_gen_orders" ->
      """SELECT brand, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(avg_hp AS DOUBLE) AS avg_hp
        |FROM (VALUES
        |  ('Harrier', 225, 275.4444), ('Ember', 217, 197.7189),
        |  ('Dray', 216, 285.4861), ('Flux', 204, 214.7549),
        |  ('Cinder', 203, 272.8818), ('UNKNOWN', 201, 0.0),
        |  ('Boreal', 199, 234.3467), ('Glacier', 194, 255.0773),
        |  ('Aster', 193, 205.6736), ('Ion', 148, 241.3514))
        |  AS t(brand, n_orders, avg_hp)
        |ORDER BY n_orders DESC, brand""".stripMargin,
    "s02_car_details" ->
      """SELECT brand, CAST(n AS BIGINT) AS n,
        |  CAST(avg_buy_price AS DOUBLE) AS avg_buy_price
        |FROM (VALUES
        |  ('Harrier', 225, 29118.8222), ('Ember', 217, 33226.8664),
        |  ('Dray', 216, 31341.5694), ('Flux', 204, 36312.9706),
        |  ('Cinder', 203, 30063.7192), ('Boreal', 199, 26881.9698),
        |  ('Glacier', 194, 27523.8144), ('Aster', 193, 24277.1503),
        |  ('Ion', 148, 26865.7297))
        |  AS t(brand, n, avg_buy_price)
        |ORDER BY n DESC, brand""".stripMargin,
  )
}
