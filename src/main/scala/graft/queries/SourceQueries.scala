package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{CarCatalog, OrderGenerator}

/** S13 generator surface as declared queries (rows-only: the seeded
  * distributed generator has no DuckDB twin; GeneratorSpec asserts its
  * determinism and distribution shape instead).
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

  val oracles: Map[String, String] = Map.empty
}
