package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter state of the interactive analytics surface — one field per
  * widget of the reference app (streamlit_buy_orders_app.py:72-112).
  * Every field is optional; absent ⇒ no predicate, exactly like the app's
  * dynamically-composed filter chain. */
case class OrderFilters(
    brands: Seq[String] = Seq.empty,                  // P6 multiselect
    engines: Seq[String] = Seq.empty,                 // P6
    hpRange: Option[(Long, Long)] = None,             // P5 slider
    dateRange: Option[(String, String)] = None,       // P7 date pickers
    search: Option[String] = None,                    // P8 text search
    states: Seq[String] = Seq.empty)                  // P6 on address.state

/** The assignment5 analytics surface (SURVEY.md §3.3): flattening
  * projection, dynamic filter chain, metric tiles, segment top-k,
  * filter-widget metadata queries, bounded previews, CSV export — the
  * untyped, runtime-composed `DataFrame` tier of the engine
  * (streamlit_buy_orders_app.py throughout).
  */
object Explorer {

  /** P2: flatten the nested PII structs with the app's aliases
    * (streamlit_buy_orders_app.py:24-46). */
  def flatten(orders: DataFrame): DataFrame =
    orders.select(
      col("txid").as("TXID"), col("rfid").as("RFID"),
      col("car_model").as("CAR_MODEL"), col("brand").as("BRAND"),
      col("engine").as("ENGINE"), col("horsepower").as("HORSEPOWER"),
      col("sell_price").as("SELL_PRICE"),
      col("purchase_time").as("PURCHASE_TIME"), col("days").as("DAYS"),
      col("name").as("NAME"),
      col("address.street_address").as("STREET_ADDRESS"),
      col("address.city").as("CITY"),
      col("address.state").as("STATE"),
      col("address.postalcode").as("POSTALCODE"),
      col("phone").as("PHONE"), col("email").as("EMAIL"),
      col("emergency_contact.name").as("EMERGENCY_NAME"),
      col("emergency_contact.phone").as("EMERGENCY_PHONE"))

  /** P4-P8: compose the active widget predicates into one filter chain
    * (streamlit_buy_orders_app.py:72-112). Catalyst conjoins and pushes
    * them to the scan — runtime composition costs nothing at plan time. */
  def applyFilters(flat: DataFrame, f: OrderFilters): DataFrame = {
    var df = flat
    if (f.brands.nonEmpty) df = df.filter(col("BRAND").isin(f.brands: _*))
    if (f.engines.nonEmpty) df = df.filter(col("ENGINE").isin(f.engines: _*))
    f.hpRange.foreach { case (lo, hi) =>
      df = df.filter(col("HORSEPOWER").between(lo, hi)) }
    f.dateRange.foreach { case (start, end) =>
      df = df.filter(
        col("PURCHASE_TIME") >= to_timestamp(lit(start)) &&
        col("PURCHASE_TIME") < to_timestamp(lit(end)) + expr("INTERVAL 1 DAY")) }
    f.search.foreach { q =>
      val needle = lit(q.toLowerCase)
      df = df.filter(Seq("NAME", "EMAIL", "PHONE", "RFID")
        .map(c => lower(col(c)).contains(needle))
        .reduce(_ || _)) }
    if (f.states.nonEmpty)
      df = df.filter(col("STATE").isNotNull && col("STATE").isin(f.states: _*))
    df
  }

  /** A1/A5/A6: the Monitoring page's metric tiles in ONE aggregation pass
    * (streamlit_buy_orders_app.py:129-135 issues four queries; one scan
    * suffices). */
  def metricTiles(flat: DataFrame): DataFrame =
    flat.agg(
      count(lit(1)).as("TOTAL_ORDERS"),
      round(avg("HORSEPOWER"), 4).as("AVG_HORSEPOWER"),
      round(avg("DAYS"), 4).as("AVG_DAYS"),
      countDistinct(col("EMAIL")).as("UNIQUE_CUSTOMERS"))

  /** A2/O4: orders per segment, top-k (streamlit:146-163, 217-237). */
  def ordersBySegment(flat: DataFrame, segCol: String, k: Int): DataFrame =
    flat.groupBy(segCol)
      .agg(count(lit(1)).as("ORDERS"),
        round(avg("HORSEPOWER"), 4).as("AVG_HP"),
        round(avg("DAYS"), 4).as("AVG_DAYS"))
      .orderBy(col("ORDERS").desc, col(segCol))
      .limit(k)

  /** A7: filter-widget metadata — distinct values, ordered, capped
    * (streamlit:50-59). */
  def distinctValues(flat: DataFrame, c: String, limit: Int = 200): DataFrame =
    flat.select(c).where(col(c).isNotNull).distinct().orderBy(c).limit(limit)

  /** A5: filter-bounds discovery for sliders (streamlit:62-69). */
  def bounds(flat: DataFrame, c: String): DataFrame =
    flat.agg(min(c).as("MIN"), max(c).as("MAX"))

  /** P11+O5: user-chosen column subset, bounded preview
    * (streamlit:322-338; 10k row cap). */
  def preview(flat: DataFrame, cols: Seq[String], limitRows: Int): DataFrame =
    flat.select(cols.map(col): _*).limit(math.min(limitRows, 10000))

  /** S11: CSV export of a preview (streamlit:344-350). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
