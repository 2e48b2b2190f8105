package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Nested optional PII shapes (commands.sql:43,46,71-72). */
case class Address(street_address: String, city: String, state: String,
    postalcode: String)
case class EmergencyContact(name: String, phone: String)

/** Raw generated order event, pre-enrichment (data_generator.py:38-54
  * minus the catalog-joined fields — those come from the broadcast join
  * in [[OrderGenerator.enrich]], the Spark-first form of the reference's
  * generation-time lookup, SURVEY.md J3). */
case class RawOrder(
    txid: String, rfid: String, car_model: String,
    purchase_time: Timestamp, days: Long, name: String,
    address: Option[Address], phone: Option[String], email: Option[String],
    emergency_contact: Option[EmergencyContact])

/** S13: deterministic distributed order generator.
  *
  * Unlike the reference's unseeded Faker generators (SURVEY.md §7.4.5),
  * every row is a pure function of (seed, row id): `spark.range(n)` gives
  * ids, and a per-row splitmix-style RNG makes output independent of
  * partitioning — the same seed yields byte-identical data on 1 or 1000
  * executors. At 100 TB scale generation is embarrassingly parallel with
  * zero shuffle.
  */
object OrderGenerator {

  private val firstNames = IndexedSeq("Ada", "Blaise", "Carl", "Dana",
    "Edsger", "Fran", "Grace", "Haskell", "Ida", "John", "Kathleen", "Lin")
  private val lastNames = IndexedSeq("Archer", "Boole", "Curry", "Dijkstra",
    "Euler", "Floyd", "Gauss", "Hopper", "Iverson", "Jones", "Knuth", "Lamport")
  private val cities = IndexedSeq("Springfield", "Riverton", "Fairview",
    "Kingston", "Salem", "Georgetown", "Clinton", "Arlington")
  private val states = IndexedSeq("AL", "AK", "AZ", "AR", "CA", "CO", "CT",
    "DE", "FL", "GA", "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME",
    "MD", "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ", "NM",
    "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC", "SD", "TN", "TX",
    "UT", "VT", "VA", "WA", "WV", "WI", "WY")
  private val streets = IndexedSeq("Oak", "Maple", "Cedar", "Elm", "Pine",
    "Walnut", "Chestnut", "Willow")

  /** Anchor instant (UTC) replacing the reference's `utcnow()` so output
    * is clock-free (data_generator.py:45; SURVEY.md §7.4.5). */
  val anchorMillis: Long = Timestamp.valueOf("2025-10-01 00:00:00").getTime
  private val twoYearsMillis: Long = 2L * 365 * 24 * 3600 * 1000

  /** Per-row RNG with FULL 64-bit stream identity. The mix
    * `byteswap64(seed ^ id·φ)` is a bijection in `id` for a fixed seed
    * (odd multiplier, xor, byteswap — all invertible), so every row gets
    * a distinct generator state and byte-identical duplicate rows are
    * impossible at ANY n. java.util.Random here would quietly truncate
    * the state to 48 bits ((seed ^ 0x5DEECE66D) & 2^48−1): two ids
    * agreeing in the low 48 mixed bits would emit identical rows —
    * txid included — with ~n²/2^49 expected collisions (≈17 duplicate
    * txid pairs at 10⁸ rows), breaking the generator's uniqueness
    * contract exactly at the scale it advertises. */
  private def rowRng(seed: Long, id: Long): java.util.SplittableRandom =
    new java.util.SplittableRandom(
      scala.util.hashing.byteswap64(seed ^ (id * 0x9E3779B97F4A7C15L)))

  /** Deterministic raw orders: one row per id in [0, n). */
  def rawOrders(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[RawOrder] = {
    import spark.implicits._
    val inv = CarCatalog.inventory
    spark.range(n).map { id =>
      val r = rowRng(seed, id)
      def opt[T](v: => T): Option[T] =
        if (r.nextDouble() < 0.3) None else Some(v)
      val first = firstNames(r.nextInt(firstNames.length))
      val last = lastNames(r.nextInt(lastNames.length))
      val ts = new Timestamp(anchorMillis - (r.nextDouble() * twoYearsMillis).toLong)
      RawOrder(
        txid = new java.util.UUID(r.nextLong(), r.nextLong()).toString,
        rfid = f"${r.nextLong()}%016x${r.nextInt() & 0xFFFFFFFFL}%08x",
        car_model = inv(r.nextInt(inv.length)),
        purchase_time = ts,
        days = 1L + r.nextInt(7),
        name = s"$first $last",
        address = opt(Address(
          s"${1 + r.nextInt(9999)} ${streets(r.nextInt(streets.length))} St",
          cities(r.nextInt(cities.length)),
          states(r.nextInt(states.length)),
          f"${10000 + r.nextInt(89999)}%05d")),
        phone = opt(f"+1-${200 + r.nextInt(799)}%03d-${r.nextInt(999)}%03d-${r.nextInt(9999)}%04d"),
        email = opt(s"${first.toLowerCase}.${last.toLowerCase}.${r.nextInt(10000)}@example.com"),
        emergency_contact = opt(EmergencyContact(
          s"${firstNames(r.nextInt(firstNames.length))} $last",
          f"+1-${200 + r.nextInt(799)}%03d-${r.nextInt(999)}%03d-${r.nextInt(9999)}%04d")))
    }
  }

  /** J3: enrich raw orders with catalog fields via a broadcast-hash join —
    * the 29-row dim never shuffles the fact side. Models missing from the
    * catalog surface as UNKNOWN/0, the reference's golden data shape
    * (BASELINE.md: "UNKNOWN 10,249 ≈ 10.2%"). */
  def enrich(orders: Dataset[RawOrder], catalog: DataFrame): DataFrame =
    orders.toDF().join(broadcast(catalog),
        orders("car_model") === catalog("name"), "left")
      .select(
        col("txid"), col("rfid"), col("car_model"),
        coalesce(col("brand"), lit("UNKNOWN")).as("brand"),
        coalesce(col("engine"), lit("UNKNOWN")).as("engine"),
        coalesce(col("horsepower"), lit(0L)).as("horsepower"),
        coalesce(col("prix_estime"), lit(0L)).as("sell_price"),
        col("purchase_time"), col("days"), orders("name"),
        col("address"), col("phone"), col("email"), col("emergency_contact"))

  /** S13b: the car-details event variant (data_generator_car_details.py:
    * 28-29, 50-60): buy_price = prix_estime × U(0.80, 0.95), with the
    * uniform drawn hash-deterministically from txid so the variant stays
    * a pure column expression (no second RNG pass). */
  def carDetails(enriched: DataFrame, catalog: DataFrame): DataFrame = {
    val u = (pmod(xxhash64(col("txid")), lit(10000L)).cast("double") / 10000.0)
    enriched.filter(col("brand") =!= "UNKNOWN")
      .join(broadcast(catalog.select(col("name").as("cat_model"),
        col("car_type"), col("autonomy"), col("consumption_l_100km"),
        col("consumption_kwh_100km"), col("prix_estime"), col("release_date"))),
        col("car_model") === col("cat_model"), "inner")
      .select(col("txid"), col("car_model"), col("brand"), col("engine"),
        col("horsepower"),
        round(col("prix_estime") * (lit(0.80) + lit(0.15) * u), 0)
          .cast("long").as("buy_price"),
        col("car_type"), col("autonomy"), col("consumption_l_100km"),
        col("consumption_kwh_100km"), col("release_date"))
  }
}
