package graft.ingest

import graft.operators.Caches.EagerOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2/S5 + P12: JSON-lines batch ingest.
  *
  * The reference pipes JSON-lines through a Python accumulator into
  * pandas→Arrow→Parquet→`COPY INTO` (batch_insert.py:43-73). In Spark the
  * whole chain is one declarative job: schema-checked JSON scan →
  * normalization projection → Parquet append; Catalyst parallelizes the
  * parse and the columnar write across executors (SURVEY.md §3.1).
  * Schemas are always explicit — never inferred — matching the
  * reference's declared DDL (commands.sql:32-48).
  */
object JsonBatchLoader {

  private val addressType = StructType(Seq(
    StructField("street_address", StringType), StructField("city", StringType),
    StructField("state", StringType), StructField("postalcode", StringType)))

  private val contactType = StructType(Seq(
    StructField("name", StringType), StructField("phone", StringType)))

  /** CLIENT_BUY_ORDERS wire schema (commands.sql:32-48). */
  val orderSchema: StructType = StructType(Seq(
    StructField("txid", StringType, nullable = false),
    StructField("rfid", StringType),
    StructField("car_model", StringType),
    StructField("brand", StringType),
    StructField("engine", StringType),
    StructField("horsepower", LongType),
    StructField("sell_price", LongType),
    StructField("purchase_time", TimestampType),
    StructField("days", LongType),
    StructField("name", StringType),
    StructField("address", addressType),
    StructField("phone", StringType),
    StructField("email", StringType),
    StructField("emergency_contact", contactType)))

  /** Read JSON-lines (gzip auto-detected — S2) with the declared schema.
    * `mode` FAILFAST ≡ ON_ERROR='ABORT_STATEMENT'; PERMISSIVE ≡ skip. */
  def readOrders(spark: SparkSession, path: String,
      mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(orderSchema).option("mode", mode).json(path)

  /** S3 `strip_outer_array` (A4:125-131, 208-214): each staged file is one
    * JSON array of records; multiLine mode explodes it to rows. */
  def readJsonArray(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** P12 normalization (batch_insert.py:76-95): default the non-PII
    * optionals, keep nullable PII as NULL. */
  def normalize(df: DataFrame): DataFrame = df
    .withColumn("brand", coalesce(col("brand"), lit("UNKNOWN")))
    .withColumn("engine", coalesce(col("engine"), lit("UNKNOWN")))
    .withColumn("horsepower", coalesce(col("horsepower"), lit(0L)))
    .withColumn("sell_price", coalesce(col("sell_price"), lit(0L)))
    .withColumn("days", coalesce(col("days"), lit(1L)))

  /** Quarantine ingest — ON_ERROR='CONTINUE' with an audit trail: parse
    * with PERMISSIVE + a corrupt-record column, load the clean rows into
    * the target, and write each bad line VERBATIM (plus its source file)
    * to a quarantine directory for replay after a fix. One scan serves
    * both sides; nothing is silently dropped — at ingest scale, "skip
    * bad rows" without a quarantine is data loss with extra steps.
    * Returns (goodRows, badRows). */
  def loadWithQuarantine(spark: SparkSession, inputPath: String,
      schema: StructType, targetDir: String, quarantineDir: String): (Long, Long) = {
    val corrupt = "_corrupt_record"
    val withCorrupt = StructType(schema.fields :+ StructField(corrupt, StringType))
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(inputPath)
      // Spark requires caching/materializing before filtering on the
      // corrupt column alone (the lazy parse would prune it away)
      .select(col("*"), input_file_name().as("_source_file"))
      .eagerCheckpoint()
    val good = parsed.filter(col(corrupt).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = parsed.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_record"), col("_source_file").as("source_file"))
    // both counts from ONE aggregation over the checkpoint — the writes
    // below are then the only other jobs on the ingest hot path
    val counts = parsed.agg(count(lit(1)).as("total"),
      count(col(corrupt)).as("bad")).collect()(0)
    val badCount = counts.getLong(1)
    good.write.mode("append").parquet(targetDir)
    if (badCount > 0) bad.write.mode("append").parquet(quarantineDir)
    (counts.getLong(0) - badCount, badCount)
  }

  /** S5 `COPY INTO … MATCH_BY_COLUMN_NAME` (batch_insert.py:71-73):
    * by-name column mapping into the target's layout, then Parquet
    * append. Returns the rows loaded BY THIS CALL (observed on the
    * write itself — no second scan, and no miscounting pre-existing
    * target rows on append). */
  def load(spark: SparkSession, inputPath: String, targetDir: String): Long = {
    val df = normalize(readOrders(spark, inputPath))
      .select(orderSchema.fieldNames.map(col).toSeq: _*) // by-name mapping
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("n")).write.mode("append").parquet(targetDir)
    obs.get("n").asInstanceOf[Long]
  }
}
