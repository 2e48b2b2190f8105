package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Assets travel as opaque `binary` columns plus a typed metadata struct —
  * the pattern that scales: bytes stay columnar in parquet, metadata is
  * prunable, and heavy decode runs per-partition so one task amortizes
  * decoder setup over its whole split.
  *
  * The decoders themselves are STUBS (this container has no image/audio
  * libraries): [[decodeFeatures]] derives a deterministic fake feature
  * vector from the bytes. The Spark-side plumbing — schema, partitioning,
  * per-partition batch shape, frame sampling — is real and tested; swap
  * `stubFeature` for a JNI/ONNX call and nothing else changes.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_s", DoubleType),
    StructField("codec", StringType)))

  val assetType: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("data", BinaryType),
    StructField("meta", metaType)))

  /** Synthesize an asset table from any (id, text) table — deterministic
    * fake payloads so the pipeline is testable without real media. */
  def syntheticAssets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("data"),
      struct(
        (pmod(col(idCol), lit(64)) * 16 + 64).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) * 16 + 64).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        round(pmod(col(idCol), lit(300)) / lit(10.0), 1).as("duration_s"),
        element_at(array(lit("png"), lit("opus"), lit("h264")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("codec")).as("meta"))

  /** STUB decode: bytes → fixed-width feature vector. Stands in for an
    * image decode + CNN embed; deterministic (rolling polynomial hash per
    * stripe) so tests can assert exact values. */
  private def stubFeature(bytes: Array[Byte], dims: Int): Array[Float] = {
    val acc = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      val d = i % dims
      acc(d) = acc(d) * 31 + (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000003L).toFloat / 1000003f)
  }

  /** Per-partition decode/feature-extract. mapPartitions (not per-row) is
    * the load-bearing choice: real decoders pay per-task init (model
    * load, codec context) once per split. */
  def decodeFeatures(assets: DataFrame, dims: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("byte_len", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType))))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val kindIdx = assets.schema.fieldIndex("kind")
    val dataIdx = assets.schema.fieldIndex("data")
    val rdd = assets.rdd.mapPartitions { rows =>
      // decoder/context init would happen here, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](dataIdx)
        Row(r.getLong(idIdx), r.getString(kindIdx),
          bytes.length.toLong, stubFeature(bytes, dims).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling STUB: slice the byte payload into n equal "frames"
    * (stands in for video frame extraction); emits one row per frame with
    * the frame index — the explode shape a real sampler produces. */
  def sampleFrames(assets: DataFrame, nFrames: Int): DataFrame =
    assets
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_bytes",
        expr(s"substring(data, frame_idx * (octet_length(data) div $nFrames) + 1, " +
          s"octet_length(data) div $nFrames)"))
      .select(col("asset_id"), col("frame_idx"),
        octet_length(col("frame_bytes")).cast("long").as("frame_len"))
}
