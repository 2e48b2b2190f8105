package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** A trivially different codec: xor-fold per stripe. The @transient
  * ready flag is false on every deserialized task-side copy, so a
  * decode reached without init() throws — proving the operators call
  * init() once per partition BEFORE the first row, exactly where a
  * real decoder loads its model/codec context. Top-level (NOT nested in
  * the suite): a real codec is a standalone class too, and a nested one
  * would drag the unserializable suite into the task closure. */
class InitGatedXorCodec extends Multimodal.AssetCodec {
  @transient private var ready = false
  override def init(): Unit = { ready = true }
  def accumulators(bytes: Array[Byte], dims: Int): Array[Long] = {
    require(ready, "decode reached before init() — per-task setup broken")
    val acc = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) { acc(i % dims) ^= (bytes(i) & 0xffL); i += 1 }
    acc
  }
}

/** The pluggable decode seam (Multimodal.AssetCodec): a second codec
  * must run the full decode/fingerprint/pair shapes without touching
  * the operators, and the per-partition init() contract must hold —
  * the properties a real JPEG/ffmpeg decoder drop-in relies on. */
class MultimodalCodecSpec extends SparkSuite {
  import spark.implicits._

  private def assets = Multimodal.syntheticAssets(
    Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"), (3L, "zeta"),
      (4L, "alpha beta"), (5L, "")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("decodeFeatures runs unchanged under a second codec (m02 shape)") {
    val out = Multimodal.decodeFeatures(assets, dims = 8,
      codec = new InitGatedXorCodec)
    assert(out.schema.fieldNames.toSeq ===
      Seq("asset_id", "kind", "byte_len", "feature", "feat_checksum"))
    val rows = out.orderBy("asset_id").collect()
    assert(rows.length === 5)
    // identical payloads decode identically; the codec is genuinely live
    // (xor of "alpha beta" differs from the stub's modular fold)
    val byId = rows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(byId(1L) === byId(4L))
    val stub = Multimodal.decodeFeatures(assets, dims = 8)
      .orderBy("asset_id").collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(byId(1L) !== stub(1L), "second codec must not replay the stub")
    // determinism across runs
    val again = Multimodal.decodeFeatures(assets, dims = 8,
      codec = new InitGatedXorCodec).orderBy("asset_id").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(again === byId)
  }

  test("null payloads decode as zero-byte assets under any codec") {
    val withNull = assets.withColumn("data",
      when(col("asset_id") === 3L, lit(null).cast("binary"))
        .otherwise(col("data")))
    val out = Multimodal.decodeFeatures(withNull, dims = 4,
      codec = new InitGatedXorCodec).filter(col("asset_id") === 3L).collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 0L) // byte_len
    assert(out(0).getLong(4) === 0L) // checksum of all-zero accumulators
  }

  test("phashChunks + phashPairs run unchanged under a second codec (m06 shape)") {
    val chunks = Multimodal.phashChunks(assets, dims = 17,
      codec = new InitGatedXorCodec)
    assert(chunks.schema.fieldNames.toSeq === Seq("id", "c0", "c1", "c2", "c3"))
    assert(chunks.count() === 5)
    // exact duplicates collide on the fingerprint under any codec, so
    // the pair tier finds them at hamming 0
    val pairs = Multimodal.phashPairs(assets, maxHamming = 0,
      codec = new InitGatedXorCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 4L)))
  }
}
