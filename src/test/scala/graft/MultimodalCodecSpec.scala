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

  // ---- the REAL decoder: graft.operators.ImageIoCodec (JDK ImageIO) ----

  /** Encode a w×h grayscale image whose luma at (x, y) is `f(x, y)`,
    * in the given ImageIO format ("png", "jpg"). Tiny REAL images,
    * generated in-test — no fixtures, no network. */
  private def imageBytes(fmt: String, w: Int, h: Int)(
      f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private val W = 130
  private val H = 16
  private def grad(x: Int, y: Int): Int = x * 255 / (W - 1)
  // deterministic low-amplitude noise: preserves stripe-mean ordering
  private def noisy(x: Int, y: Int): Int = grad(x, y) + (x * 31 + y * 17) % 5 - 2

  private def realAssets = {
    val rows = Seq(
      (1L, imageBytes("png", W, H)(grad)),
      (2L, imageBytes("png", W, H)(noisy)),                  // noisy re-render
      (3L, imageBytes("jpg", W, H)(grad)),                   // lossy re-encode
      (4L, imageBytes("png", W, H)((x, y) => 255 - grad(x, y))), // reversed content
      (5L, "not an image at all".getBytes("UTF-8")))         // corrupt payload
    rows.toDF("asset_id", "data")
      .withColumn("kind", lit("image"))
      .withColumn("meta", struct(lit(W).as("width"), lit(H).as("height"),
        lit(0).as("sample_rate"), lit(0.0).as("duration_s"),
        lit("png").as("codec")))
  }

  test("ImageIoCodec decodes real pixels: gradient stripe means ascend") {
    val c = new graft.operators.ImageIoCodec
    c.init()
    val acc = c.accumulators(imageBytes("png", W, H)(grad), 8)
    assert(acc.length === 8)
    // decoded stripe means of a left-dark gradient strictly ascend, and
    // sit in the luma-x1000 range — values a byte-fold stub cannot
    // produce from PNG container bytes
    assert(acc.sliding(2).forall(p => p(0) < p(1)), acc.toSeq.toString)
    assert(acc.head < 40000L && acc.last > 215000L, acc.toSeq.toString)
  }

  test("real decoded-pixel pHash: noise and JPEG re-encode are near-dups, reversed content is not") {
    val pairs = Multimodal.phashPairs(realAssets, maxHamming = 3,
      codec = new graft.operators.ImageIoCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the three renderings of the SAME content pair up within 3 bits...
    assert(pairs.contains((1L, 2L)), s"noisy re-render must near-dup: $pairs")
    assert(pairs.contains((1L, 3L)), s"JPEG re-encode must near-dup: $pairs")
    assert(pairs.contains((2L, 3L)), pairs.toString)
    // ...and the reversed gradient (every stripe comparison flipped)
    // pairs with none of them
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"reversed content must not near-dup: $pairs")
  }

  test("decodeFeatures over real images (m02 shape): deterministic, normalized") {
    val out = Multimodal.decodeFeatures(realAssets, dims = 8,
      codec = new graft.operators.ImageIoCodec)
    assert(out.schema.fieldNames.toSeq ===
      Seq("asset_id", "kind", "byte_len", "feature", "feat_checksum"))
    val rows = out.orderBy("asset_id").collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(2) > 0L)) // real encoded payloads
    // features stay in the stub's normalized range (luma mean <= 255000
    // over StubMod)
    val feats = rows.map(_.getSeq[Float](3))
    assert(feats.forall(_.forall(v => v >= 0f && v <= 0.26f)))
    val again = Multimodal.decodeFeatures(realAssets, dims = 8,
      codec = new graft.operators.ImageIoCodec)
      .orderBy("asset_id").collect().map(_.getLong(4))
    assert(again.toSeq === rows.map(_.getLong(4)).toSeq, "decode determinism")
  }

  test("undecodable payloads fall back to the stub fold, never kill the task") {
    val c = new graft.operators.ImageIoCodec
    c.init()
    val junk = "not an image at all".getBytes("UTF-8")
    assert(c.accumulators(junk, 6).toSeq ===
      graft.operators.Multimodal.stubAccumulators(junk, 6).toSeq)
    assert(c.accumulators(Array.emptyByteArray, 4).toSeq === Seq(0L, 0L, 0L, 0L))
  }

  test("resize (m04 shape) runs over real image assets") {
    val out = Multimodal.resizeAssets(realAssets, maxDim = 64)
      .orderBy("asset_id").collect()
    assert(out.length === 5)
    // 130x16 capped at 64 on the long edge, aspect preserved, floored
    val meta = out.head.getStruct(3)
    assert(meta.getInt(0) === 64 && meta.getInt(1) === 7)
  }

  // ---- the REAL audio decoder: graft.operators.WavCodec (JDK sampled) ----

  /** Encode `n` 16-bit mono PCM samples (`f(i)` in [-32768, 32767]) as
    * a real WAV container — in-test, zero fixtures. */
  private def wavBytes(n: Int)(f: Int => Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = math.max(-32768, math.min(32767, f(i)))
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val N = 4000
  // a square tone whose AMPLITUDE ramps up over time: the loudness
  // envelope ascends stripe over stripe
  private def ramp(i: Int): Int = (if (i % 20 < 10) 1 else -1) * (i * 8 + 64)
  private def noisyRamp(i: Int): Int = ramp(i) + (i * 31 % 129) - 64

  private def audioAssets = Seq(
    (1L, wavBytes(N)(ramp)),
    (2L, wavBytes(N)(noisyRamp)),                 // noisy re-render
    (3L, wavBytes(N)(i => ramp(N - 1 - i))),      // time-reversed content
    (4L, "definitely not audio".getBytes("UTF-8"))) // corrupt payload
    .toDF("asset_id", "data").withColumn("kind", lit("audio"))

  test("WavCodec decodes real PCM: amplitude-ramp stripe means ascend") {
    val c = new graft.operators.WavCodec
    c.init()
    val acc = c.accumulators(wavBytes(N)(ramp), 8)
    assert(acc.sliding(2).forall(p => p(0) < p(1)), acc.toSeq.toString)
    // mean |amp| of the loudest stripe ~ 29k, quietest ~ 2k — decoded
    // sample scale, not container-byte folds
    assert(acc.head < 6000L && acc.last > 20000L && acc.last < 32768L,
      acc.toSeq.toString)
  }

  test("real decoded-sample pHash: noisy re-render near-dups, reversed audio does not") {
    val pairs = Multimodal.phashPairs(audioAssets, maxHamming = 3,
      codec = new graft.operators.WavCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"noisy re-render must near-dup: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"reversed audio must not near-dup: $pairs")
  }

  test("8-bit WAV widens to the 16-bit grid: same content, same fingerprint") {
    // the SAME ramp rendered at 8-bit depth (unsigned, biased at 128)
    val fmt8 = new javax.sound.sampled.AudioFormat(16000f, 8, 1, false, false)
    val data8 = Array.tabulate(N)(i =>
      ((math.max(-32768, math.min(32767, ramp(i))) >> 8) + 128).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data8), fmt8, N.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val c = new graft.operators.WavCodec
    c.init()
    val a16 = c.accumulators(wavBytes(N)(ramp), 17)
    val a8 = c.accumulators(bos.toByteArray, 17)
    // quantization shifts stripe means by < one 8-bit step (256 on the
    // 16-bit grid); the envelope ORDERING — what the dHash compares —
    // survives exactly
    assert(a16.indices.forall(d => math.abs(a16(d) - a8(d)) < 300),
      s"16-bit ${a16.toSeq} vs 8-bit ${a8.toSeq}")
    val h = (acc: Array[Long]) => acc.sliding(2).map(p => p(0) > p(1)).toSeq
    assert(h(a16) === h(a8))
  }

  test("undecodable audio payloads fall back to the stub fold") {
    val c = new graft.operators.WavCodec
    c.init()
    val junk = "definitely not audio".getBytes("UTF-8")
    assert(c.accumulators(junk, 6).toSeq ===
      graft.operators.Multimodal.stubAccumulators(junk, 6).toSeq)
    assert(c.accumulators(Array.emptyByteArray, 3).toSeq === Seq(0L, 0L, 0L))
  }

  test("decodeFeatures over real audio (m02 shape): deterministic, normalized") {
    val out = Multimodal.decodeFeatures(audioAssets, dims = 8,
      codec = new graft.operators.WavCodec).orderBy("asset_id").collect()
    assert(out.length === 4)
    val feats = out.map(_.getSeq[Float](3))
    assert(feats.forall(_.forall(v => v >= 0f && v < 1.02f)))
    val again = Multimodal.decodeFeatures(audioAssets, dims = 8,
      codec = new graft.operators.WavCodec)
      .orderBy("asset_id").collect().map(_.getLong(4))
    assert(again.toSeq === out.map(_.getLong(4)).toSeq)
  }

  // ---- the m07-m10 declared queries (rows-only under the driver) ----
  //
  // DuckDB cannot decode media, so the driver records these rows-only;
  // THIS is their correctness gate — the exact aggregate rows the
  // declared query functions return, pinned.

  private def declared(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("m07: real PNG decode recovers 24/24/24 stripe-envelope classes") {
    val rows = declared("m07_real_image_decode").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rows === Seq("ascending" -> 24L, "descending" -> 24L,
      "flat" -> 24L))
  }

  test("m09: real WAV decode recovers 24/24/24 amplitude-envelope classes") {
    val rows = declared("m09_real_audio_decode").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rows === Seq("ascending" -> 24L, "descending" -> 24L,
      "flat" -> 24L))
  }

  test("m08: real pixel pHash pairs exactly the same-content renderings") {
    val rows = declared("m08_real_image_phash").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 16 groups x C(3,2) same-content rendering pairs (PNG, noisy PNG,
    // JPEG) and NOTHING else: no reversed-content pair, no cross-group
    // pair survives the hamming-3 gate
    assert(rows.map(r => (r._1, r._2)) === Seq(("same_content", 48L)))
    // the renderings land within the gate by construction (profile gaps
    // dwarf noise + JPEG quantization); total hamming stays tiny
    assert(rows.head._3 <= 48L * 3, s"total hamming ${rows.head._3}")
  }

  test("m10: real PCM pHash pairs exactly the base+noisy tone per group") {
    val rows = declared("m10_real_audio_phash").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(r => (r._1, r._2)) === Seq(("same_content", 16L)))
    assert(rows.head._3 <= 16L * 3, s"total hamming ${rows.head._3}")
  }
}
