package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic REAL-media fixture generators for the m07-m10 declared
  * queries: tiny PNG/JPEG images and WAV PCM clips, encoded with the
  * JDK's own ImageIO / sampled-audio writers (zero fixtures on disk,
  * zero external deps), whose DECODED content carries invariants the
  * real codecs ([[ImageIoCodec]], [[WavCodec]]) must recover —
  * stripe-mean monotonicity and perceptual-hash near-dup structure.
  *
  * DuckDB cannot decode images or audio, so these queries are declared
  * rows-only (the s01/s02 regime): the correctness contract is the
  * MultimodalCodecSpec pins asserting the exact aggregate rows, and the
  * generators are seeded pure functions — same bytes every run, every
  * partition layout.
  *
  * Scale shape: generation is DISTRIBUTED — a seeds frame fans out over
  * executors and each task encodes its own assets inside the same typed
  * `mapPartitions` discipline the decode operators use, so the fixture
  * path exercises exactly the plumbing (schema, partitioning, per-task
  * codec setup) a 100 TB media corpus would. */
object MultimodalFixtures {

  /** SplitMix64 finalizer: a deterministic 64-bit mix with no JVM/seed
    * state — the same profile on every executor, every run. */
  private def mix(a: Long): Long = {
    var z = a + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Encode a w x h grayscale image whose luma at (x, y) is `f(x, y)`
    * (clamped to [0, 255]) in the given ImageIO format ("png", "jpg"). */
  def imageBytes(fmt: String, w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = math.max(0, math.min(255, f(x, y)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Encode `n` 16-bit little-endian mono PCM samples (`f(i)` clamped
    * to the signed 16-bit range) as a real WAV container. */
  def wavBytes(n: Int)(f: Int => Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = math.max(-32768, math.min(32767, f(i)))
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-group stripe LUMA profile: `stripes` values on the 16-step
    * grid in [16, 240], adjacent stripes always >= 16 apart — wide
    * enough that low-amplitude noise (+/-2) and JPEG quantization never
    * reorder adjacent stripe means, so the dHash bits are stable across
    * the group's renderings by construction. */
  def lumaProfile(group: Long, stripes: Int): Array[Int] = {
    val p = new Array[Int](stripes)
    var d = 0
    while (d < stripes) {
      var v = 16 + 16 * math.floorMod(mix(group * 131 + d), 14L).toInt
      if (d > 0 && v == p(d - 1)) v = if (v >= 224) v - 16 else v + 16
      p(d) = v
      d += 1
    }
    p
  }

  /** Per-group stripe AMPLITUDE profile: values on the 2000-step grid
    * in [2000, 30000], adjacent stripes always >= 2000 apart (the audio
    * analog of [[lumaProfile]] — +/-200 sample noise cannot reorder
    * stripe mean amplitudes). */
  def ampProfile(group: Long, stripes: Int): Array[Int] = {
    val p = new Array[Int](stripes)
    var d = 0
    while (d < stripes) {
      var v = 2000 + 2000 * math.floorMod(mix(group * 157 + d), 15L).toInt
      if (d > 0 && v == p(d - 1)) v = if (v >= 30000) v - 2000 else v + 2000
      p(d) = v
      d += 1
    }
    p
  }

  /** Distributed seeds frame: one row per (group, variant), encoded on
    * the EXECUTORS via the given per-row encoder. asset_id = group*10 +
    * variant, so downstream pair queries recover both from the id. */
  private def generate(spark: SparkSession, nGroups: Int, variants: Int,
      kind: String)(encode: (Long, Int) => Array[Byte]): DataFrame = {
    import spark.implicits._
    val seeds = (0L until nGroups.toLong)
      .flatMap(g => (0 until variants).map(v => (g, v)))
    // pinned partition count (the spreadByKey rationale): seeds are
    // byte-tiny but encode is per-row compute — size-based splitting
    // would run the whole generation in one task
    val parts = math.min(seeds.size, 32)
    seeds.toDS().repartition(parts)
      .mapPartitions(_.map { case (g, v) =>
        (g * 10 + v, g, v, kind, encode(g, v))
      })
      .toDF("asset_id", "group_id", "variant", "kind", "data")
  }

  /** m07 fixture: per group, three REAL PNGs whose decoded stripe-mean
    * sequence is (0) strictly ascending, (1) strictly descending,
    * (2) constant — the monotonicity classes the real decoder must
    * recover from pixels (container bytes carry no such structure). */
  def imageMonotoneAssets(spark: SparkSession, nGroups: Int,
      w: Int = 128, h: Int = 16): DataFrame =
    generate(spark, nGroups, variants = 3, kind = "image") { (g, v) =>
      val off = math.floorMod(mix(g * 7 + 1), 40L).toInt
      imageBytes("png", w, h) { (x, _) =>
        v match {
          case 0 => off + x * 215 / (w - 1)
          case 1 => off + (w - 1 - x) * 215 / (w - 1)
          case _ => 32 + math.floorMod(mix(g * 7 + 2), 192L).toInt
        }
      }
    }

  /** m08 fixture: per group, four renderings of a random stripe-profile
    * image — (0) PNG, (1) PNG + low-amplitude noise, (2) JPEG re-encode,
    * (3) PNG of the REVERSED profile (different content). The dHash
    * contract: 0/1/2 pair within a few bits, 3 pairs with nothing. */
  def imagePhashAssets(spark: SparkSession, nGroups: Int,
      stripes: Int = 65, stripePx: Int = 8, h: Int = 16): DataFrame =
    generate(spark, nGroups, variants = 4, kind = "image") { (g, v) =>
      val prof = lumaProfile(g, stripes)
      val w = stripes * stripePx
      val fmt = if (v == 2) "jpg" else "png"
      imageBytes(fmt, w, h) { (x, y) =>
        val d = math.min(stripes - 1, x / stripePx)
        val base = if (v == 3) prof(stripes - 1 - d) else prof(d)
        if (v == 1) base + (x * 31 + y * 17) % 5 - 2 else base
      }
    }

  /** m09 fixture: per group, three REAL WAV clips whose decoded
    * amplitude envelope is (0) ascending, (1) descending, (2) flat. */
  def audioMonotoneAssets(spark: SparkSession, nGroups: Int,
      n: Int = 4000): DataFrame =
    generate(spark, nGroups, variants = 3, kind = "audio") { (g, v) =>
      val off = 64 + math.floorMod(mix(g * 11 + 3), 512L).toInt
      wavBytes(n) { i =>
        val sign = if (i % 20 < 10) 1 else -1
        v match {
          case 0 => sign * (off + i * 7)
          case 1 => sign * (off + (n - 1 - i) * 7)
          case _ => sign * (off + 4000)
        }
      }
    }

  /** m10 fixture: per group, three renderings of a random amplitude
    * profile — (0) base square tone, (1) + low-amplitude noise,
    * (2) time-REVERSED profile (different content). */
  def audioPhashAssets(spark: SparkSession, nGroups: Int,
      stripes: Int = 65, samplesPerStripe: Int = 64): DataFrame =
    generate(spark, nGroups, variants = 3, kind = "audio") { (g, v) =>
      val prof = ampProfile(g, stripes)
      val n = stripes * samplesPerStripe
      wavBytes(n) { i =>
        val d = math.min(stripes - 1, i / samplesPerStripe)
        val base = if (v == 2) prof(stripes - 1 - d) else prof(d)
        val amp = if (v == 1) base + (i * 31 % 401) - 200 else base
        (if (i % 20 < 10) 1 else -1) * amp
      }
    }
}
