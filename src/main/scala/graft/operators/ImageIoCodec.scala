package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** A REAL image decoder behind the [[Multimodal.AssetCodec]] seam,
  * built on the JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP — no
  * external dependency, so it runs in any executor JVM as-is).
  *
  * Decode path: bytes → `BufferedImage` → per-stripe mean LUMA over
  * `dims` equal vertical stripes (Rec. 601 weights on 8-bit sRGB,
  * scaled ×1000 so the integer accumulators keep three decimals of the
  * mean). That makes [[Multimodal.phashChunks]]' adjacent-stripe
  * comparison a genuine 1-D difference hash over decoded pixels: a
  * re-encode or low-amplitude noise preserves stripe ordering (near-dup
  * within a few bits), while different content reorders it. The decoded
  * grid values are bounded (≤ 255 000 < [[Multimodal.StubMod]]·31), so
  * [[Multimodal.decodeFeatures]]' `acc/StubMod` projection stays in the
  * same normalized range as the stub's.
  *
  * Payloads `ImageIO` cannot decode (this engine's synthetic corpora
  * carry text bytes; real corpora carry truncated/corrupt files) fall
  * back to [[Multimodal.stubAccumulators]] — decode NEVER kills a task:
  * corrupt assets still fingerprint deterministically and can be
  * filtered downstream by metadata, the only behavior that survives a
  * 100 TB crawl.
  *
  * Per-partition state: [[init]] turns off ImageIO's temp-file disk
  * cache (decodes here are from in-memory byte arrays; the default
  * cache writes every stream to /tmp — an executor-disk tax and a
  * small-file storm at corpus scale). Reader instances are NOT shared:
  * `ImageIO.read` is per-call and thread-safe usage is per-decode. */
final class ImageIoCodec extends Multimodal.AssetCodec {

  override def init(): Unit = ImageIO.setUseCache(false)

  override def accumulators(bytes: Array[Byte], dims: Int): Array[Long] = {
    val img =
      if (bytes.isEmpty) null
      else
        // NonFatal only: an OutOfMemoryError from a decompression-bomb
        // image (BufferedImage allocates w*h*4 before any bound check)
        // or an InterruptedException during task kill must propagate
        // and fail/cancel the task, not quietly become a stub print
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) Multimodal.stubAccumulators(bytes, dims)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sum = new Array[Long](dims)
      val cnt = new Array[Long](dims)
      // one bulk sRGB row per getRGB call (not per pixel: the per-call
      // color-model conversion dominates a per-pixel loop) — row-sized
      // buffer, so memory stays O(width) for any image
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          // Rec. 601 integer luma ×1000: 299R + 587G + 114B
          val luma = 299L * ((rgb >> 16) & 0xff) +
            587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
          // stripe d covers columns [d·w/dims, (d+1)·w/dims)
          val d = math.min(dims - 1, x * dims / w)
          sum(d) += luma
          cnt(d) += 1
          x += 1
        }
        y += 1
      }
      val acc = new Array[Long](dims)
      var d = 0
      while (d < dims) {
        // images narrower than `dims` leave trailing stripes empty: mean 0
        acc(d) = if (cnt(d) == 0) 0L else sum(d) / cnt(d)
        d += 1
      }
      acc
    }
  }
}
