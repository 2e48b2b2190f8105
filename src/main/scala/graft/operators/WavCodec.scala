package graft.operators

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** A REAL audio decoder behind the [[Multimodal.AssetCodec]] seam,
  * built on the JDK's own `javax.sound.sampled` (WAV/AIFF/AU PCM — no
  * external dependency; compressed codecs like Opus stay behind the
  * same seam for an ffmpeg-class drop-in).
  *
  * Decode path: bytes → `AudioInputStream` → per-stripe mean ABSOLUTE
  * amplitude over `dims` equal time windows of the first channel
  * (16/8-bit PCM widened to the 16-bit grid, so values sit in
  * [0, 32768) regardless of source depth). That makes
  * [[Multimodal.phashChunks]]' adjacent-stripe comparison a genuine
  * 1-D envelope difference hash over decoded samples: a re-render or
  * low-amplitude noise preserves the loudness envelope's ordering
  * (near-dup within a few bits), silence-vs-signal structure
  * dominates, and reversed content flips the comparisons. The decoded
  * stripe means are bounded (< 32 768 ≪ [[Multimodal.StubMod]]·31), so
  * [[Multimodal.decodeFeatures]]' `acc/StubMod` projection stays
  * normalized.
  *
  * Payloads `AudioSystem` cannot parse (text bytes, truncated files,
  * codecs the JDK lacks) fall back to [[Multimodal.stubAccumulators]]
  * — decode NEVER kills a task; corrupt assets still fingerprint
  * deterministically (the ImageIoCodec discipline). Frames are read
  * through a fixed 64 KiB buffer, so memory is bounded no matter the
  * asset length. */
final class WavCodec extends Multimodal.AssetCodec {

  override def accumulators(bytes: Array[Byte], dims: Int): Array[Long] = {
    if (bytes.isEmpty) return new Array[Long](dims)
    val in =
      // NonFatal only: OOM / task-kill interrupts must propagate and
      // fail the task rather than silently becoming a stub fingerprint
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) return Multimodal.stubAccumulators(bytes, dims)
    try {
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      val channels = fmt.getChannels
      val frames = in.getFrameLength
      // only uncompressed integer PCM decodes here; anything else (or
      // an unknown frame count) is a job for a real codec drop-in
      if (frames <= 0 || channels < 1 || (bits != 8 && bits != 16))
        return Multimodal.stubAccumulators(bytes, dims)
      val sum = new Array[Long](dims)
      val cnt = new Array[Long](dims)
      val frameSize = fmt.getFrameSize
      val buf = new Array[Byte](65536 - 65536 % math.max(1, frameSize))
      val big = fmt.isBigEndian
      var frameIdx = 0L
      var read = in.read(buf)
      while (read > 0) {
        var off = 0
        while (off + frameSize <= read) {
          // first channel only: the envelope shape, not the mix
          val amp: Int =
            if (bits == 16) {
              val lo = buf(off + (if (big) 1 else 0)) & 0xff
              val hi = buf(off + (if (big) 0 else 1))
              math.abs((hi << 8) | lo)
            } else {
              // 8-bit WAV PCM is unsigned biased at 128; widen to the
              // 16-bit grid so mixed-depth corpora compare on one scale
              math.abs(((buf(off) & 0xff) - 128) << 8)
            }
          // stripe d covers frames [d·n/dims, (d+1)·n/dims)
          val d = math.min(dims - 1, (frameIdx * dims / frames).toInt)
          sum(d) += amp
          cnt(d) += 1
          frameIdx += 1
          off += frameSize
        }
        read = in.read(buf)
      }
      val acc = new Array[Long](dims)
      var d = 0
      while (d < dims) {
        acc(d) = if (cnt(d) == 0) 0L else sum(d) / cnt(d)
        d += 1
      }
      acc
    } catch {
      case scala.util.control.NonFatal(_) =>
        Multimodal.stubAccumulators(bytes, dims)
    } finally in.close()
  }
}
