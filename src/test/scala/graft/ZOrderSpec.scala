package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{ZOrderOps, ZValue}
import graft.operators.Layout

/** Z-order layout: the interleave must match a bit-by-bit reference
  * (interpreted AND codegen paths), and the written layout must prune
  * files for range predicates on the dimension a single-column sort
  * cannot prune. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  private def ref(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 32) {
      out |= ((a >>> i) & 1L) << (2 * i)
      out |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out ^ Long.MinValue // sign correction: signed order == unsigned Morton
  }

  test("interleave matches the bit-by-bit reference (scala + codegen)") {
    val rnd = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      assert(ZOrderOps.interleave(a, b) === ref(a, b))
    }
    val cases = Seq((3L, 5L), (0L, 0L), (0xFFFFFFFFL, 1L), (123456789L, 987654321L))
    val got = cases.toDF("a", "b")
      .select(ZValue(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    assert(got === cases.map { case (a, b) => ref(a, b) })
  }

  test("signed z-value order equals unsigned Morton order on full 32-bit keys") {
    // b spanning the 2^31 boundary: without sign correction the high
    // half would sort FIRST under signed long comparison
    val keys = Seq((0L, 0L), (5L, 100L), (0L, 0x7FFFFFFFL),
      (0L, 0x80000000L), (0xFFFFFFFFL, 0xFFFFFFFFL))
    val zs = keys.map { case (a, b) => ZOrderOps.interleave(a, b) }
    assert(zs === zs.sorted, "z-values of Morton-increasing points must be signed-sorted")
  }

  test("z-order prunes the dimension a single-column sort cannot") {
    val n = 1 << 14
    val nFiles = 16
    // two pseudo-uniform, decorrelated 0..255 dimensions
    val data = spark.range(n).select(
      (col("id") * 48271 % 256).as("a"),
      (col("id") * 16807 % 256).as("b"))
    val zDir = Files.createTempDirectory("zorder").toString + "/t"
    val aDir = Files.createTempDirectory("asort").toString + "/t"
    Layout.writeZOrdered(data, "a", "b", zDir, nFiles)
    data.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.parquet(aDir)

    // per-file (minB, maxB) footprints, read file by file — the same
    // stats parquet row-group pruning consults
    def bRanges(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("b"), max("b")).collect()(0)
          (r.getLong(0), r.getLong(1))
        }
    // a range predicate on b covering 25% of its domain
    def touched(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (mn, mx) => mx >= 0 && mn < 64 }
    val zr = bRanges(zDir)
    val ar = bRanges(aDir)
    val zTouched = touched(zr); val zTotal = zr.size
    val aTouched = touched(ar); val aTotal = ar.size
    // the a-sorted layout cannot prune a b-predicate: every file spans b
    assert(aTouched === aTotal)
    // the z-ordered layout must skip at least half its files
    assert(zTouched * 2 <= zTotal,
      s"z layout touched $zTouched of $zTotal files")
  }
}
