package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Dedup}

class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives: every inserted value probes true") {
    val vals = (1 to 200).map(i => s"member-$i")
    val bits = Bloom.buildBits(vals.toDF("v"), col("v"))
    val hits = vals.toDF("v")
      .filter(Bloom.mightContain(bits, col("v"))).count()
    assert(hits === 200L)
  }

  test("false-positive rate is small at the default sizing") {
    val vals = (1 to 200).map(i => s"member-$i")
    val bits = Bloom.buildBits(vals.toDF("v"), col("v"))
    val absent = (1 to 2000).map(i => s"absent-$i")
    val fps = absent.toDF("v")
      .filter(Bloom.mightContain(bits, col("v"))).count()
    // 600 set bits in 65536, 3 probes → fpp ≈ (600/65536)^3 ≈ 1e-6
    assert(fps <= 2, s"$fps false positives out of 2000")
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = Dedup.contaminatedDocs(d, "doc_id", "text",
        evalPred = col("doc_id") % 7 === 0, k = 5, minShared = 2L,
        hashed = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bloomed = Dedup.bloomContaminatedDocs(d, "doc_id", "text",
        evalPred = col("doc_id") % 7 === 0, k = 5, minShared = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.nonEmpty) // the gate is vacuous on an empty report
    assert(bloomed.toSeq === exact.toSeq)
  }
}
