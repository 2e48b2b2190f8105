package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Materialized LSH index: build-once/serve-many must return exactly
  * what the inline operator returns, the on-disk layout must be the
  * bucket-pruned structure the docstring promises, and — because the
  * hyperplanes are seed-determined with no data-dependent yardstick —
  * append must ALWAYS equal a one-shot build. */
class LshIndexSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    .toSet

  test("served top-k == inline lshTopK, from a bucket-partitioned index") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val idx = Files.createTempDirectory("lsh_index").toString

    Similarity.buildLshIndex(emb, "vec_id", "embedding", idx,
      numPlanes = 8, dim = 64, seed = 42L)

    // the bucketed layout is real: bucket= partition directories, one
    // part file each (the repartition before the partitioned write)
    val dirs = new java.io.File(s"$idx/bucketed").listFiles()
      .filter(_.isDirectory).filter(_.getName.startsWith("bucket="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts === 1, s"${d.getName} has $parts part files")
    }

    val inline = rows(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 3, numPlanes = 8, dim = 64, seed = 42L))
    val servedDf = Similarity.lshServeTopK(spark, idx, queries,
      "vec_id", "embedding", k = 3)
    // the probed-bucket literal filter must reach the scan as a
    // PARTITION filter (static pruning to the probed directories)
    val plan = servedDf.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [bucket"),
      s"no bucket partition filter in plan:\n${plan.take(2000)}")
    val served = rows(servedDf)
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("appendToLshIndex == one-shot build, for ANY split") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    // arbitrary split — no sample-coincidence caveat like IVF/PQ: the
    // hyperplanes are frozen by (seed, planes, dim) in meta
    val initial = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(3)) === 0)

    val idxAppend = Files.createTempDirectory("lsh_append").toString
    Similarity.buildLshIndex(initial, "vec_id", "embedding", idxAppend,
      numPlanes = 8, dim = 64, seed = 42L)
    Similarity.appendToLshIndex(spark, idxAppend, rest, "vec_id", "embedding")

    val idxOneShot = Files.createTempDirectory("lsh_oneshot").toString
    Similarity.buildLshIndex(emb, "vec_id", "embedding", idxOneShot,
      numPlanes = 8, dim = 64, seed = 42L)

    val viaAppend = rows(Similarity.lshServeTopK(spark, idxAppend, queries,
      "vec_id", "embedding", k = 3))
    val oneShot = rows(Similarity.lshServeTopK(spark, idxOneShot, queries,
      "vec_id", "embedding", k = 3))
    assert(viaAppend === oneShot)
    assert(viaAppend === rows(Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", k = 3, numPlanes = 8, dim = 64, seed = 42L)))
  }
}
