package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** IVF-PQ index: list pruning × code compression. Serving must equal
  * the inline operator exactly, the on-disk inverted file must hold
  * codes (not vectors) and prune to the probed partitions, and an
  * identical vector must surface at rank 1 through the probed lists. */
class IvfPqIndexSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("served top-k == inline ivfPqTopK from a cid-partitioned codes file") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val idx = Files.createTempDirectory("ivfpq_index").toString

    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", idx)

    // inverted-file layout: one cid= directory per list, one file each,
    // and the rows are (id, codes) — compressed, no vector column
    val dirs = new java.io.File(s"$idx/codes").listFiles()
      .filter(_.isDirectory).filter(_.getName.startsWith("cid="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts === 1, s"${d.getName} has $parts part files")
    }
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.columns.toSet === Set("id", "codes", "cid"))
    assert(codes.count() === emb.count())

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val inline = rows(Similarity.ivfPqTopK(emb, queries,
      "vec_id", "embedding", k = 3))
    val servedDf = Similarity.ivfPqServeTopK(spark, idx, queries,
      "vec_id", "embedding", k = 3)
    // the probed-cid literal must reach the scan as a PARTITION filter
    val plan = servedDf.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [cid"),
      s"no cid partition filter in plan:\n${plan.take(2000)}")
    val served = rows(servedDf)
    assert(served === inline)
    assert(served.nonEmpty)
    // every query got its k candidates (probed lists are big enough here)
    assert(served.groupBy(_._1).forall(_._2.size == 3))
  }

  test("appendToIvfPqIndex ≡ one-shot build when both samples coincide") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    // nCentroids = nCodes = 16 at the defaults and both sample by
    // smallest md5(id), so ONE 16-id set is the whole yardstick; put it
    // in the initial build and append(rest) must reproduce the one-shot
    // index over the full corpus exactly
    val seedIds = emb
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(col("__h"), col("vec_id")).limit(16)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val allIds = emb.select("vec_id").collect().map(_.getLong(0))
    val initialIds = (seedIds ++
      allIds.filterNot(seedIds).take(allIds.length / 2)).toSeq
    val initial = emb.filter(col("vec_id").isin(initialIds: _*))
    val rest = emb.filter(!col("vec_id").isin(initialIds: _*))
    assert(rest.count() > 0)

    val incrDir = java.nio.file.Files.createTempDirectory("ivfpq_incr").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivfpq_full").toString
    Similarity.buildIvfPqIndex(initial, "vec_id", "embedding", incrDir)
    Similarity.appendToIvfPqIndex(spark, incrDir, rest, "vec_id", "embedding")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", fullDir)

    def served(dir: String) = Similarity.ivfPqServeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(served(incrDir) === served(fullDir))
    val codes = spark.read.parquet(s"$incrDir/codes")
    assert(codes.count() === emb.count())
    assert(codes.select("id").distinct().count() === emb.count())
  }

  test("an identical vector is found at rank 1 through the probed lists") {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    // the dup assigns to the same centroid the query probes first, so
    // list pruning cannot lose it, and it is the ADC argmin (the pq
    // dup-argmin argument, per subspace)
    val dup = emb.filter(col("vec_id") === 3)
      .select(lit(9000L).as("vec_id"), col("embedding"))
    val out = Similarity.ivfPqTopK(emb.unionByName(dup),
        emb.filter(col("vec_id") === 3), "vec_id", "embedding", k = 1)
      .collect()(0)
    assert(out.getLong(1) === 9000L)
  }
}
