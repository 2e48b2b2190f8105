package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Materialized PQ index: build-once/serve-many must return exactly
  * what the inline operator returns, the codes table must be the
  * compressed (id, m small ints) scan target the docstring promises,
  * and appends must leave the index byte-equivalent to a one-shot
  * build when the codebook sample coincides. */
class PqIndexSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("served top-k == inline pqTopK; codes table carries ints, not vectors") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val idx = Files.createTempDirectory("pq_index").toString

    Similarity.buildPqIndex(emb, "vec_id", "embedding", idx)

    // the compression is real: the codes table has exactly (id, codes)
    // with m int entries — no float vector column survives to disk
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.columns.toSet === Set("id", "codes"))
    assert(codes.schema("codes").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false) ||
      codes.schema("codes").dataType.simpleString.startsWith("array<int>"))
    assert(codes.count() === emb.count())
    val sizes = codes.select(size(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(sizes === Seq(8))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val inline = rows(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 3))
    val served = rows(Similarity.pqServeTopK(spark, idx, queries,
      "vec_id", "embedding", k = 3))
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("appendToPqIndex ≡ one-shot build when the codebook sample coincides") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    // split so the md5-smallest 16 ids (the codebook sample) all land in
    // the INITIAL build — append(rest) must then reproduce the one-shot
    // index over the full corpus exactly
    val cbIds = emb
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(col("__h"), col("vec_id")).limit(16)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val allIds = emb.select("vec_id").collect().map(_.getLong(0))
    val initialIds = (cbIds ++
      allIds.filterNot(cbIds).take(allIds.length / 2)).toSeq
    val initial = emb.filter(col("vec_id").isin(initialIds: _*))
    val rest = emb.filter(!col("vec_id").isin(initialIds: _*))
    assert(rest.count() > 0)

    val incrDir = Files.createTempDirectory("pq_incr").toString
    val fullDir = Files.createTempDirectory("pq_full").toString
    Similarity.buildPqIndex(initial, "vec_id", "embedding", incrDir)
    Similarity.appendToPqIndex(spark, incrDir, rest, "vec_id", "embedding")
    Similarity.buildPqIndex(emb, "vec_id", "embedding", fullDir)

    def served(dir: String) = Similarity.pqServeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(served(incrDir) === served(fullDir))
    // every vector encoded exactly once after the append
    val codes = spark.read.parquet(s"$incrDir/codes")
    assert(codes.count() === emb.count())
    assert(codes.select("id").distinct().count() === emb.count())
  }
}
