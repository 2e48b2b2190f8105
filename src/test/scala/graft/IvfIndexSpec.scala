package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Materialized IVF index: build-once/serve-many must return exactly
  * what the inline operator returns, and the on-disk layout must be the
  * partition-pruned inverted file the docstring promises. */
class IvfIndexSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("served top-k == inline ivfTopK, from a cid-partitioned index") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val idx = Files.createTempDirectory("ivf_index").toString

    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nCentroids = 16)

    // the inverted-file layout is real: one partition directory per list
    val assignedDirs = new java.io.File(s"$idx/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cid="))
    assert(assignedDirs.nonEmpty)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // one file per list — the repartition(col("cid")) before the
    // partitioned write prevents the tasks×lists small-file spray
    new java.io.File(s"$idx/assigned").listFiles().filter(_.isDirectory)
      .foreach { d =>
        val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
        assert(parts === 1, s"${d.getName} has $parts part files")
      }

    val inline = rows(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, nCentroids = 16, nProbe = 4))
    val servedDf = Similarity.ivfServeTopK(spark, idx, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
    // the probed-cid literal filter must reach the scan as a PARTITION
    // filter (static pruning of the inverted file)
    val plan = servedDf.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [cid"),
      s"no cid partition filter in plan:\n${plan.take(2000)}")
    val served = rows(servedDf)
    assert(served === inline)
    assert(served.nonEmpty)

    // the v13 recall gate holds through the SERVE path too: recall of
    // the served top-k against brute-force truth equals the declared
    // v13_ivf_recall (inline) per query
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      k = 3)
    val servedRecall = Similarity.recallAtK(truth, servedDf)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val declared = SparkEntry.queries("v13_ivf_recall")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(servedRecall === declared)
  }

  test("filtered serve: attr predicate prunes the index scan and stays exact") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val idx = Files.createTempDirectory("ivf_attr_index").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx,
      nCentroids = 16, attrCols = Seq("label"))

    val aLabel = queries.select("label").head().getInt(0)
    val servedDf = Similarity.ivfServeTopK(spark, idx, queries,
      "vec_id", "embedding", k = 3, nProbe = 4,
      where = Some(col("label") === aLabel))
    val plan = servedDf.queryExecution.executedPlan.toString()
    // BOTH prunings present: cid partition filter + label pushed filter
    assert(plan.contains("PartitionFilters: [cid"),
      s"no cid partition filter:\n${plan.take(2000)}")
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(label"),
      s"label predicate not pushed to the index scan:\n${plan.take(2000)}")

    // exactness: equals ranking computed directly over the index files
    // restricted to (probed lists ∩ label slice) — no post-filter loss
    val centroids = spark.read.parquet(s"$idx/centroids")
    val probed = queries.select(col("vec_id").as("query_id"),
        col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", Similarity.cosine(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("rn") <= 4)
      .select(col("query_id"), col("embedding").as("qe"), col("cid"))
    val expect = probed
      .join(spark.read.parquet(s"$idx/assigned")
        .filter(col("label") === aLabel)
        .select(col("neighbor_id"), col("v"), col("cid")), "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("qe"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4),
        col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val served = servedDf.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3))).toSet
    assert(served === expect)
    assert(served.nonEmpty)
  }

  test("inline ivfFilteredTopK: slices airtight, ≡ label-restricted candidates") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.ivfFilteredTopK(emb, queries, "vec_id", "embedding",
      "label", k = 3, nCentroids = 16, nProbe = 4)
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    val qLabels = emb.select(col("vec_id").as("query_id"),
      col("label").as("q_label"))
    val crossed = got.join(labels, "neighbor_id").join(qLabels, "query_id")
      .filter(col("label") =!= col("q_label"))
    assert(crossed.isEmpty, "filtered IVF returned an off-label neighbor")
    assert(got.count() > 0)
  }

  test("appendToIvfIndex ≡ one-shot build when the centroid sample coincides") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    // split so the md5-smallest 16 ids (the centroid sample) all land in
    // the INITIAL build — then append(rest) must leave the index in
    // exactly the state a one-shot build over the full corpus produces
    val centroidIds = emb
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(col("__h"), col("vec_id")).limit(16)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val allIds = emb.select("vec_id").collect().map(_.getLong(0))
    val initialIds = (centroidIds ++
      allIds.filterNot(centroidIds).take(allIds.length / 2)).toSeq
    val initial = emb.filter(col("vec_id").isin(initialIds: _*))
    val rest = emb.filter(!col("vec_id").isin(initialIds: _*))
    assert(rest.count() > 0)

    val incrDir = Files.createTempDirectory("ivf_incr").toString
    val fullDir = Files.createTempDirectory("ivf_full").toString
    Similarity.buildIvfIndex(initial, "vec_id", "embedding", incrDir,
      nCentroids = 16)
    Similarity.appendToIvfIndex(spark, incrDir, rest, "vec_id", "embedding")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", fullDir,
      nCentroids = 16)

    def served(dir: String) = Similarity.ivfServeTopK(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(served(incrDir) === served(fullDir))
    // every vector assigned exactly once after the append
    val assigned = spark.read.parquet(s"$incrDir/assigned")
    assert(assigned.count() === emb.count())
    assert(assigned.select("neighbor_id").distinct().count() === emb.count())
  }
}
