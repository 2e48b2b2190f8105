package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Export

/** Sharded training export: deterministic membership, reproducible
  * within-shard order, loader-trustable manifest — the contract that
  * makes checkpointed training resumable against a re-export. */
class ExportSpec extends SparkSuite {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select("doc_id", "text", "lang")

  test("export: complete, disjoint, manifest-true, one file per shard") {
    val dir = Files.createTempDirectory("export").toString
    val manifest = Export.exportShards(docs, "doc_id", dir, nShards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count(), "rows lost or duplicated")
    assert(back.select("doc_id").distinct().count() === docs.count())
    // manifest counts and id ranges match the written reality
    val actual = back.groupBy("shard")
      .agg(count(lit(1)), min("doc_id"), max("doc_id"))
      .collect().map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(actual === manifest)
    assert(manifest.keySet === (0L until 4L).toSet)
    // one data file per shard directory
    (0 until 4).foreach { k =>
      val files = new java.io.File(s"$dir/shard=$k").listFiles
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $k has ${files.length} files")
    }
    // membership is the documented md5 formula
    val mismatch = back.withColumn("expected",
        Export.shardOf(col("doc_id"), 4))
      .filter(col("shard") =!= col("expected")).count()
    assert(mismatch === 0)
  }

  test("re-export reproduces shard order exactly, whatever the input " +
      "partitioning; readShard serves the committed order") {
    val d1 = Files.createTempDirectory("export1").toString
    val d2 = Files.createTempDirectory("export2").toString
    Export.exportShards(docs, "doc_id", d1, nShards = 3)
    Export.exportShards(docs.repartition(17), "doc_id", d2, nShards = 3)
    (0 until 3).foreach { k =>
      def fileOrder(dir: String) = spark.read
        .parquet(s"$dir/shard=$k") // raw file scan: on-disk row order
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(fileOrder(d1) === fileOrder(d2),
        s"shard $k order depends on input partitioning")
      val served = Export.readShard(spark, d1, k, "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(served === fileOrder(d1), s"readShard reordered shard $k")
      // the committed order is the md5 curriculum, not id order
      val expected = fileOrder(d1)
        .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id))
      assert(fileOrder(d1) === expected, s"shard $k not in md5 order")
    }
  }
}
