package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "some text payload"), (2L, "other bytes here"), (3L, "x"))
      .toDF("doc_id", "text")

  test("syntheticAssets carries binary payload + typed metadata") {
    val a = Multimodal.syntheticAssets(docs, "doc_id", "text")
    assert(a.schema("data").dataType.typeName === "binary")
    assert(a.schema("meta").dataType.typeName === "struct")
    val row = a.filter($"asset_id" === 1).collect()(0)
    assert(new String(row.getAs[Array[Byte]]("data"), "UTF-8") === "some text payload")
  }

  test("decodeFeatures is deterministic and fixed-width") {
    val a = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val f1 = Multimodal.decodeFeatures(a, dims = 8)
      .orderBy("asset_id").collect().map(_.getSeq[Float](3))
    val f2 = Multimodal.decodeFeatures(a, dims = 8)
      .orderBy("asset_id").collect().map(_.getSeq[Float](3))
    assert(f1.map(_.toSeq).toSeq === f2.map(_.toSeq).toSeq)
    assert(f1.forall(_.length === 8))
  }

  test("a NULL payload decodes like a zero-byte asset, not an NPE") {
    // nullable binary column: one null row must not kill the whole job
    // in the typed mapPartitions path (the repo's only per-row JVM code)
    val withNull = Seq((1L, Some("payload")), (2L, None))
      .toDF("doc_id", "text")
    val a = Multimodal.syntheticAssets(withNull, "doc_id", "text")
    val out = Multimodal.decodeFeatures(a, dims = 4)
      .orderBy("asset_id").collect()
    assert(out.length === 2)
    assert(out(1).getAs[Long]("byte_len") === 0L)
    assert(out(1).getAs[Long]("feat_checksum") === 0L)
    val ph = Multimodal.phashChunks(a, dims = 5).orderBy("id").collect()
    assert(ph.length === 2, "phash path must survive the null payload too")
  }

  test("sampleFrames emits n frames per asset") {
    val a = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(a, 4)
    assert(frames.count() === 12L)
    val perAsset = frames.groupBy("asset_id").count()
      .collect().map(_.getLong(1)).toSet
    assert(perAsset === Set(4L))
  }

  test("phashPairs: exact copy at hamming 0, trailer corruption within " +
      "2 bits, distinct payloads far apart; blocked join ≡ brute force") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = base
      .unionByName(base.filter($"doc_id" < 5)
        .withColumn("doc_id", $"doc_id" + 1000000L)) // exact re-uploads
      .unionByName(base.filter($"doc_id" < 5)
        .withColumn("doc_id", $"doc_id" + 2000000L)
        .withColumn("text", concat($"text", lit("!")))) // 1-byte trailer
    val assets = Multimodal.syntheticAssets(corpus, "doc_id", "text")
    val pairs = Multimodal.phashPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 5L).foreach { d =>
      assert(pairs((d, d + 1000000L)) === 0L, s"exact copy of $d not at 0")
      assert(pairs((d, d + 2000000L)) <= 2L, s"trailer copy of $d too far")
    }
    // blocked pigeonhole join returns EXACTLY the brute-force answer
    val fp = Multimodal.phashChunks(assets).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val ids = fp.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = fp(ids(i)); b = fp(ids(j))
      h = java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4)
      if h <= 3
    } yield (ids(i), ids(j)) -> h.toLong).toMap
    assert(pairs === brute)
  }

  test("resizeAssets caps the long edge, preserves aspect, shrinks bytes") {
    val a = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val before = a.select("asset_id", "meta.width", "meta.height", "data")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).length)).toMap
    val out = Multimodal.resizeAssets(a, maxDim = 100)
      .select("asset_id", "meta.width", "meta.height", "data", "meta.codec")
      .collect()
    out.foreach { r =>
      val (w0, h0, len0) = before(r.getLong(0))
      val (w1, h1) = (r.getInt(1), r.getInt(2))
      val len1 = r.getAs[Array[Byte]](3).length
      assert(math.max(w1, h1) <= 100)
      assert(len1 <= len0 && len1 >= 1)
      // aspect preserved within the floor-to-pixel grid
      val s = math.min(1.0, 100.0 / math.max(w0, h0))
      assert(w1 === math.max(math.floor(w0 * s), 1.0).toInt)
      assert(h1 === math.max(math.floor(h0 * s), 1.0).toInt)
      assert(r.getString(4) != null) // untouched meta rides along
    }
    // no upscale: an already-small asset passes through unchanged
    val same = Multimodal.resizeAssets(a, maxDim = 10000)
      .select("asset_id", "meta.width", "meta.height", "data").collect()
    same.foreach { r =>
      val (w0, h0, len0) = before(r.getLong(0))
      assert((r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3).length) ===
        ((w0, h0, len0)))
    }
  }
}
