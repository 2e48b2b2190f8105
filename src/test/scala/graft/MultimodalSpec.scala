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

  test("sampleFrames emits n frames per asset") {
    val a = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(a, 4)
    assert(frames.count() === 12L)
    val perAsset = frames.groupBy("asset_id").count()
      .collect().map(_.getLong(1)).toSet
    assert(perAsset === Set(4L))
  }
}
