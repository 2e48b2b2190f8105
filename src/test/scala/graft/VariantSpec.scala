package graft

import org.apache.spark.sql.functions._
import graft.query.Variants

/** SURVEY §1.3: VariantType staging — parse_json once, typed
  * variant_get views (04_snowflake_complet.md:95-97 analog). */
class VariantSpec extends SparkSuite {
  import spark.implicits._

  private lazy val raw = Seq(
    (1L, """{"k": 7, "tag": "a", "nested": {"x": 1.5}}"""),
    (2L, """{"k": 42, "tag": "b", "nested": {"x": -2.25}}"""),
    (3L, """{"tag": "c"}""")) // k missing
    .toDF("id", "js")

  test("stage parses to VariantType once; typedView shreds typed paths") {
    val staged = Variants.stage(raw, "js")
    assert(staged.schema("payload").dataType.typeName === "variant")
    val view = Variants.typedView(staged, "payload", Seq(
      ("$.k", "bigint", "k"),
      ("$.tag", "string", "tag"),
      ("$.nested.x", "double", "x")))
    assert(!view.columns.contains("payload"))
    val rows = view.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(2)), r.getAs[String]("tag")))
    assert(rows(0) === ((1L, Some(7L), "a")))
    assert(rows(1) === ((2L, Some(42L), "b")))
    // missing path → NULL, not an error
    assert(rows(2) === ((3L, None, "c")))
  }

  test("variant shredding supports filters that push into the scan side") {
    val view = Variants.typedView(Variants.stage(raw, "js"), "payload",
      Seq(("$.k", "bigint", "k")))
    assert(view.filter(col("k") > 10).count() === 1L)
  }
}
