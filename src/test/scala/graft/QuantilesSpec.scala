package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  private val cuts = Seq(("head", 1, 3), ("middle", 2, 3))

  test("distinct scores split at exact third shares") {
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val out = Quantiles.cumShareBuckets(df, "s", cuts, "tail")
      .orderBy("id").collect().map(_.getAs[String]("bucket"))
    assert(out.toSeq === Seq.fill(3)("head") ++ Seq.fill(3)("middle") ++
      Seq.fill(3)("tail"))
  }

  test("descending cuts are rejected, not silently mislabeled") {
    // the CASE chain evaluates cuts in order: descending shares would
    // shadow the smaller cut and relabel its rows into the bigger bucket
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Quantiles.cumShareBuckets(df, "s",
        Seq(("middle", 2, 3), ("head", 1, 3)), "tail")
    }
    assert(e.getMessage.contains("ascend"))
  }

  test("ties never straddle a cut — equal scores share a bucket") {
    // 6 docs at score 1.0 (cum share 6/9 = 2/3 -> middle edge), 3 above
    val df = (Seq.fill(6)(1.0) ++ Seq.fill(3)(9.0)).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val out = Quantiles.cumShareBuckets(df, "s", cuts, "tail")
      .orderBy("id").collect().map(_.getAs[String]("bucket"))
    assert(out.take(6).toSet === Set("middle")) // 6/9 <= 2/3, all together
    assert(out.drop(6).toSet === Set("tail"))
  }

  test("null scores neither shift the cuts nor appear in the output") {
    val withNulls = (1 to 9).map(i => (i.toLong, Some(i.toDouble)))
      .toDF("id", "s")
      .union(Seq((100L, None: Option[Double]), (101L, None: Option[Double]))
        .toDF("id", "s"))
    val out = Quantiles.cumShareBuckets(withNulls, "s", cuts, "tail")
      .orderBy("id").collect()
    assert(out.length === 9) // null rows dropped
    assert(out.map(_.getAs[String]("bucket")).toSeq ===
      Seq.fill(3)("head") ++ Seq.fill(3)("middle") ++ Seq.fill(3)("tail"))
  }

  test("bucketing is partition-independent") {
    val base = (1 to 100).map(i => (i.toLong, (i % 17).toDouble)).toDF("id", "s")
    val a = Quantiles.cumShareBuckets(base, "s", cuts, "tail")
      .orderBy("id").collect().toSeq
    val b = Quantiles.cumShareBuckets(base.repartition(7), "s", cuts, "tail")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("the corpus-side plan has no global window — only the distinct-score table is windowed") {
    val df = (1 to 50).map(i => (i.toLong, (i % 5).toDouble)).toDF("id", "s")
    val plan = Quantiles.cumShareBuckets(df, "s", cuts, "tail")
      .queryExecution.optimizedPlan
    // the Window node's child must aggregate first (distinct scores),
    // never window the raw input directly
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 1)
    assert(windows.head.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "window runs over the raw corpus, not the distinct-score table")
  }
}
