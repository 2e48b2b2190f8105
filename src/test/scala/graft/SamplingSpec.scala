package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("split is deterministic, complete, and ~90/5/5") {
    val s1 = Sampling.withSplit(ids, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Sampling.withSplit(ids, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    assert(s1.values.sum === 2000L)
    assert(s1("train") > 1700 && s1("train") < 1880) // ~89.8%
    assert(s1("val") > 50 && s1("val") < 160)
    assert(s1("test") > 50 && s1("test") < 160)
  }

  test("a row's split never depends on partitioning") {
    val a = Sampling.withSplit(ids.repartition(17), "id")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    val b = Sampling.withSplit(ids.repartition(3), "id")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(a === b)
  }

  test("stratified sample applies per-stratum rates; strata stay consistent with the flat cut") {
    val d = ids.withColumn("grp",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val kept = Sampling.sampleStratified(d, "id", "grp",
        Map("a" -> 100, "b" -> 500))
      .groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") > 60 && kept("a") < 140)   // ~10% of 1000
    assert(kept("b") > 420 && kept("b") < 580)  // ~50% of 1000
    // same md5 cut as the flat sampler: a stratum at rate p keeps
    // exactly the rows the flat p-sampler keeps
    val flat = Sampling.sampleDeterministic(
      d.filter(col("grp") === "a"), "id", 100).collect().map(_.getLong(0)).toSet
    val strat = Sampling.sampleStratified(d, "id", "grp", Map("a" -> 100))
      .collect().map(_.getLong(0)).toSet
    assert(strat === flat) // default 0 drops all of b
  }

  test("deterministic sample keeps ~permille/1000 and is a subset") {
    val kept = Sampling.sampleDeterministic(ids, "id", permille = 100)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size > 150 && kept.size < 260) // ~10% of 2000
    // idempotent: sampling the sample keeps everything
    val again = Sampling.sampleDeterministic(
      ids.filter(col("id").isInCollection(kept)), "id", permille = 100)
      .collect().map(_.getLong(0)).toSet
    assert(again === kept)
    assert(Sampling.sampleDeterministic(ids, "id", 0).count() === 0L)
    assert(Sampling.sampleDeterministic(ids, "id", 1000).count() === 2000L)
  }
}
