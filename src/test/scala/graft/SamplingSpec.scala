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

  test("leak-free split: whole clusters co-travel; singletons match withSplit") {
    // docs 0-9 in one cluster (rep 0), 10-19 singletons
    val clustered = (0L until 20L).toList
      .toDF("doc_id").withColumn("cluster_id",
        when(col("doc_id") < 10, lit(0L)).otherwise(col("doc_id")))
    val out = Sampling.withLeakFreeSplit(clustered, "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // the whole cluster shares rep 0's split
    assert((0L until 10L).map(out).toSet.size === 1)
    // singleton assignments coincide with the naive per-doc split
    val naive = Sampling.withSplit(clustered.filter(col("doc_id") >= 10)
        .select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (10L until 20L).foreach(i => assert(out(i) === naive(i)))
  }

  test("temperatureWeights: hand-computed T=2 mix; T→∞ flattens, T=1 is proportional") {
    // strata 90/10: p = .9/.1, sqrt = .9487/.3162, w = .75/.25
    val d = (0L until 100L).toDF("id")
      .withColumn("s", when(col("id") < 90, "big").otherwise("small"))
    val w = Sampling.temperatureWeights(d, "s", temperature = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(w("big") === ((90L, 0.9, 0.75, 0.8333)))
    assert(w("small") === ((10L, 0.1, 0.25, 2.5)))
    val t1 = Sampling.temperatureWeights(d, "s", temperature = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(t1("big") === 0.9 && t1("small") === 0.1)
    val flat = Sampling.temperatureWeights(d, "s", temperature = 1e6)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(flat("big") - 0.5) < 0.001)
    assert(math.abs(flat("small") - 0.5) < 0.001)
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

  test("sampleNPerGroup: exactly n per group, stable across partitionings") {
    val d = (1L to 500L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    val a = Sampling.sampleNPerGroup(d, "id", "grp", 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.size === 70)
    assert(a.groupBy(_._2).forall(_._2.size == 10))
    val b = Sampling.sampleNPerGroup(d.repartition(13), "id", "grp", 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(b === a) // md5 order, not partition order
    // n larger than the group keeps the whole group
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(Sampling.sampleNPerGroup(tiny, "id", "grp", 10).count() === 2L)
  }

  test("replicateByWeight: whole epochs replicate, fractions hash-cut, zero drops") {
    val d = (1L to 1000L).map(i =>
      (i, if (i <= 400) "up" else if (i <= 800) "down" else "zero"))
      .toDF("id", "grp")
    val out = Sampling.replicateByWeight(d, "id", "grp",
        Map("up" -> 2500, "down" -> 400, "zero" -> 0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byGrp = out.groupBy(_._2).view.mapValues(_.length).toMap
    // up: 400 docs × (2 + ~0.5) ≈ 1000; down: 400 × ~0.4 ≈ 160; zero: none
    assert(byGrp("up") > 900 && byGrp("up") < 1100, s"up=${byGrp("up")}")
    assert(byGrp("down") > 120 && byGrp("down") < 200, s"down=${byGrp("down")}")
    assert(!byGrp.contains("zero"))
    // copy indices are 1..n per doc, and every 'up' doc appears ≥ 2×
    val upCopies = out.filter(_._2 == "up").groupBy(_._1)
    assert(upCopies.forall { case (_, c) =>
      c.map(_._3).sorted.toSeq == (1L to c.length).toSeq })
    assert(upCopies.forall(_._2.length >= 2))
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

  test("capPerGroupByScore: two-phase salted cap ≡ single-window top-n") {
    // one hot group (1500 rows) + small ones; score with deliberate ties
    // so the tie column carries the order
    val d = (1L to 2000L).map { i =>
      val grp = if (i <= 1500) "hot" else s"g${i % 5}"
      (i, grp, (i % 17).toDouble)
    }.toDF("id", "grp", "score")
    val got = Sampling.capPerGroupByScore(d.repartition(13), "grp",
        "score", "id", n = 10, slices = 4)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    // reference: plain single window per group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id"))
    val want = d.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= 10)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    assert(got === want)
    // caps bind: hot group contributes exactly n, ranks are 1..n
    assert(got.count(_._1 == "hot") === 10)
    assert(got.filter(_._1 == "hot").map(_._3) === (1L to 10L).toSet)
    // stable under a different partitioning (slicing must not change
    // the selected set, only the shuffle shape)
    val again = Sampling.capPerGroupByScore(d.repartition(3), "grp",
        "score", "id", n = 10, slices = 7)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    assert(again === got)
  }

  test("weightedSample: partition-independent, n-bounded, weight-responsive") {
    val d = (1L to 1000L)
      .map(i => (i, if (i <= 100) 1.0 else 0.02))
      .toDF("id", "w")
    val got = Sampling.weightedSample(d.repartition(11), "id", "w", n = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length === 50)
    // deterministic under a different partitioning, same row ORDER
    val again = Sampling.weightedSample(d.repartition(3), "id", "w", n = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(again.toSeq === got.toSeq)
    // keys are sorted descending (top-n by key, ties by id)
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // A-ES responds to weight: the 10% heavy-weight rows (w 50x) must
    // dominate the sample far beyond their population share
    val heavy = got.count(_._1 <= 100)
    assert(heavy > 25, s"only $heavy/50 sampled rows from the heavy decile")
    // w = 0 never outranks a positive weight (floor gives key ~ u^10000)
    val z = (1L to 200L).map(i => (i, if (i % 2 == 0) 0.0 else 0.5)).toDF("id", "w")
    val zs = Sampling.weightedSample(z, "id", "w", n = 20).collect()
    assert(zs.forall(_.getLong(0) % 2 == 1))
  }
}
