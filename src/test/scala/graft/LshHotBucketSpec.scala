package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The LSH serve path's hot-bucket guard (Similarity.capServeBuckets,
  * applied inside lshSearch): a mass-duplicated embedding family — 1k
  * re-encodings of the same boilerplate — must not push |bucket|²
  * candidates through the bucket join of a corpus self-kNN, and honest
  * buckets must be byte-identical to the uncapped search. */
class LshHotBucketSpec extends SparkSuite {
  import spark.implicits._

  // 1000 identical vectors (the degenerate template family) + an honest
  // tail of distinct vectors that land in other buckets
  private val degenerate = (0L until 1000L).map(i => i -> Seq(1f, 1f, 0f, 0f))
  private val honest = Seq(
    2000L -> Seq(0f, 0f, 1f, 0f), 2001L -> Seq(0f, 0f, 0.9f, 0.1f),
    2002L -> Seq(0f, 0f, 0.8f, 0.3f), 2003L -> Seq(0f, 1f, -0.5f, 0f),
    2004L -> Seq(0f, 0.9f, -0.4f, 0.1f))
  private def fixture = (degenerate ++ honest).toDF("vec_id", "embedding")

  private def withCap[A](cap: Int)(body: => A): A = {
    spark.conf.set("spark.graft.lsh.maxServeBucket", cap.toString)
    try body finally spark.conf.unset("spark.graft.lsh.maxServeBucket")
  }

  test("capServeBuckets bounds every bucket and keeps the lowest ids") {
    val bucketed = ((0L until 1000L).map(i => (i, 1L)) ++
      (0L until 10L).map(i => (3000L + i, 2L)))
      .toDF("neighbor_id", "bucket")
    val capped = Similarity.capServeBuckets(bucketed, 32)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), max("neighbor_id").as("max_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // overflowed bucket: exactly 32 candidates, the 32 LOWEST ids (the
    // members cosineRank's tie-break would pick anyway)
    assert(capped(1L) === ((32L, 31L)))
    // honest bucket: untouched
    assert(capped(2L) === ((10L, 3009L)))
  }

  test("degenerate self-kNN is bounded AND returns the identical top-k") {
    val d = fixture
    // sanity: the guard is live — the degenerate family shares one bucket
    val bucketSizes = d.select(
        Similarity.lshBucket(col("embedding"), 4, 4).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(bucketSizes.max >= 1000, "fixture must overflow one bucket")
    val uncapped = Similarity.lshTopK(d, d, "vec_id", "embedding", k = 3,
      numPlanes = 4, dim = 4).collect().map(_.toSeq).toSet
    val capped = withCap(32) {
      Similarity.lshTopK(d, d, "vec_id", "embedding", k = 3,
        numPlanes = 4, dim = 4).collect().map(_.toSeq).toSet
    }
    // identical vectors tie on sim, and cosineRank breaks ties by lowest
    // neighbor_id — exactly the members the cap keeps — so the capped
    // result is byte-identical even for queries INSIDE the hot bucket
    assert(capped === uncapped)
    // and every degenerate query resolved to the family's lowest ids
    val q999 = capped.filter(_.head == 999L).map(r => (r(1), r(3)))
    assert(q999 === Set((0L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("at sort-merge scale the guard's exchange IS the join's (no extra corpus shuffle)") {
    // with broadcasts off (the 100 TB posture for a corpus-sized build
    // side), the window's hash exchange on the bucket key must satisfy
    // the join's distribution — the corpus side pays ONE shuffle total,
    // not window-shuffle + join-shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = fixture
      val plan = Similarity.lshTopK(d, d, "vec_id", "embedding", k = 2,
        numPlanes = 4, dim = 4).queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      val bucketExchanges =
        "Exchange hashpartitioning\\(bucket".r.findAllIn(plan).length
      // one for the corpus side (window + join share it), one for the
      // probe side — a third would be the join re-shuffling the
      // already-windowed corpus
      assert(bucketExchanges <= 2,
        s"$bucketExchanges bucket exchanges — the join is not reusing " +
          "the hot-bucket window's partitioning")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("honest buckets are untouched by a cap that bites elsewhere") {
    val d = fixture
    val honestIds = honest.map(_._1).toSet
    val uncapped = Similarity.lshTopK(d, d, "vec_id", "embedding", k = 2,
      numPlanes = 4, dim = 4)
      .filter(col("query_id").isin(honestIds.toSeq: _*))
      .collect().map(_.toSeq).toSet
    val capped = withCap(8) {
      Similarity.lshTopK(d, d, "vec_id", "embedding", k = 2,
        numPlanes = 4, dim = 4)
        .filter(col("query_id").isin(honestIds.toSeq: _*))
        .collect().map(_.toSeq).toSet
    }
    assert(capped === uncapped)
  }
}
