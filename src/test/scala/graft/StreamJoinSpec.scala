package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamJoin

case class Impression(imp_id: Long, imp_user: String, imp_ts: Timestamp)
case class Click(click_id: Long, click_user: String, click_ts: Timestamp)

/** Stream-stream banded join: matches inside the band, drops outside,
  * and (leftOuter) emits the unmatched side once the watermark passes. */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("inner banded join matches only within the event-time band") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.withinBand(
      imps.toDF(), clicks.toDF(),
      "imp_user", "click_user", "imp_ts", "click_ts",
      lateness = "10 minutes", joinWindow = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_inner")
      .outputMode("append").start()
    try {
      imps.addData(Impression(1, "u1", t(10)), Impression(2, "u2", t(10)))
      // u1 clicks inside the 5-minute band; u2 clicks too late; u3 has
      // no impression at all
      clicks.addData(Click(100, "u1", t(12)), Click(200, "u2", t(30)),
        Click(300, "u3", t(12)))
      q.processAllAvailable()
      val got = spark.table("sj_inner")
        .select("imp_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((1L, 100L)))
    } finally q.stop()
  }

  test("leftOuter emits unmatched impressions after the watermark closes the band") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoin.withinBand(
      imps.toDF(), clicks.toDF(),
      "imp_user", "click_user", "imp_ts", "click_ts",
      lateness = "2 minutes", joinWindow = "5 minutes",
      joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      imps.addData(Impression(1, "u1", t(10)), Impression(2, "u2", t(10)))
      clicks.addData(Click(100, "u1", t(12)))
      q.processAllAvailable()
      // advance both watermarks far past 10:00 + band + lateness so the
      // unmatched impression's state can be finalized and emitted
      imps.addData(Impression(9, "zz", t(60)))
      clicks.addData(Click(900, "zz2", t(60)))
      q.processAllAvailable()
      imps.addData(Impression(10, "zz3", t(90)))
      clicks.addData(Click(901, "zz4", t(90)))
      q.processAllAvailable()
      val byImp = spark.table("sj_outer")
        .select("imp_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(byImp(1L) === Some(100L)) // matched inside the band
      assert(byImp.get(2L) === Some(None)) // unmatched → null right side
    } finally q.stop()
  }

  test("stream-static enrichment attaches dim attributes, keeps unmatched rows") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[Impression]
    val dim = Seq(("u1", "gold"), ("u2", "silver"))
      .toDF("dim_user", "tier")
    val enriched = StreamJoin.enrichWithStatic(
      events.toDF(), dim, "imp_user", "dim_user")
    val q = enriched.writeStream.format("memory").queryName("sj_static")
      .outputMode("append").start()
    try {
      events.addData(Impression(1, "u1", t(1)), Impression(2, "u9", t(2)))
      q.processAllAvailable()
      events.addData(Impression(3, "u2", t(3)))
      q.processAllAvailable()
      val got = spark.table("sj_static")
        .select("imp_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
      // matched rows enrich; the unknown key survives with a null tier
      // (the reference's UNKNOWN-brand convention)
      assert(got === Map(1L -> Some("gold"), 2L -> None, 3L -> Some("silver")))
    } finally q.stop()
  }

  test("stream-static enrichment accepts identical key names on both sides") {
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[Impression]
    val dim = Seq(("u1", "gold")).toDF("imp_user", "tier") // SAME key name
    val enriched = StreamJoin.enrichWithStatic(
      events.toDF(), dim, "imp_user", "imp_user")
    val q = enriched.writeStream.format("memory").queryName("sj_samekey")
      .outputMode("append").start()
    try {
      events.addData(Impression(1, "u1", t(1)))
      q.processAllAvailable()
      val rows = spark.table("sj_samekey").select("imp_id", "tier").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "gold")))
    } finally q.stop()
  }
}
