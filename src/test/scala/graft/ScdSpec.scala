package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 merge: the four key fates — untouched, unchanged-update,
  * changed (close + reopen), brand-new — plus closed-history
  * passthrough and null-safe attribute comparison. */
class ScdSpec extends SparkSuite {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("scd2Merge closes changed versions, opens new ones, keeps the rest") {
    val current = Seq(
      // key 1: closed historical version + open current one
      (1L, Option("gold"), d("2020-01-01"), Option(d("2022-01-01"))),
      (1L, Option("silver"), d("2022-01-01"), None),
      (2L, Option("bronze"), d("2020-01-01"), None), // unchanged update arrives
      (3L, Option("gold"), d("2020-01-01"), None),   // no update at all
      (4L, None, d("2020-01-01"), None)              // NULL attr → value = change
    ).toDF("id", "tier", "valid_from", "valid_to")
    val updates = Seq(
      (1L, Option("platinum")), // changed
      (2L, Option("bronze")),   // unchanged
      (4L, Option("iron")),     // NULL → value
      (9L, Option("new-tier"))  // brand-new key
    ).toDF("id", "tier")
    val out = Scd.scd2Merge(current, updates, "id", Seq("tier"),
        lit("2024-06-01").cast("date"))
      .orderBy("id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString)))
      .toSeq
    assert(out === Seq(
      (1L, Some("gold"), "2020-01-01", Some("2022-01-01")), // history untouched
      (1L, Some("silver"), "2022-01-01", Some("2024-06-01")), // closed now
      (1L, Some("platinum"), "2024-06-01", None),           // reopened
      (2L, Some("bronze"), "2020-01-01", None),             // unchanged → kept
      (3L, Some("gold"), "2020-01-01", None),               // untouched → kept
      (4L, None, "2020-01-01", Some("2024-06-01")),         // null→value closes
      (4L, Some("iron"), "2024-06-01", None),
      (9L, Some("new-tier"), "2024-06-01", None)            // new key opens
    ))
  }

  test("untracked attributes ride along; only tracked changes open versions") {
    val current = Seq(
      (1L, "gold", "old st", d("2020-01-01"), Option.empty[Date]),
      (2L, "gold", "elm st", d("2020-01-01"), Option.empty[Date]),
      // closed history with the full schema must pass through untouched
      (2L, "bronze", "oak st", d("2019-01-01"), Option(d("2020-01-01")))
    ).toDF("id", "tier", "address", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "gold", "new st"),  // only the UNTRACKED column changed → kept
      (2L, "silver", "elm st") // tracked change → close + reopen
    ).toDF("id", "tier", "address")
    val out = Scd.scd2Merge(current, updates, "id", Seq("tier"),
        lit("2024-06-01").cast("date"))
      .orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getDate(4)).map(_.toString))).toSeq
    assert(out === Seq(
      (1L, "gold", "old st", None),                   // untracked drift ignored
      (2L, "bronze", "oak st", Some("2020-01-01")),   // history intact
      (2L, "gold", "elm st", Some("2024-06-01")),     // closed
      (2L, "silver", "elm st", None)))                // reopened
  }

  test("asOfSnapshot time-travels the history: one version per key per instant") {
    val current = Seq(
      (1L, Option("a"), d("2020-01-01"), Option.empty[Date]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val merged = Scd.scd2Merge(current, Seq((1L, Option("b"))).toDF("id", "tier"),
      "id", Seq("tier"), lit("2024-06-01").cast("date"))
    def snap(day: String) = Scd.asOfSnapshot(merged,
        lit(day).cast("date"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(snap("2023-01-01") === Seq((1L, "a")), "pre-merge world")
    assert(snap("2024-06-01") === Seq((1L, "b")),
      "ON the merge instant the new version is live (half-open close)")
    assert(snap("2025-01-01") === Seq((1L, "b")), "post-merge world")
    assert(snap("2019-01-01") === Seq(), "before the dimension existed")
  }

  test("idempotent: re-applying the same updates changes nothing") {
    val current = Seq((1L, Option("a"), d("2020-01-01"), Option.empty[Date]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val updates = Seq((1L, Option("b"))).toDF("id", "tier")
    val once = Scd.scd2Merge(current, updates, "id", Seq("tier"),
      lit("2024-06-01").cast("date"))
    val twice = Scd.scd2Merge(once, updates, "id", Seq("tier"),
      lit("2024-06-01").cast("date"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id", "valid_from").collect().map(_.toSeq).toSeq
    assert(rows(twice) === rows(once))
  }
}
