package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** CDC apply: latest-wins per key, upsert/delete/pass-through, and the
  * edge actions (delete-then-reinsert, delete of an unknown key). */
class CdcSpec extends SparkSuite {
  import spark.implicits._

  test("applyChanges upserts, deletes, and keeps unchanged keys") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val changes = Seq(
      (1L, 1L, "U", "a2"),  // update
      (2L, 1L, "D", "b"),   // delete
      (5L, 1L, "I", "e"),   // insert new key
      (9L, 1L, "D", "x")    // delete of unknown key: no-op
    ).toDF("id", "seq", "action", "v")
      .select($"id", $"seq", $"action", $"v")
    val out = Cdc.applyChanges(target, changes, "id", "seq", "action")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq(1L -> "a2", 3L -> "c", 4L -> "d", 5L -> "e"))
  }

  test("a NULL action upserts like any unknown action — never deletes") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // malformed feed: null action on an existing key. `action === "D"`
    // is NULL for it, and an unguarded filter(!NULL) would silently
    // DELETE key 1 — while the non-null unknown action "X" upserts.
    // Both malformed shapes must behave the same way: upsert.
    val changes = Seq(
      (1L, Some(1L), None, "a9"),
      (2L, Some(1L), Some("X"), "b9"))
      .toDF("id", "seq", "action", "v")
    val out = Cdc.applyChanges(target, changes, "id", "seq", "action")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq(1L -> "a9", 2L -> "b9"))
  }

  test("latest change per key wins; earlier ones are superseded") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val changes = Seq(
      (1L, 1L, "U", "a1"), (1L, 3L, "U", "a3"), (1L, 2L, "U", "a2"),
      (2L, 1L, "D", "b"), (2L, 2L, "I", "b2") // delete then re-insert
    ).toDF("id", "seq", "action", "v")
    val out = Cdc.applyChanges(target, changes, "id", "seq", "action")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq(1L -> "a3", 2L -> "b2"))
  }
}
