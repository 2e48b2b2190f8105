package graft

/** t1 smoke: every declared query runs and returns rows on sf0.001, and
  * the flagship entry is non-empty — mirrors the driver's smoke check. */
class EntrySmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf0001).count()
        if (n == 0 && name != "v03_cosine_near_dup") Some(name) else None
    }
    assert(empties.isEmpty, s"queries with zero rows: $empties")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
