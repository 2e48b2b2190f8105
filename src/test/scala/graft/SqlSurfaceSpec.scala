package graft

import graft.core.Tables

/** Entry point B (SURVEY.md §3.2): SQL text against registered views —
  * the worksheet surface. The same Catalyst plans serve both the
  * DataFrame API and spark.sql, so results must agree exactly. */
class SqlSurfaceSpec extends SparkSuite {

  test("spark.sql over registered views matches the DataFrame API results") {
    Tables.registerAll(spark, sf0001)
    val pairs = Seq(
      "q02_group_count" ->
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY n DESC, o_orderstatus",
      "q09_having" ->
        "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15 ORDER BY n DESC, o_custkey",
      "q20_join_group" ->
        "SELECT n.n_name, COUNT(*) AS n FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n DESC, n.n_name")
    pairs.foreach { case (name, sql) =>
      val viaDf = SparkEntry.queries(name)(spark, sf0001).collect().toSeq
      val viaSql = spark.sql(sql).collect().toSeq
      assert(viaDf === viaSql, s"$name: DataFrame vs SQL mismatch")
    }
  }

  test("ordinal group/order references resolve (O2 worksheet idiom)") {
    Tables.registerAll(spark, sf0001)
    val r = spark.sql(
      "SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3")
      .collect()
    assert(r.length === 3)
    assert(r.map(_.getLong(1)).toSeq ===
      r.map(_.getLong(1)).sortBy(-_).toSeq)
  }
}
