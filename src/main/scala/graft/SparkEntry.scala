package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CoreQueries, GovernanceQueries, PiiQueries, PipelineQueries, SourceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature query: orders-per-model group-count
    * (commands.sql:112-115) re-cast on the driver testdata. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02GroupCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ PipelineQueries.all ++ GovernanceQueries.all ++
      PiiQueries.all ++ SourceQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++
      GovernanceQueries.oracles ++ PiiQueries.oracles ++ SourceQueries.oracles

  /** Name-sorted queries, optionally filtered by the
    * `SPARK_GRAFT_ONLY=name,name` dev env var — the ONE subset contract
    * shared by Bench and Verify. */
  def selectedQueries: Seq[(String, (SparkSession, String) => DataFrame)] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail loudly on names that match nothing: a typo'd SPARK_GRAFT_ONLY
    // would otherwise select ZERO queries and Bench/Verify would report
    // a clean empty run — a fast, error-free round that measured nothing
    only.foreach { names =>
      val unknown = names -- queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the registry: ${unknown.toSeq.sorted
          .mkString(", ")}")
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
    }
    queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
  }
}
