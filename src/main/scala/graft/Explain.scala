package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.plans.PlanSnapshots

/** Plan-inspection main: prints the formatted physical plan of selected
  * queries (all of them with no args). Used to keep the plans honest —
  * pushed filters reaching the parquet scan, broadcast joins on dim
  * tables, TakeOrderedAndProject for top-k, whole-stage codegen spans.
  *
  * With SPARK_GRAFT_PLAN_DIR set, also dumps a NORMALIZED plan snapshot
  * per query plus `exchange_budget.tsv` (query → shuffle-exchange
  * count) — the versioned artifacts PlanRegressionSpec gates against:
  * a diff on these files is a deliberate, reviewed plan change, never a
  * silent regression. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val budget = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      planDir match {
        case Some(dir) =>
          Files.createDirectories(Paths.get(dir))
          val norm = PlanSnapshots.normalize(PlanSnapshots.planString(df))
          Files.writeString(Paths.get(dir, s"$n.txt"), norm)
          budget ++= s"$n\t${PlanSnapshots.shuffleCount(norm)}\n"
          spark.catalog.clearCache()
        case None =>
          println(s"========== $n ==========")
          df.explain("formatted")
      }
    }
    planDir.foreach(dir =>
      Files.writeString(Paths.get(dir, "exchange_budget.tsv"), budget.toString))
    spark.stop()
  }
}
