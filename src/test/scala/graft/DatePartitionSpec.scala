package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.core.Tables
import graft.ingest.CopyInto
import graft.pii.Masking

/** The date-partitioned warehouse seam (Tables.ctas / CopyInto with
  * `partitionDateCol`, the one `p_date` convention shared with the PII
  * retention tier): a date-range scan over a partitioned fact table
  * must PRUNE — `PartitionFilters` in the plan, untouched days' files
  * never read — and retention must compose with every producer. At
  * 100 TB this is the difference between a range query touching days
  * and touching the corpus. */
class DatePartitionSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("ctas(partitionDateCol) writes p_date= directories; a q14-shaped range scan prunes") {
    val dir = freshDir("dpart")
    val events = Tables.table(spark, sf0001, "events")
    Tables.ctas(events, dir, partitionDateCol = Some("ts"))

    // layout: one directory per day, the retention tier's unit of drop
    val days = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("p_date=")).sorted
    assert(days.length > 1, s"need multiple day partitions, got ${days.toSeq}")

    // q14 shape: a timestamp range over the fact table. Over the
    // partitioned warehouse copy the range ALSO binds p_date (the
    // partition column is derived from ts, so the bounds transfer) —
    // that is the predicate partition pruning keys on.
    val lo = "2024-01-03"
    val hi = "2024-01-05"
    val scan = spark.read.parquet(dir)
      .filter(col("p_date") >= lit(lo) && col("p_date") < lit(hi) &&
        col("ts") >= lit(s"$lo 00:00:00").cast("timestamp") &&
        col("ts") < lit(s"$hi 00:00:00").cast("timestamp"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))

    val plan = scan.queryExecution.executedPlan.toString()
    // the scan node must carry a NON-empty PartitionFilters on p_date —
    // a filter evaluated only post-scan reads every day at 100 TB
    assert("PartitionFilters: \\[[^\\]]*p_date".r.findFirstIn(plan).isDefined,
      s"no p_date PartitionFilters in scan:\n${plan.take(1500)}")

    // and pruning is REAL: execute, then compare files read against the
    // table's total — only the two selected days' files may be touched
    scan.collect()
    // the scan node sits under the AQE wrapper once executed
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Some(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      // materialized query stages are leaves wrapping their stage plan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(q.plan)
      case other => other.children.iterator.map(findScan)
        .collectFirst { case Some(f) => f }
    }
    val scanExec = findScan(scan.queryExecution.executedPlan)
    assert(scanExec.isDefined, plan.take(800))
    val filesRead = scanExec.get.metrics("numFiles").value
    val totalFiles = spark.read.parquet(dir).inputFiles.length.toLong
    assert(filesRead < totalFiles,
      s"scan read $filesRead of $totalFiles files — no pruning happened")

    // values survive the partitioned round trip (partition column is
    // derived, originals intact)
    val expected = events.filter(
      col("ts") >= lit(s"$lo 00:00:00").cast("timestamp") &&
        col("ts") < lit(s"$hi 00:00:00").cast("timestamp")).count()
    assert(spark.read.parquet(dir)
      .filter(col("p_date") >= lit(lo) && col("p_date") < lit(hi)).count()
      === expected)

    // plan snapshot for review: the pruned q14-shaped scan
    val snap = graft.plans.PlanSnapshots.normalize(plan)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/warehouse_p_date_pruning.txt"), snap)
  }

  test("retentionDropPartitions composes with ctas output (same p_date convention)") {
    val dir = freshDir("dpart_ret")
    val d = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-02-15 10:00:00"),
      (3L, "2024-05-30 10:00:00")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    Tables.ctas(d, dir, partitionDateCol = Some("ts"))
    val dropped = Masking.retentionDropPartitions(spark, dir,
      java.time.LocalDate.parse("2024-06-01"), days = 90)
    assert(dropped.sorted === Seq("p_date=2024-01-01", "p_date=2024-02-15"))
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq
      === Seq(3L))
  }

  test("copyInto(partitionDateCol) lands per-day directories, stays exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("dpart_copy").toString
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()
    def stage(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$landing/$name"), lines.mkString("\n"))
    stage("a.json", Seq(
      """{"id": 1, "ts": "2024-01-01T08:00:00Z"}""",
      """{"id": 2, "ts": "2024-01-02T08:00:00Z"}"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val target = s"$base/target"
    val ledger = s"$base/ledger"
    val r1 = CopyInto.copyInto(spark, landing, ".*\\.json", schema,
      target, ledger, partitionDateCol = Some("ts"))
    assert(r1.map(_.row_count) === Seq(2L))
    val days1 = new java.io.File(target).listFiles.filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(days1 === Seq("p_date=2024-01-01", "p_date=2024-01-02"))

    // exactly-once: replaying the same stage loads nothing new
    assert(CopyInto.copyInto(spark, landing, ".*\\.json", schema,
      target, ledger, partitionDateCol = Some("ts")).isEmpty)
    assert(spark.read.parquet(target).count() === 2)

    // a later file APPENDS into existing and new day directories
    stage("b.json", Seq(
      """{"id": 3, "ts": "2024-01-02T20:00:00Z"}""",
      """{"id": 4, "ts": "2024-01-07T09:00:00Z"}"""))
    val r2 = CopyInto.copyInto(spark, landing, ".*\\.json", schema,
      target, ledger, partitionDateCol = Some("ts"))
    assert(r2.map(_.row_count) === Seq(2L))
    val days2 = new java.io.File(target).listFiles.filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(days2 === Seq("p_date=2024-01-01", "p_date=2024-01-02",
      "p_date=2024-01-07"))
    assert(spark.read.parquet(target)
      .filter(col("p_date") === lit("2024-01-02")).count() === 2)
  }
}
