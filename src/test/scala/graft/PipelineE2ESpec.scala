package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.dq.DqChecks
import graft.flow.{Every, TaskDef, TaskGraph}
import graft.gen.{CarCatalog, OrderGenerator}
import graft.ingest.JsonBatchLoader
import graft.streaming.PipeStream

/** The reference's end-to-end pipeline (A4: GENERATE → LOAD → REFINE →
  * DQ task chain, A4:506-545 + 865-871) composed from our pieces:
  * deterministic generator → staged JSON files → checkpointed streaming
  * load (exactly-once) → typed refinement → DQ metrics — all orchestrated
  * by the synchronous TaskGraph.
  */
class PipelineE2ESpec extends SparkSuite {
  import spark.implicits._

  test("generate → load → refine → DQ chain, incremental and exactly-once") {
    val landing = Files.createTempDirectory("e2e_landing").toString
    val staging = Files.createTempDirectory("e2e_staging").toString + "/t"
    val typed = Files.createTempDirectory("e2e_typed").toString + "/t"
    val cp = Files.createTempDirectory("e2e_cp").toString + "/cp"
    val metricsDir = Files.createTempDirectory("e2e_metrics").toString + "/m"

    var now = Timestamp.valueOf("2024-01-01 00:00:00")
    var gen = 0
    val g = new TaskGraph(() => now)

    g.add(TaskDef("generate", Some(Every(60)), body = () => {
      // one staged file per run, 50 seeded orders each (ST14 analog)
      val batch = OrderGenerator.enrich(
        OrderGenerator.rawOrders(spark, 50, seed = 100 + gen),
        CarCatalog.df(spark)).toJSON.collect()
      Files.write(Paths.get(landing, f"cc_txn_$gen%03d.json"),
        batch.mkString("\n").getBytes)
      gen += 1
    }))
    g.add(TaskDef("load", after = Seq("generate"), body = () =>
      PipeStream.drain(spark, landing, JsonBatchLoader.orderSchema,
        staging, cp, pattern = Some("cc_txn_*.json"))))
    g.add(TaskDef("refine", after = Seq("load"), body = () => {
      // stream-consume semantics: only INSERT actions, typed projection
      spark.read.parquet(staging)
        .filter($"_action" === "INSERT")
        .select(JsonBatchLoader.orderSchema.fieldNames.map(col).toSeq: _*)
        .write.mode("overwrite").parquet(typed)
    }))
    g.add(TaskDef("dq", after = Seq("refine"), body = () =>
      DqChecks.metricsBatch(spark.read.parquet(typed), "orders", Seq(
          "non_null_txid" -> $"txid".isNotNull,
          "valid_days" -> $"days".between(1, 7)))
        .withColumn("computed_at", lit(now))
        .write.mode("append").parquet(metricsDir)))
    Seq("generate", "load", "refine", "dq").foreach(g.resume(_))

    g.executeNow("generate")
    assert(spark.read.parquet(typed).count() === 50)

    now = new Timestamp(now.getTime + 120 * 1000)
    g.tick() // second cycle: one more file, incremental load
    assert(spark.read.parquet(typed).count() === 100)
    // staged files loaded exactly once despite two drains over the dir
    assert(spark.read.parquet(staging).count() === 100)

    // DQ metrics accumulated per cycle; all ratios are 1.0 on clean data
    val m = spark.read.parquet(metricsDir)
    assert(m.count() === 4) // 2 metrics × 2 cycles
    assert(m.filter($"metric_value" =!= 1.0).count() === 0)
    // the whole chain ran twice, every stage SUCCEEDED
    assert(g.history.count(_.status == "SUCCEEDED") === 8)
  }
}
