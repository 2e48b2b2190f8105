package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.gen.{CarCatalog, OrderGenerator}
import graft.ingest.JsonBatchLoader
import graft.query.{Explorer, OrderFilters}

class ExplorerSpec extends SparkSuite {
  import spark.implicits._

  private lazy val flat = Explorer.flatten(
    OrderGenerator.enrich(
      OrderGenerator.rawOrders(spark, 1000, seed = 42),
      CarCatalog.df(spark))).cache()

  test("flatten exposes nested PII fields under app aliases (P2)") {
    assert(flat.columns.toSeq.contains("STREET_ADDRESS"))
    assert(flat.filter($"STATE".isNotNull).count() > 0)
  }

  test("dynamic filter chain composes widget predicates (P4-P8)") {
    val all = flat.count()
    val brand = CarCatalog.specs.head.brand
    val f1 = Explorer.applyFilters(flat, OrderFilters(brands = Seq(brand)))
    assert(f1.count() > 0 && f1.count() < all)
    assert(f1.filter($"BRAND" =!= brand).count() === 0)

    val f2 = Explorer.applyFilters(flat,
      OrderFilters(hpRange = Some((100L, 200L))))
    assert(f2.filter($"HORSEPOWER" < 100 || $"HORSEPOWER" > 200).count() === 0)

    // filters compose conjunctively
    val f3 = Explorer.applyFilters(flat,
      OrderFilters(brands = Seq(brand), hpRange = Some((100L, 200L))))
    assert(f3.count() <= math.min(f1.count(), f2.count()))

    // search hits NAME case-insensitively
    val f4 = Explorer.applyFilters(flat, OrderFilters(search = Some("ada")))
    assert(f4.count() > 0)
    assert(f4.filter(lower($"NAME").contains("ada") ||
      lower($"EMAIL").contains("ada") || lower($"PHONE").contains("ada") ||
      lower($"RFID").contains("ada")).count() === f4.count())
  }

  test("metric tiles compute the monitoring aggregates in one pass (A5/A6)") {
    val t = Explorer.metricTiles(flat).collect()(0)
    assert(t.getAs[Long]("TOTAL_ORDERS") === 1000L)
    assert(t.getAs[Double]("AVG_DAYS") > 3.5 && t.getAs[Double]("AVG_DAYS") < 4.5)
    assert(t.getAs[Long]("UNIQUE_CUSTOMERS") > 0)
  }

  test("segment top-k and widget metadata queries (A2/O4/A7/A5)") {
    val top = Explorer.ordersBySegment(flat, "BRAND", 5).collect()
    assert(top.length === 5)
    assert(top.map(_.getAs[Long]("ORDERS")).toSeq ===
      top.map(_.getAs[Long]("ORDERS")).sortBy(-_).toSeq)
    val dv = Explorer.distinctValues(flat, "ENGINE").as[String].collect()
    assert(dv.toSeq === dv.toSeq.sorted && dv.length <= 200)
    val b = Explorer.bounds(flat, "HORSEPOWER").collect()(0)
    assert(b.getAs[Long]("MIN") <= b.getAs[Long]("MAX"))
  }

  test("preview caps rows and selects the chosen columns (P11/O5)") {
    val p = Explorer.preview(flat, Seq("TXID", "BRAND"), 50)
    assert(p.columns.toSeq === Seq("TXID", "BRAND"))
    assert(p.count() === 50)
    // the 10k hard cap holds even for bigger asks
    assert(Explorer.preview(flat, Seq("TXID"), 999999).count() === 1000)
  }

  test("CSV export round-trips the preview (S11)") {
    val dir = Files.createTempDirectory("csv").toString + "/out"
    Explorer.exportCsv(Explorer.preview(flat, Seq("TXID", "BRAND"), 20), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 20)
    assert(back.columns.toSeq === Seq("TXID", "BRAND"))
  }

  test("warehouse ops: CTAS, CREATE LIKE, single-row insert (S9/S10)") {
    val base = Files.createTempDirectory("wh").toString
    Tables.ctas(flat.select("TXID", "BRAND"), s"$base/t1")
    assert(spark.read.parquet(s"$base/t1").count() === 1000)

    Tables.createLike(spark, flat.select("TXID", "BRAND"), s"$base/t2")
    val like = spark.read.parquet(s"$base/t2")
    assert(like.count() === 0)
    // parquet re-reads relax nullability; names+types are the contract
    assert(like.schema.map(f => (f.name, f.dataType)) ===
      flat.select("TXID", "BRAND").schema.map(f => (f.name, f.dataType)))

    Tables.insertRow(spark, s"$base/t2",
      org.apache.spark.sql.Row("tx-1", "B"), like.schema)
    assert(spark.read.parquet(s"$base/t2").count() === 1)
  }

  test("outer-array JSON files strip to rows (S3)") {
    val dir = Files.createTempDirectory("arr").toString
    val recs = OrderGenerator.enrich(
      OrderGenerator.rawOrders(spark, 5, seed = 3), CarCatalog.df(spark))
      .toJSON.collect()
    Files.write(java.nio.file.Paths.get(dir, "batch.json"),
      recs.mkString("[", ",", "]").getBytes)
    val back = JsonBatchLoader.readJsonArray(spark, dir,
      JsonBatchLoader.orderSchema)
    assert(back.count() === 5)
    assert(back.filter($"txid".isNull).count() === 0)
  }

  test("summaryTable: TTL result cache serves-while-fresh, refreshes-when-stale") {
    var clock = 0L
    var builds = 0
    val dir = Files.createTempDirectory("summary").toString + "/sales_summary"
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    // first read materializes
    assert(Tables.summaryTable(spark, dir, 300, () => clock)(build).count() === 2)
    assert(builds === 1)
    // inside the TTL window: served from the table, no rebuild
    clock = 200_000L
    Tables.summaryTable(spark, dir, 300, () => clock)(build).count()
    assert(builds === 1)
    // past the TTL: rebuilt + atomically swapped
    clock = 400_000L
    Tables.summaryTable(spark, dir, 300, () => clock)(build).count()
    assert(builds === 2)
  }

  test("summaryRefreshTask wires scheduled refresh into a TaskGraph") {
    import java.sql.Timestamp
    var clock = 1_000_000L
    var builds = 0
    val dir = Files.createTempDirectory("summary_task").toString + "/hourly"
    def build = { builds += 1; Seq((builds, "x")).toDF("n", "v") }
    val g = new graft.flow.TaskGraph(() => new Timestamp(clock))
    g.add(Tables.summaryRefreshTask(spark, "refresh_hourly", dir, 600)(build))
    g.resume("refresh_hourly")
    g.tick(); assert(builds === 1)
    clock += 1_000 // not due yet
    g.tick(); assert(builds === 1)
    clock += 700_000 // past the 600 s interval — refreshes and swaps
    g.tick(); assert(builds === 2)
    assert(spark.read.parquet(dir).head.getInt(0) === 2)
    assert(g.history.count(_.status == "SUCCEEDED") === 2)
  }
}
