package graft.ingest

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One ledger row per loaded file — the engine's analog of Snowflake's
  * load history + copy_history table function (A4:380-399, 692-712). */
case class LoadRecord(file_name: String, row_count: Long, status: String,
    load_ts: Timestamp)

/** S6/S7: `COPY INTO` from a staged-file landing directory —
  * pattern-filtered, idempotent, ledgered.
  *
  * Snowflake's COPY skips files its load history already ingested
  * (A4:519-526); here the ledger table provides that exactly-once-per-file
  * contract: list → anti-join against the ledger → load only new files →
  * append ledger. The listing is driver-side (a directory listing is
  * metadata-scale), but all parsing/writing is executor-parallel.
  * PURGE=TRUE ≡ `purge = true` deletes source files after commit
  * (batch_insert.py:66-73).
  */
object CopyInto {

  /** LIST @stage (S7): files in the landing dir matching the pattern
    * (A4:387 `.*cc_txn_.*\.json(\.gz)?$`). Full path strings, scheme
    * included — `toUri.getPath` would strip the scheme/authority and
    * make a later read resolve the bare path against the session's
    * DEFAULT filesystem, silently wrong for s3a://bucket stages. */
  def listStage(spark: SparkSession, landingDir: String,
      pattern: String): Seq[String] = {
    val p = new Path(landingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches(pattern))
      .map(_.getPath.toString).sorted
  }

  def ledger(spark: SparkSession, ledgerDir: String): DataFrame = {
    import spark.implicits._
    val p = new Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(ledgerDir)
    else spark.emptyDataset[LoadRecord].toDF()
  }

  /** COPY INTO: load every not-yet-loaded matching file into `targetDir`,
    * record each in the ledger, optionally purge sources. Returns the
    * newly loaded files. `onError` FAILFAST ≡ ABORT_STATEMENT.
    *
    * `partitionDateCol`: land the target date-partitioned
    * (`p_date = to_date(<col>)`, the [[graft.core.Tables]] warehouse
    * convention) — continuous ingest appends into per-day directories,
    * so downstream date-range scans prune at the partition level and
    * [[graft.pii.Masking.retentionDropPartitions]] expires whole days
    * without rewriting the table. */
  def copyInto(spark: SparkSession, landingDir: String, pattern: String,
      schema: StructType, targetDir: String, ledgerDir: String,
      format: String = "json", onError: String = "FAILFAST",
      purge: Boolean = false,
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
      partitionDateCol: Option[String] = None)
      : Seq[LoadRecord] = {
    import spark.implicits._
    val staged = listStage(spark, landingDir, pattern)
    if (staged.isEmpty) return Seq.empty
    // Load-history skip: anti-join the listing against the ledger. Both
    // sides are file-count-scale (metadata), so collect is bounded.
    val seen = ledger(spark, ledgerDir).select("file_name")
    val newFiles = staged.toDF("file_name")
      .join(seen, Seq("file_name"), "left_anti")
      .as[String].collect().toSeq.sorted
    if (newFiles.isEmpty) return Seq.empty

    val reader = spark.read.schema(schema).option("mode", onError)
    val df = format match {
      case "json"    => reader.json(newFiles: _*)
      case "parquet" => reader.parquet(newFiles: _*)
      case other     => sys.error(s"unsupported stage format: $other")
    }

    // Per-file row counts piggyback on the WRITE itself: one observe()
    // metric per file (count of rows whose input_file_name ends with
    // "/<basename>" — basenames are unique within one listed directory,
    // and the suffix match is URI-scheme-proof). One scan total: the
    // old groupBy(input_file_name) re-read every source file — doubled
    // ingest I/O at TB-scale landing dirs. Metric-column count scales
    // with the file batch, so very large batches fall back to caching
    // the parsed batch and counting from the cache (source still
    // scanned once). Counts are keyed by BASENAME in both branches —
    // input_file_name()'s URI rendering need not equal the listing's,
    // and it is percent-ENCODED (a space renders as %20), so both
    // branches decode it before matching; '+' is legal raw in a URI
    // path and must be shielded from the form-decoding '+'→space rule.
    //
    // Exactly-once caveat: the target append and the ledger append are
    // two commits; a crash between them re-loads this batch's files on
    // the next run (at-least-once for the interrupted batch only).
    // Closing that window needs transactional table metadata bare
    // parquet does not have; operators resuming after a mid-copy crash
    // should reconcile the target against the ledger's last rows.
    val counts: Map[String, Long] =
      if (newFiles.size <= 256) {
        val obs = org.apache.spark.sql.Observation()
        val decodedFile = url_decode(
          regexp_replace(input_file_name(), "\\+", "%2B"))
        val aggs = newFiles.zipWithIndex.map { case (f, i) =>
          count(when(decodedFile.endsWith("/" + new Path(f).getName),
            lit(1))).as(s"f$i")
        }
        appendTarget(df.observe(obs, aggs.head, aggs.tail: _*),
          targetDir, partitionDateCol)
        val m = obs.get
        newFiles.zipWithIndex
          .map { case (f, i) =>
            new Path(f).getName -> m(s"f$i").asInstanceOf[Long] }.toMap
      } else {
        // the filename is captured as a COLUMN before the persist: over
        // a cached relation input_file_name() evaluates against the
        // in-memory scan (no file context) and returns "", which would
        // count every file as 0 and crash the Path parse
        val withFile = df.withColumn("__src_file", input_file_name())
        withFile.persist()
        try {
          appendTarget(withFile.drop("__src_file"), targetDir,
            partitionDateCol)
          withFile.groupBy(col("__src_file"))
            .agg(count(lit(1)).as("n")).collect()
            .map(r => decodedBasename(r.getString(0)) -> r.getLong(1))
            .toMap
        } finally { withFile.unpersist(); () }
      }
    val records = newFiles.map { f =>
      LoadRecord(f, counts.getOrElse(new Path(f).getName, 0L), "LOADED",
        now())
    }
    spark.createDataset(records).toDF()
      .write.mode(SaveMode.Append).parquet(ledgerDir)

    if (purge) {
      val fs = new Path(landingDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      newFiles.foreach(f => fs.delete(new Path(f), false))
    }
    records
  }

  /** The target append, flat or date-partitioned — one definition so
    * the observe()-metrics branch and the cached-batch branch can never
    * land with different layouts. */
  private def appendTarget(df: org.apache.spark.sql.DataFrame,
      targetDir: String, partitionDateCol: Option[String]): Unit =
    partitionDateCol match {
      case Some(ts) => graft.core.Tables.withDatePartition(df, ts)
        .write.mode(SaveMode.Append)
        .partitionBy(graft.core.Tables.DatePartitionCol).parquet(targetDir)
      case None => df.write.mode(SaveMode.Append).parquet(targetDir)
    }

  /** Filesystem basename of input_file_name()'s URI rendering: strip
    * to the leaf, shield raw '+' (legal in a URI path) from the
    * form-decoding '+'→space rule, decode the %XX escapes. */
  private def decodedBasename(uriString: String): String =
    java.net.URLDecoder.decode(
      uriString.substring(uriString.lastIndexOf('/') + 1)
        .replace("+", "%2B"),
      java.nio.charset.StandardCharsets.UTF_8)

  /** copy_history(...) observability queries (A4:706-712, ST11): volume
    * accounting over the ledger. */
  def copyHistory(spark: SparkSession, ledgerDir: String): DataFrame =
    ledger(spark, ledgerDir)
      .groupBy("status")
      .agg(count(lit(1)).as("n_files"), sum("row_count").as("n_rows"),
        max("load_ts").as("last_load_ts"))
}
