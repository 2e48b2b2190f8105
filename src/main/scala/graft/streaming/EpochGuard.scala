package graft.streaming

import org.apache.spark.sql.SparkSession

/** Checkpoint-reset detector for the per-epoch delta maintainers
  * ([[StreamIndexAppend]], [[StreamTokenStats]]): their exactly-once
  * story is "a crash-REPLAYED epoch overwrites its own `batch=<id>`
  * directory" — but foreachBatch only ever replays the HIGHEST
  * uncommitted epoch, so a batch id BELOW the highest epoch already on
  * disk cannot be a replay. It means the stream restarted against a
  * fresh or reset checkpoint whose ids restart at 0, and the overwrite
  * would destroy an old epoch's committed rows with unrelated new data
  * while every run looks SUCCEEDED. Fail loudly instead (the
  * [[StreamRollup]] marker discipline, derived here from the epoch
  * directory names — no extra marker file needed). */
private[streaming] object EpochGuard {

  /** Throws if `batchId` is below the highest `batch=<id>` epoch under
    * `deltasDir`. A missing deltas tree (fresh index, or just
    * compacted) passes trivially. */
  def check(spark: SparkSession, deltasDir: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(deltasDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val maxEpoch = fs.listStatus(p).iterator
        .map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .flatMap(n =>
          scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
        .foldLeft(-1L)(math.max)
      require(batchId >= maxEpoch,
        s"streaming epoch $batchId is below the newest delta epoch " +
          s"$maxEpoch under $deltasDir — the streaming checkpoint was " +
          "reset or replaced; restore it, or move the old delta tree " +
          "aside (compact it into the base) before pointing a new " +
          "stream at this index")
    }
  }
}
