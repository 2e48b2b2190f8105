package graft.streaming

import java.nio.file.Files

/** The delta maintainers' checkpoint-reset detector: a foreachBatch
  * replay only ever re-delivers the HIGHEST uncommitted epoch, so a
  * batch id below the newest `batch=<id>` directory on disk means the
  * stream restarted on a fresh checkpoint — the per-epoch overwrite
  * would destroy a committed old epoch with unrelated new data. */
class EpochGuardSpec extends graft.SparkSuite {

  test("a batch id below the newest delta epoch is a reset, not a replay") {
    val dir = Files.createTempDirectory("epoch_guard").toString
    // no delta tree yet (fresh index, or just compacted): all ids pass
    EpochGuard.check(spark, s"$dir/deltas", 0L)
    new java.io.File(s"$dir/deltas/batch=5").mkdirs()
    EpochGuard.check(spark, s"$dir/deltas", 5L) // replay of the newest
    EpochGuard.check(spark, s"$dir/deltas", 6L) // the next epoch
    val e = intercept[IllegalArgumentException](
      EpochGuard.check(spark, s"$dir/deltas", 3L))
    assert(e.getMessage.contains("reset"))
    // non-epoch residue in the tree is ignored, not parsed
    new java.io.File(s"$dir/deltas/_spark_metadata").mkdirs()
    EpochGuard.check(spark, s"$dir/deltas", 5L)
  }
}
