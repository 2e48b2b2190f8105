package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The export half of a training-data pipeline: after ingest → filter →
  * dedup → mix → split, the corpus leaves the warehouse as SHARDS a
  * training job streams — fixed shard count, deterministic membership,
  * reproducible within-shard order, and a manifest the loader trusts
  * instead of listing files.
  *
  * Everything keys off md5(id) like the [[Sampling]] tier, so the
  * export is stable across runs, partitionings, cluster sizes, and
  * engines: re-exporting an unchanged corpus yields byte-identical
  * shard contents, and a document can never migrate between shards —
  * the property that makes checkpointed training resumable against a
  * re-exported corpus.
  */
object Export {

  /** Deterministic shard id in [0, nShards): md5(id) 8-hex-digit bucket
    * mod nShards — uniform, engine-replayable, independent of input
    * partitioning. */
  def shardOf(id: org.apache.spark.sql.Column, nShards: Int)
      : org.apache.spark.sql.Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))

  /** Export `df` as `nShards` parquet shards under `dir`
    * (`shard=K/` directories, ONE file per shard), each shard
    * internally ordered by (md5(id), id) — the deterministic "global
    * shuffle" a training epoch reads: documents arrive in a fixed
    * pseudo-random order with no coordination and no RNG state, and
    * every re-export reproduces it exactly. Beside the data, a
    * `_manifest` table (shard, n_rows, min/max id — underscore-prefixed
    * so corpus readers skip it) commits the loader's contract.
    *
    * Scale shape: one hash-partition exchange on the shard id (the
    * write's task layout IS the shard layout — no small-file pile, no
    * post-compaction), sort local to each shard task. One writer task
    * per shard: pick nShards ≈ the cluster's write parallelism at the
    * target shard size (a few hundred MB each), not thousands of
    * slivers. Returns the manifest. */
  def exportShards(df: DataFrame, idCol: String, dir: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards ($nShards) must be >= 1")
    val spark = df.sparkSession
    val sharded = df
      .withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("__ord", md5(col(idCol).cast("string")))
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), col(idCol))
      .drop("__ord")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    // manifest from the WRITTEN files, not the input lineage: the
    // input may be the tail of a whole dedup/mix pipeline, and
    // re-aggregating `sharded` would execute that pipeline a second
    // time just to count rows — the written tree is a cheap
    // column-pruned scan AND is the artifact the manifest certifies
    val manifest = spark.read.parquet(dir)
      // partition-dir discovery narrows the written long to int —
      // restore shardOf's type so the manifest schema is build-stable
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_manifest")
    manifest.orderBy("shard")
  }

  /** Read one exported shard in its committed order — the loader side:
    * a partition-pruned scan of `shard=K` re-sorted by the same
    * (md5(id), id) key. A GLOBAL orderBy, not sortWithinPartitions: a
    * shard file bigger than maxPartitionBytes is scanned as several
    * splits whose relative order follows the scan packer, so a
    * within-split sort alone would leave the cross-split order an
    * accident — exactly what the committed-order contract exists to
    * rule out. One shard is loader-sized; the range exchange is
    * cheap. */
  def readShard(spark: SparkSession, dir: String, shard: Int,
      idCol: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("shard") === shard)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
}
