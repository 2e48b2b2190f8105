package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** One (band, bucket) arrival: a document's hashed shingle set routed to
  * one of its LSH band buckets. */
private[streaming] case class DocArrival(doc_id: Long, ts: Timestamp,
    hs: Array[Long], band: Int, bucket: Long)
private[streaming] case class BucketDoc(id: Long, tsMs: Long, hs: Array[Long])
private[streaming] case class BucketState(docs: List[BucketDoc])

/** A verified near-dup pair emitted by [[StreamNearDup.candidatePairs]].
  * The same pair can surface from several bands (one per colliding
  * band); dedupe downstream on (id_a, id_b) — kept per-band here so the
  * emission is exactly-once PER GROUP, which is all a keyed-state
  * operator can guarantee without cross-group coordination. */
case class NearDupPair(id_a: Long, id_b: Long, jaccard: Double, band: Int)

/** Streaming MinHash+LSH near-dup detection — the streaming twin of
  * [[graft.operators.Dedup.minhashDedupPairs]]: as documents arrive,
  * each is signed, banded, and compared against the documents already
  * resident in its LSH buckets; verified-Jaccard pairs stream out the
  * moment the second document of a pair lands.
  *
  * State shape (the 100 TB/day argument): one entry per (band, bucket)
  * holding the hashed shingle sets of that bucket's documents inside
  * the `horizonMinutes` event-time window — NOT the corpus. The
  * watermark-driven event-time timeout evicts buckets wholesale, so
  * state is bounded by (arrival rate × horizon), same discipline as
  * [[Sessionize]]. The bucket fan-out is `bands` rows per document —
  * signature-sized (8 B × numHashes + shingle hashes), never the text.
  * The horizon is also enforced per COMPARISON (not only at eviction),
  * so the emitted pair set is a pure function of the data, independent
  * of micro-batch chunking.
  *
  * The per-row signature ([[StreamNearDup.rowSignature]]) is
  * bit-identical to the batch aggregate's lanes (same (lane, hash) →
  * xxhash64 → min), so the streaming detector finds exactly the pairs
  * the batch operator finds over the same horizon (StreamNearDupSpec
  * asserts set equality vs the batch twin).
  */
object StreamNearDup {

  /** Per-row MinHash signature over a hashed-shingle array column —
    * lane i = min over shingles of xxhash64(i, h), identical to the
    * batch aggregation in [[Dedup.signaturesFromHashes]]. */
  def rowSignature(hsCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(hsCol, h => xxhash64(i, h))))

  /** Start-to-emit pipeline: watermark → shingle/sign/band (pure
    * projections, no streaming aggregate) → keyed bucket state →
    * verified pairs. `threshold` gates on EXACT Jaccard over the hashed
    * shingle sets, so precision matches the batch operator; recall is
    * the banding S-curve plus the horizon (pairs farther apart than
    * `horizonMinutes` in event time are not compared). */
  def candidatePairs(docs: DataFrame, idCol: String, tsCol: String,
      textCol: String, threshold: Double = 0.5, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16, watermark: String = "10 minutes",
      horizonMinutes: Int = 60,
      maxBucket: Int = Dedup.DefaultMaxBucket): Dataset[NearDupPair] = {
    require(numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    require(maxBucket >= 1, s"maxBucket ($maxBucket) must be >= 1")
    import docs.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60000L
    val arrivals = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        Dedup.hashedShingles(col(textCol), k).as("hs"))
      // no shingle-less rows exist: ShingleHashes hashes the whole text
      // as one shingle when a doc has fewer than k tokens, so even an
      // empty/whitespace doc carries exactly one hash — all empties form
      // ONE exact-duplicate family (Jaccard 1.0), same as the batch
      // twin. A flood of them is precisely the hot-bucket case the
      // maxBucket star fallback below bounds.
      .select(col("doc_id"), col("ts"), col("hs"),
        posexplode(Dedup.bandKeys(rowSignature(col("hs"), numHashes),
          bands, numHashes / bands)).as(Seq("band", "bucket")))
      .as[DocArrival]
    arrivals
      .groupByKey(a => (a.band, a.bucket))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), it: Iterator[DocArrival], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          var resident = state.getOption.map(_.docs).getOrElse(Nil)
          val out = List.newBuilder[NearDupPair]
          // deterministic intra-batch order; each arrival is compared
          // against everything already resident (prior batches AND
          // earlier arrivals of this batch) — each unordered pair meets
          // exactly once per colliding band
          it.toSeq.sortBy(a => (a.ts.getTime, a.doc_id)).foreach { a =>
            val aSet = a.hs.toSet
            // hot-bucket guard, the batch operator's star fallback
            // (Dedup.cappedCliqueAndStar) in stream form: a bucket at
            // the cap compares new arrivals against its REPRESENTATIVE
            // (min-id resident) only and stops growing state — a
            // boilerplate template family degrades to O(|family|)
            // rep-member comparisons instead of O(|family|²), at the
            // same recall trade the batch cap documents. Divergence
            // from the batch twin is honest and bounded: the cap binds
            // on arrival order here vs final bucket size there, and
            // only inside overflowed (near-identical) families.
            val overCap = resident.lengthCompare(maxBucket) >= 0
            val compareSet =
              if (overCap) resident.minBy(_.id) :: Nil else resident
            compareSet.foreach { b =>
              // the horizon is a SEMANTIC gate, not just an eviction
              // policy: without it the comparison set would depend on
              // how arrivals chunk into micro-batches (a doc older than
              // the horizon can still be resident if the watermark
              // hasn't sealed it yet)
              if (b.id != a.doc_id &&
                  math.abs(a.ts.getTime - b.tsMs) <= horizonMs) {
                val inter = b.hs.count(aSet.contains)
                val j = inter.toDouble / (a.hs.length + b.hs.length - inter)
                if (j >= threshold) {
                  val (lo, hi) =
                    if (a.doc_id < b.id) (a.doc_id, b.id) else (b.id, a.doc_id)
                  out += NearDupPair(lo, hi,
                    BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                      .toDouble, band)
                }
              }
            }
            if (!overCap)
              resident = BucketDoc(a.doc_id, a.ts.getTime, a.hs) :: resident
          }
          // evict what the watermark has sealed out of the horizon; an
          // empty bucket drops its state entry entirely
          val kept = resident.filter(_.tsMs + horizonMs > wm)
          if (kept.isEmpty) state.remove()
          else {
            state.update(BucketState(kept))
            state.setTimeoutTimestamp(kept.map(_.tsMs).min + horizonMs)
          }
          out.result().iterator
      }
  }
}
