package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - every stage is a native-expression projection or a key-partitioned
  *    shuffle — no driver-side collection, no UDFs;
  *  - candidate generation is LSH-bucketed so the only self-join runs on
  *    (band, bucket) keys, never all-pairs;
  *  - signatures are fixed-width arrays of longs (64 hashes ≈ 512 B/doc),
  *    so the shuffle volume is signature-sized, not document-sized.
  */
object Dedup {

  // ---- exact ----

  /** Exact dedup: one survivor (min id) per normalized-text fingerprint.
    * Hash-partitioned group-by; partial aggregation makes the shuffle
    * carry one row per (fingerprint, partition). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFns.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  // ---- MinHash + LSH ----

  /** Word k-shingles, distinct. Short docs (< k tokens) fall back to the
    * whole token array as one shingle so they still get a signature. */
  def shingles(textCol: Column, k: Int = 3): Column = {
    val toks = TextFns.tokens(textCol)
    array_distinct(
      when(size(toks) < k, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(1), size(toks) - lit(k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k))))))
  }

  /** MinHash signature: numHashes permutations approximated by seeding
    * xxhash64 with the hash index (the standard single-hash-family trick,
    * cf. Broder '97). Output: array<long> of length numHashes. */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(i, s))))

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows; docs sharing any band bucket are candidates.
    * With 64 hashes / 16 bands (r=4), the S-curve puts the match
    * threshold near jaccard ≈ (1/16)^(1/4) ≈ 0.5. */
  def bandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Candidate pairs via LSH: explode band keys, self-join per
    * (band, bucket), dedupe pairs. The join is a shuffle on the band-key
    * hash — bounded by bucket sizes, never |docs|². */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val r = numHashes / bands
    val sig = docs.select(col(idCol).as("id"),
      minhashSignature(shingles(col(textCol), k), numHashes).as("sig"))
    val exploded = sig.select(col("id"),
        posexplode(bandKeys(col("sig"), bands, r)).as(Seq("band", "bucket")))
    exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs, verified: candidates from LSH, then exact
    * Jaccard over the true shingle sets, keep pairs ≥ threshold. */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
    val cands = lshCandidatePairs(docs, idCol, textCol, k, numHashes, bands)
    cands
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash ----

  /** Distinct-token xxhash64 array — the SimHash input. */
  def tokenHashes(textCol: Column): Column =
    transform(array_distinct(TextFns.tokens(textCol)), t => xxhash64(t))

  /** 64-bit SimHash from a token-hash array column named `__th`: per bit,
    * sign of the summed ±1 contributions across token hashes, bits then
    * assembled into one long (bit 63 lands on the sign bit — well-defined
    * two's-complement, shifts don't overflow-check under ANSI).
    * expr-based because the Scala API's shiftleft/shiftright take only
    * literal shift amounts, and here the amount is the lambda variable. */
  private val simhashFromHashes: Column = expr(
    """aggregate(
      |  zip_with(
      |    transform(sequence(0, 63), b ->
      |      case when aggregate(__th, cast(0 as bigint),
      |        (acc, h) -> acc + (cast(shiftrightunsigned(h, b) & 1 as bigint) * 2 - 1)) > 0
      |      then 1 else 0 end),
      |    sequence(0, 63),
      |    (bit, i) -> if(bit = 1, shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
      |  cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin)

  /** id → 64-bit SimHash fingerprint. */
  def withSimhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), tokenHashes(col(textCol)).as("__th"))
      .select(col("id"), simhashFromHashes.as("fp"))

  /** Near-dup pairs by SimHash: block on the four 16-bit chunks of the
    * fingerprint (any shared chunk → candidate; by pigeonhole this
    * catches every pair with hamming distance ≤ 3), then verify with
    * bit_count(xor). The self-join shuffles on (chunk_idx, chunk). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withFp = withSimhash(docs, idCol, textCol)
    val chunkCols = (0 until 4).map(i =>
      struct(lit(i).as("chunk_idx"),
        shiftrightunsigned(col("fp"), 16 * i).bitwiseAND(lit(0xFFFFL)).as("chunk")))
    val chunks = withFp.select(col("id"), col("fp"),
        explode(array(chunkCols: _*)).as("c"))
      .select(col("id"), col("fp"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---- n-gram Jaccard (blocked) ----

  /** Pairwise n-gram Jaccard with cheap blocking (docs sharing their
    * first token are compared). At scale the blocking key should be an
    * LSH band ([[lshCandidatePairs]]); this variant is the transparent,
    * oracle-checkable baseline. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      get(TextFns.tokens(col(textCol)), lit(0)).as("blk"),
      shingles(col(textCol), k).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("jaccard", round(
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }
}
