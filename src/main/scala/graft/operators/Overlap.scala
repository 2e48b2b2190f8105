package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-partition corpus overlap: pairwise n-gram Jaccard between the
  * groups of a corpus (sources, crawls, snapshot versions) — the
  * provenance screen a training-data audit runs before mixing sources:
  * two "independent" crawls with jaccard 0.4 are one crawl counted
  * twice, and a source that overlaps an eval suite's provider is a leak
  * channel.
  *
  * Scale shape: the unit of work is the distinct (group, gram-hash)
  * posting — documents collapse into their group's gram SET first (one
  * map-side-combinable distinct), so corpus size only enters through
  * the distinct-gram count per group. The self-join keys on the 8-byte
  * gram hash; a gram's fan-out is bounded by the number of GROUPS that
  * contain it (squared), never by document frequency — with G groups
  * the join emits at most G²/2 rows per gram and the result is the
  * G×G upper triangle. Hashing trades string shuffles for 64-bit keys
  * at ~1e-15 collision odds per pair (the [[Dedup.hashedShingles]]
  * contract). */
object Overlap {

  /** Pairwise overlap matrix between values of `groupCol`:
    * (src_a, src_b, n_a, n_b, n_shared, jaccard), one row per unordered
    * group pair sharing at least one k-token shingle. */
  def sourceOverlap(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, k: Int = 3): DataFrame = {
    val gs = Caches.spreadByKey(docs, col(idCol))
      .select(col(groupCol).as("grp"),
        explode(Dedup.hashedShingles(col(textCol), k)).as("s"))
      .distinct()
    Caches.scoped(gs) {
      val sizes = gs.groupBy("grp").agg(count(lit(1)).as("sz"))
      gs.as("a").join(gs.as("b"),
          col("a.s") === col("b.s") && col("a.grp") < col("b.grp"))
        .groupBy(col("a.grp").as("src_a"), col("b.grp").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("grp").as("src_a"), col("sz").as("n_a")), "src_a")
        .join(sizes.select(col("grp").as("src_b"), col("sz").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("n_shared"),
          round(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 4).as("jaccard"))
    }
  }
}
