package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dq.DqChecks

/** Streaming distribution-drift monitor — the continuous twin of the
  * batch PSI screen ([[graft.dq.DqChecks.psiDrift]], declared query
  * g16): bin the live stream against a FROZEN baseline yardstick and
  * read the PSI gauge from the running counts whenever needed.
  *
  * Split of labor, by design:
  *  - [[yardstick]] runs ONCE, batch-side, over the baseline corpus:
  *    per-group bin edges and per-bin baseline counts — groups × nBins
  *    rows, broadcastable forever after;
  *  - [[binnedCounts]] is the only STREAMING aggregation: the incoming
  *    rows join the broadcast yardstick, bin with the exact batch
  *    binning expression ([[DqChecks.psiBin]]), and count per
  *    (group, bin) — state is groups × nBins running longs, CONSTANT in
  *    stream length (the reason a drift monitor can run for months);
  *  - [[psi]] turns a snapshot of those counts into the same
  *    (group, n_base, n_cur, psi) report the batch screen emits, via
  *    the shared [[DqChecks.psiFromSlots]] core — StreamDriftSpec
  *    asserts the streamed gauge equals the batch screen on identical
  *    rows, bit for bit.
  *
  * Rows whose group has no baseline yardstick are dropped (nothing to
  * compare against), exactly like the batch screen. */
object StreamDrift {

  /** The frozen baseline: per-group bin edges plus per-bin baseline
    * counts — (group, __lo, __hi, __bin, __nb), every bin present. */
  def yardstick(baseline: DataFrame, groupCol: String, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins ($nBins) must be >= 2")
    val stats = baseline.groupBy(groupCol)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val counts = baseline.join(broadcast(stats), groupCol)
      .withColumn("__bin",
        DqChecks.psiBin(col(valueCol), col("__lo"), col("__hi"), nBins))
      .groupBy(groupCol, "__bin").agg(count(lit(1)).as("__nb"))
    stats
      .select(col(groupCol), col("__lo"), col("__hi"),
        explode(sequence(lit(0), lit(nBins - 1))).as("__bin"))
      .join(counts, Seq(groupCol, "__bin"), "left")
      .select(col(groupCol), col("__lo"), col("__hi"), col("__bin"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
  }

  /** The streaming aggregation: per-(group, bin) running counts of the
    * live side. Attach to `readStream` input and write with
    * outputMode("complete") (or "update" into an upserting sink) — the
    * result IS the monitor's state, groups × nBins rows. The bin count
    * comes FROM the yardstick (max bin + 1, one bounded lookup at
    * setup): a caller-supplied nBins that disagreed with the yard's
    * would silently misalign every bin and gauge spurious drift. */
  def binnedCounts(stream: DataFrame, yard: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    // null-safe: an EMPTY yardstick (baseline had no rows yet) must
    // wire up to an empty-count monitor, not NPE on the null max
    val maxBin = yard.agg(max(col("__bin"))).head
    val nBins = (if (maxBin.isNullAt(0)) 0 else maxBin.getInt(0)) + 1
    val edges = yard.select(col(groupCol), col("__lo"), col("__hi"))
      .distinct()
    stream.join(broadcast(edges), groupCol)
      .withColumn("__bin",
        DqChecks.psiBin(col(valueCol), col("__lo"), col("__hi"), nBins))
      .filter(col("__bin").isNotNull)
      .groupBy(groupCol, "__bin").agg(count(lit(1)).as("__nc"))
  }

  /** The gauge: PSI per group from the yardstick and a snapshot of the
    * streaming counts — same smoothing, same ordered-fold sum, same
    * output shape as the batch screen. Cheap (groups × nBins rows);
    * run it per trigger, per dashboard refresh, or per alert check.
    * Slot-shape-agnostic: works over the numeric yardstick's int bins
    * AND the categorical yardstick's category strings. */
  def psi(yard: DataFrame, currentCounts: DataFrame,
      groupCol: String): DataFrame = {
    val slots = yard.select(col(groupCol), col("__bin"), col("__nb"))
      .join(currentCounts, Seq(groupCol, "__bin"), "left")
      .select(col(groupCol), col("__bin"), col("__nb"),
        coalesce(col("__nc"), lit(0L)).as("__nc"))
    DqChecks.psiFromSlots(slots, groupCol)
  }

  // ---- categorical twin (batch screen: DqChecks.psiDriftCategorical,
  //      declared query g17) ----

  /** The frozen categorical baseline: per-(group, category) counts plus
    * the `__OTHER__` slot that absorbs categories the baseline never
    * saw — (group, __bin, __nb), the exact slot dictionary the batch
    * screen builds. Nulls normalize to `__NULL__`. Groups × categories
    * rows: broadcast-scale forever after. */
  def catYardstick(baseline: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val cat = coalesce(col(catCol).cast("string"), lit("__NULL__"))
    val base = baseline.groupBy(col(groupCol), cat.as("__bin"))
      .agg(count(lit(1)).as("__nb"))
    base.unionByName(base.select(col(groupCol)).distinct()
      .withColumn("__bin", lit("__OTHER__"))
      .withColumn("__nb", lit(0L)))
  }

  /** The streaming aggregation for the class-mix monitor: live rows
    * slot into their baseline category (or `__OTHER__` when the
    * baseline never saw it — that appearance IS drift and must carry
    * mass), then count per (group, slot). State is groups × categories
    * running longs, constant in stream length; rows whose group has no
    * yardstick are dropped like the numeric monitor. Write with
    * outputMode("complete") (or "update" into an upserting sink). */
  def catBinnedCounts(stream: DataFrame, yard: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val known = yard.filter(col("__bin") =!= lit("__OTHER__"))
      .select(col(groupCol), col("__bin").as("__cat"), lit(1).as("__known"))
    stream
      .select(col(groupCol),
        coalesce(col(catCol).cast("string"), lit("__NULL__")).as("__cat"))
      // yardstick-less groups are dropped HERE (not at gauge time) so
      // the running state never grows with unscored groups
      .join(broadcast(yard.select(col(groupCol)).distinct()),
        Seq(groupCol), "inner")
      .join(broadcast(known), Seq(groupCol, "__cat"), "left")
      .withColumn("__bin",
        when(col("__known").isNotNull, col("__cat"))
          .otherwise(lit("__OTHER__")))
      .groupBy(groupCol, "__bin").agg(count(lit(1)).as("__nc"))
  }
}
