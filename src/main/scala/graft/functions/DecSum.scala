package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** THE cross-engine determinism recipe for floating aggregates, in one
  * place: quantize each per-row term to 6 decimals, sum as
  * DECIMAL(38,6) — exact integer-scaled addition, so the total is
  * independent of partitioning, row order, and engine — then return
  * DOUBLE. Every oracle spells out the same
  * `CAST(SUM(CAST(ROUND(term, 6) AS DECIMAL(38,6))) AS DOUBLE)` text.
  * Changing the scale or rounding mode here MUST be mirrored in every
  * oracle; that single point of change is why this is shared rather
  * than re-derived per operator ([[graft.operators.Pca]],
  * [[graft.operators.Tfidf]]). */
object DecSum {

  val dec386: DecimalType = DecimalType(38, 6)

  /** Partition-order-independent sum of 6dp-rounded terms. */
  def decSum6(term: Column): Column =
    sum(round(term, 6).cast(dec386)).cast("double")
}
