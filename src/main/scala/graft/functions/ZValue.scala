package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, NullType, ShortType}

/** `z_value(a, b)` — the Morton (Z-order) interleave of two unsigned
  * 32-bit keys: bit i of `a` lands at output bit 2i, bit i of `b` at
  * 2i+1. Sorting by the z-value clusters rows that are close in BOTH
  * dimensions, which is what gives every parquet file/row-group a tight
  * min/max bounding box on each dimension — the data-layout trick
  * behind multi-dimensional scan pruning (Delta/Iceberg OPTIMIZE
  * ZORDER BY). Pure bit arithmetic, codegen'd via a static call
  * ([[ZOrderOps.interleave]]), so layout jobs stay in whole-stage
  * codegen.
  *
  * Inputs must already be order-preserving 32-bit keys (ranks, bucket
  * ids, scaled values — see [[graft.operators.Layout.writeZOrdered]]);
  * bits above 32 are ignored. The raw interleave puts `b`'s bit 31 on
  * the long's SIGN bit — a signed ORDER BY would then sort the b-high
  * half of the space first and the boundary file's min/max would span
  * the whole domain. The output is therefore sign-corrected (top bit
  * flipped) so SIGNED long ordering == unsigned Morton ordering over
  * the full 32-bit input range.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // any integral type is fine — values are masked to 32 bits anyway;
  // Java widens narrower primitives at the static call in codegen
  private val integral: Set[DataType] =
    Set(LongType, IntegerType, ShortType, ByteType, NullType)

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).find(!integral.contains(_)) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(other) => TypeCheckResult.TypeCheckFailure(
        s"z_value expects integral arguments, got ${other.sql}")
    }

  override def prettyName: String = "z_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderOps.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      ZValue(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Static helper the generated code calls into. */
object ZOrderOps {

  /** Spread the lower 32 bits of `x` to the even bit positions (the
    * classic magic-mask doubling). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** a's bits on even positions, b's on odd; top bit flipped so the
    * SIGNED long order equals the unsigned Morton order (b's bit 31
    * would otherwise land on the sign bit and invert the sort for
    * inputs ≥ 2^31). */
  def interleave(a: Long, b: Long): Long =
    (spread(a) | (spread(b) << 1)) ^ Long.MinValue
}
