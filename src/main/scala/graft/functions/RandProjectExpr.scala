package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `rand_project(vec)` — the whole Rademacher projection of one vector
  * as ONE native, codegen-friendly expression.
  *
  * The composed formulation ([[graft.operators.Projection.hofProjection]]:
  * `transform(signM, row => aggregate(zip_with(...)))`) is correct but
  * runs INTERPRETED — higher-order functions sit outside whole-stage
  * codegen, and the decimal fold allocates a `Decimal` per element per
  * output dimension (dimIn·dimOut boxed ops per row on the scan's
  * hottest path). This expression does the identical arithmetic on
  * scaled longs: `round(x, 6)` is exactly a scale-6 unscaled long, the
  * DECIMAL(38,6) fold is exactly a long sum, and only the final
  * ×(1/√dimOut) + 4dp round per OUTPUT dimension touches BigDecimal —
  * dimIn·dimOut long ops and dimOut small-object ops per row.
  *
  * Bit-compatible with the composed version BY CONSTRUCTION on
  * well-formed rows: the 6dp quantization is the same
  * `BigDecimal.valueOf(double).setScale(6, HALF_UP)` Spark's `Round`
  * performs, the long sum equals the exact decimal sum, and the final
  * `multiply(inv).setScale(4, HALF_UP)` is the same exact-decimal
  * product+round the Column form evaluates (asserted elementwise in
  * ProjectionSpec). Null or missing elements poison their output lanes
  * to null — the oracle's semantics (`v[i]` past the end is NULL).
  *
  * `doGenCode` emits a single static call, so projections using it stay
  * inside whole-stage codegen.
  */
case class RandProjectExpr(child: Expression, signs: Array[Array[Int]],
    invRoot: JBigDecimal) extends UnaryExpression {

  require(signs.nonEmpty && signs.forall(_.length == signs.head.length),
    "signs must be a rectangular dimOut x dimIn matrix")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rand_project expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def prettyName: String = "rand_project"

  override def nullSafeEval(input: Any): Any =
    RandProjectOps.compute(input.asInstanceOf[ArrayData], signs, invRoot,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[][]")
    val invRef = ctx.addReferenceObj("invRoot", invRoot, "java.math.BigDecimal")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RandProjectOps.compute($c, $signsRef, $invRef, $elemIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): RandProjectExpr =
    copy(child = newChild)
}

object RandProjectExpr {
  def apply(c: Column, signs: Array[Array[Int]], invRoot: JBigDecimal): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(RandProjectExpr(ColumnBridge.expression(c), signs, invRoot))
  }
}

/** Static helper the generated code calls into. */
object RandProjectOps {

  /** `round(x, 6)` exactly as Spark's Round(double, 6) computes it,
    * returned as the scale-6 unscaled long (= the DECIMAL(38,6) the
    * Column form feeds its fold). */
  private def scaled6(x: Double): Long =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  def compute(vec: ArrayData, signs: Array[Array[Int]],
      invRoot: JBigDecimal, elemIsFloat: Boolean): ArrayData = {
    val dimOut = signs.length
    val dimIn = signs.head.length
    val n = vec.numElements()
    // quantize once per input element; MIN_VALUE-free null tracking via
    // a parallel flag array (a null / absent element nulls every lane)
    val xs = new Array[Long](dimIn)
    var anyNull = n < dimIn
    var i = 0
    while (i < dimIn && !anyNull) {
      if (vec.isNullAt(i)) anyNull = true
      else {
        val d = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        xs(i) = scaled6(d)
      }
      i += 1
    }
    val out = new Array[Any](dimOut)
    if (!anyNull) {
      var j = 0
      while (j < dimOut) {
        val row = signs(j)
        var acc = 0L
        var k = 0
        while (k < dimIn) {
          acc = if (row(k) == 1) acc + xs(k) else acc - xs(k)
          k += 1
        }
        out(j) = JBigDecimal.valueOf(acc, 6).multiply(invRoot)
          .setScale(4, RoundingMode.HALF_UP).doubleValue()
        j += 1
      }
    }
    new GenericArrayData(out)
  }
}
