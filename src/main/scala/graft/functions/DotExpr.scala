package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_dot(a, b)` — the exact-cosine dot product as ONE native,
  * codegen-friendly expression.
  *
  * The composed formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`,
  * kept as [[graft.operators.Similarity.dotHof]]) is correct but sits
  * outside whole-stage codegen: ZipWith allocates a fresh array per
  * pair and ArrayAggregate folds it through boxed lambda evaluation —
  * on the ANN candidate tier that is the single hottest per-row
  * operation in the engine (every LSH/IVF/brute/SemDeDup/margin
  * candidate pays one dot per pair). This expression is a primitive
  * double loop over the two ArrayData buffers — no allocation, no
  * boxing, inlined into whole-stage codegen via one static call.
  *
  * Bit-compatible with the composed version BY CONSTRUCTION — for
  * ARRAY<DOUBLE> inputs, the form every engine call site uses (all go
  * through `asDouble`): the sum runs in index order 0..n-1 exactly
  * like ArrayAggregate's left fold (IEEE-754 addition order preserved,
  * so every 4dp-rounded sim the oracles replay is unchanged), NaN/Inf
  * flow through plain double arithmetic, and the null semantics mirror
  * zip_with + aggregate — a null element, or an index present on one
  * side only (zip_with null-pads the shorter array), nulls the whole
  * result; two empty arrays fold to 0.0 (DotExprSpec asserts all of it
  * bit-for-bit). On RAW ARRAY<FLOAT> inputs the claim is weaker: this
  * expression widens each element to double BEFORE the multiply, while
  * the raw HOF twin multiplies in float precision first — same values
  * after an asDouble cast, not bit-equal against the uncast HOF. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two ARRAY<FLOAT|DOUBLE>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotOps.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.DotOps.compute($l, $r, $lf, $rf);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotExpr = copy(left = newLeft, right = newRight)
}

object DotExpr {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Static helper the generated code calls into. Returns null exactly
  * when the composed zip_with/aggregate twin would: any index covered
  * by only one array, or holding a null element, poisons the fold. */
object DotOps {
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    val m = b.numElements()
    val mx = math.max(n, m)
    var acc = 0.0
    var i = 0
    while (i < mx) {
      if (i >= n || i >= m || a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
