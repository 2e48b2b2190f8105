package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise `SUM(CAST(... AS DECIMAL(38,6)))` over an
  * `ARRAY<DECIMAL(38,6)>` column in ONE aggregate buffer.
  *
  * The built-in formulation — `posexplode` then `groupBy(pos)` then
  * `sum(decimal)` then `sort_array(collect_list(...))` back to one row —
  * is correct and map-side combinable, but costs an extra shuffle, a
  * dim× row blow-up through the hash aggregate, and two generated
  * aggregate classes per stage; for the PCA screen (three such stages
  * over a small-dim vector column) that overhead dominated the driver
  * bench. This native aggregate keeps one `Array[BigInteger]` of
  * unscaled 6dp sums and adds every lane in a tight loop per row — the
  * (c)-tier of the build rules, same family as [[MinHashSigAgg]].
  *
  * Bit-compatible with the built-in decimal sum BY CONSTRUCTION: the
  * caller rounds each term to 6dp and casts to DECIMAL(38,6), so every
  * input is an exact integer-scaled value; integer addition is
  * associative and order-free, and eval re-wraps the BigInteger as a
  * DECIMAL(38,6) (overflow past 38 digits throws, matching ANSI sum).
  * A lane that never saw a non-null input evals to null, matching
  * `SUM` over an all-null group. PcaSpec asserts equality against the
  * explode+groupBy formulation, nulls included. */
case class DecVecSumAgg(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[BigInteger]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(dim >= 1, "dim must be >= 1")

  // analysis-time type gate: update() reinterprets element bytes as
  // unscaled decimals, so a mistyped child (e.g. a raw array<double>)
  // must fail resolution, not corrupt sums at runtime
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DecimalType(38, 6)))

  // null slot = "no non-null input yet" (SUM's seed), so the buffer
  // itself distinguishes 0 from absent
  override def createAggregationBuffer(): Array[BigInteger] =
    new Array[BigInteger](dim)

  override def update(buf: Array[BigInteger], input: InternalRow): Array[BigInteger] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"dec_vec_sum: array of ${a.numElements()} elements, expected $dim")
      var i = 0
      while (i < dim) {
        if (!a.isNullAt(i)) {
          val u = a.getDecimal(i, 38, 6).toJavaBigDecimal.unscaledValue()
          buf(i) = if (buf(i) == null) u else buf(i).add(u)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[BigInteger], b: Array[BigInteger]): Array[BigInteger] = {
    var i = 0
    while (i < dim) {
      if (b(i) != null) a(i) = if (a(i) == null) b(i) else a(i).add(b(i))
      i += 1
    }
    a
  }

  override def eval(buf: Array[BigInteger]): Any =
    new GenericArrayData(buf.map { u =>
      if (u == null) null
      else {
        val d = org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(u, 6))
        // loud overflow, like ANSI SUM — never silent wraparound
        if (!d.changePrecision(38, 6))
          throw new ArithmeticException(
            s"dec_vec_sum overflowed DECIMAL(38,6): unscaled $u")
        d
      }
    })

  override def serialize(buf: Array[BigInteger]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach { u =>
      if (u == null) out.writeInt(-1)
      else {
        val bytes = u.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[BigInteger] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    Array.fill(dim) {
      val len = in.readInt()
      if (len < 0) null
      else {
        val b = new Array[Byte](len)
        in.readFully(b)
        new BigInteger(b)
      }
    }
  }

  override def dataType: DataType =
    ArrayType(DecimalType(38, 6), containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "dec_vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): DecVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DecVecSumAgg =
    copy(child = newChild)
}

object DecVecSumAgg {
  /** Column-level entry: element-wise exact decimal sum of an
    * `ARRAY<DECIMAL(38,6)>` column of fixed length `dim`. */
  def decVecSum(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DecVecSumAgg(ColumnBridge.expression(c), dim).toAggregateExpression())
  }
}
