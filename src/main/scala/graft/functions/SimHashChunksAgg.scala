package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All 64 SimHash bit-counters in ONE aggregate buffer.
  *
  * The expression-level formulation ([[graft.operators.Dedup
  * .withSimhashChunks]]) lane-packs the 64 per-bit set-counts into 16
  * sum aggregates — correct, ANSI-safe, and oracle-replayable, but the
  * generated aggregate class carries 16 buffers × (4 shifts + masks +
  * adds) per row and dominates the query's codegen size. This native
  * aggregate keeps one `Array[Int]` of counters and a row count, and
  * updates all 64 lanes in a tight bit-scan loop per input row.
  *
  * Inputs are the md5-derived 32-bit halves (`hi` = hex digits 1-8,
  * `lo` = digits 9-16) that the portable SimHash defines; the result is
  * the four 16-bit chunks `[c0, c1, c2, c3]` with bit t of chunk j set
  * iff count(bit 16j+t) * 2 > n_rows — EXACTLY the algebra of the
  * lane-packed formulation (DedupSpec asserts chunk equality against
  * it), so the DuckDB oracle is unchanged. */
case class SimHashChunksAgg(hi: Expression, lo: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with BinaryLike[Expression] {

  override def left: Expression = hi
  override def right: Expression = lo

  // analysis-time gate, like every sibling native aggregate: a mistyped
  // half must fail resolution, not as a per-task ClassCastException in
  // update() mid-job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hi.dataType == LongType && lo.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "simhash_chunks expects two BIGINT 32-bit halves, got " +
          s"(${hi.dataType.sql}, ${lo.dataType.sql})")

  // counters(0..63) = per-bit set counts; counters(64) = row count
  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val hv = hi.eval(input)
    val lv = lo.eval(input)
    if (hv != null && lv != null) {
      val h = hv.asInstanceOf[Long]
      val l = lv.asInstanceOf[Long]
      var b = 0
      while (b < 32) {
        buf(b) += ((l >>> b) & 1L).toInt
        buf(b + 32) += ((h >>> b) & 1L).toInt
        b += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val n = buf(64)
    val chunks = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var c = 0L
      var t = 0
      while (t < 16) {
        if (buf(16 * j + t) * 2 > n) c |= 1L << t
        t += 1
      }
      chunks(j) = c
      j += 1
    }
    new GenericArrayData(chunks)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 65)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getInt)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_chunks"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashChunksAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashChunksAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashChunksAgg =
    copy(hi = newLeft, lo = newRight)
}

object SimHashChunksAgg {
  /** Column-level entry: aggregates (hi, lo) 32-bit-half columns into
    * the `[c0..c3]` chunk array. */
  def simhashChunks(hi: Column, lo: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      SimHashChunksAgg(ColumnBridge.expression(hi), ColumnBridge.expression(lo))
        .toAggregateExpression())
  }
}
