package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All-`numHashes` MinHash minima in ONE aggregate buffer.
  *
  * The expression-level formulation (`numHashes` separate
  * `min(xxhash64(lit(i), h))` aggregates — [[graft.operators.Dedup]])
  * is correct and codegen'd, but pays for 64 aggregate buffers, 64
  * update projections, and a large generated class per distinct plan.
  * This native Catalyst aggregate keeps one `Array[Long]` buffer and
  * updates every lane in a tight loop per input row — the (c)-tier of
  * the build rules: a custom expression where built-in operators can't
  * express the shape efficiently.
  *
  * Bit-compatible with the expression version BY CONSTRUCTION: Spark's
  * `xxhash64(lit(i), h)` chains `XXH64.hashLong(h, XXH64.hashInt(i, 42))`
  * (the lane literal is an INT, so it goes through hashInt), so the
  * per-lane seeds are precomputed with the same functions and the
  * per-row update applies the same `hashLong`. DedupSpec asserts
  * signature equality against the expression formulation. */
case class MinHashSigAgg(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes >= 1, s"minhash_sig: numHashes ($numHashes) must be >= 1")

  // analysis-time gate (same rule as ShingleHashes): without it a
  // non-bigint child passes analysis and update()'s Long cast throws
  // ClassCastException per-task mid-job instead
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"minhash_sig expects BIGINT (a 64-bit hash), got ${child.dataType.sql}")

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val x = XXH64.hashLong(h, seeds(i))
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigAgg =
    copy(child = newChild)
}

object MinHashSigAgg {
  /** Column-level entry: `minhashSig(col("h"), 64)` aggregates a LONG
    * hash column into the full signature array. */
  def minhashSig(c: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(c), numHashes)
        .toAggregateExpression())
  }
}
