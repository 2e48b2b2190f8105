package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch over a string column — the
  * heavy-hitters pass of corpus token statistics at 100 TB, where an
  * exact groupBy(token) would shuffle the full vocabulary but the
  * question is only "which items exceed φ·n".
  *
  * One bounded map of `capacity` counters per partition; the classic
  * decrement step (new item with the map full decrements every counter,
  * zeros evicted) keeps it bounded. Summaries are MERGEABLE with
  * additive error (Agarwal et al., "Mergeable Summaries", PODS'12):
  * pointwise-sum both maps, then subtract the (capacity+1)-th largest
  * count from all and drop non-positive — exactly the partial-aggregate
  * / final-merge shape Spark's aggregation needs. The result guarantee:
  * for every item, `true_count - n/(capacity+1) ≤ est ≤ true_count`,
  * so any item with frequency above n/(capacity+1) is PRESENT.
  *
  * Returns map<string, long> of surviving items → estimated counts.
  * The shuffle carries at most `capacity` entries per partition —
  * constant-size state, the same scale posture as the HLL/GK sketches
  * (reference analog: the reference's top-N dashboards,
  * assignment5/monitoring2.png, recast as a sketch for corpus scale). */
case class FreqSketchAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, "capacity must be >= 1")

  // analysis-time type contract: the buffer stores UTF8Strings, so a
  // non-string child must fail analysis rather than throw a per-task
  // ClassCastException mid-job (same rule as ShingleHashes)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_sketch expects a STRING argument, got ${other.sql}")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < capacity =>
          buf.update(s.clone(), 1L) // copy: UTF8String may view a reused page
        case None => // decrement step: every counter pays one
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive:
      // the merge rule that keeps the additive-error bound
      val counts = a.values.toArray.sortInPlace()(Ordering.Long.reverse)
      val thr = counts(capacity)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.mapValuesInPlace((_, c) => c - thr)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic order (est desc, item asc) so downstream explodes
    // and collects see a stable map regardless of partitioning
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(sorted.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val bytes = entries.map { case (k, _) => k.getBytes }
    val size = 4 + bytes.map(b => 4 + b.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(bytes).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      m.update(UTF8String.fromBytes(kb), bb.getLong)
    }
    m
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

object FreqSketchAgg {
  /** Column-level entry: `freqSketch(col("token"), 64)` → map<item, est>. */
  def freqSketch(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(c), capacity)
        .toAggregateExpression())
  }
}
