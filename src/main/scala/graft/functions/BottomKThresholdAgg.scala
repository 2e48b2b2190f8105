package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bounded bottom-k state: the k LOWEST values seen (a max-heap, so
  * the largest kept value — the k-th smallest overall — is O(1) at the
  * root) plus the total population count. Memory is `O(min(seen, k))`
  * longs no matter how many rows flow through — the property that
  * makes the hot-bucket threshold a partial aggregate instead of a
  * per-bucket sort. The backing array starts at 8 slots and DOUBLES up
  * to k as values arrive: the aggregation keeps one buffer per GROUP,
  * and honest groups hold far fewer than k members — eagerly
  * allocating k slots per group would cost `groups · 8k` bytes
  * (65 536 sign-LSH buckets × 4096 longs = 2 GiB) for state that is
  * almost entirely empty. */
private[functions] final class BottomKState(val k: Int) {
  var n: Long = 0L
  var heap: Array[Long] = new Array[Long](math.min(8, k))
  var size: Int = 0

  /** Heap update WITHOUT the population count — merge() replays kept
    * values through this and sums counts separately, so merged values
    * are never double-counted. */
  def addValue(v: Long): Unit = {
    if (size < k) {
      if (size == heap.length) {
        // amortized doubling, never past k
        val next = new Array[Long](math.min(k, heap.length * 2))
        System.arraycopy(heap, 0, next, 0, size)
        heap = next
      }
      // grow: append then sift up
      var i = size
      heap(i) = v
      size += 1
      while (i > 0 && heap((i - 1) / 2) < heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v < heap(0)) {
      // replace the root (largest kept) then sift down
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && heap(l) > heap(m)) m = l
        if (r < size && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
    }
  }

  def add(v: Long): Unit = { n += 1; addValue(v) }
}

/** `bottomk_threshold(id, k)`: the k-th LOWEST id in the group when the
  * group has MORE than k members, else NULL.
  *
  * This is the merge half of a per-partition partial bottom-k: the
  * partial state is a bounded max-heap of the k lowest ids (plus a
  * count), so map-side combine ships at most k longs per group per
  * partition and the final merge touches `min(n, k * partitions)`
  * values — never the raw population. [[graft.operators.Similarity]]
  * uses the emitted threshold to cap overflowed LSH buckets with a
  * broadcast filter (`id <= threshold` keeps exactly the k lowest when
  * ids are unique), replacing a per-bucket `row_number` window whose
  * sort centralized the overflowed bucket's full population in one
  * task. NULL for at-or-under-cap groups doubles as the "untouched"
  * marker: only overflowed buckets appear in the broadcast at all. */
case class BottomKThresholdAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKState] with UnaryLike[Expression] {

  require(k >= 1, s"bottomk_threshold: k ($k) must be >= 1")

  // analysis-time gate (MinHashSigAgg discipline): a non-bigint child
  // would otherwise throw ClassCastException per-task mid-job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"bottomk_threshold expects BIGINT ids, got ${child.dataType.sql}")

  override def createAggregationBuffer(): BottomKState = new BottomKState(k)

  override def update(buf: BottomKState, input: InternalRow): BottomKState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BottomKState, b: BottomKState): BottomKState = {
    var i = 0
    while (i < b.size) { a.addValue(b.heap(i)); i += 1 }
    a.n += b.n
    a
  }

  override def eval(buf: BottomKState): Any =
    if (buf.n > k) buf.heap(0) else null

  override def serialize(buf: BottomKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 8 * buf.size)
    bb.putLong(buf.n)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKState = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new BottomKState(k)
    val n = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) { s.addValue(bb.getLong); i += 1 }
    s.n = n
    s
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bottomk_threshold"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKThresholdAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKThresholdAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKThresholdAgg =
    copy(child = newChild)
}

object BottomKThresholdAgg {
  /** Column-level entry: `bottomKThreshold(col("id"), 4096)` — the
    * 4096-th lowest id of the group, NULL when the group has at most
    * 4096 members. */
  def bottomKThreshold(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      BottomKThresholdAgg(ColumnBridge.expression(c), k)
        .toAggregateExpression())
  }
}
