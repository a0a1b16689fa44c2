package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Bounded bottom-k DISTINCT long buffer — the KMV sketch state: the k
  * smallest distinct values seen so far, as a size-capped binary MAX-heap so
  * the current k-th smallest is O(1) to inspect and replace. Most candidates
  * lose to the heap max immediately; the O(k) distinctness scan only runs for
  * candidates that would actually enter the buffer.
  */
final class BottomKLongBuffer(val k: Int) {
  val vals = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit = {
    if (size >= k && v >= vals(0)) return // can't beat the current k-th
    var i = 0
    while (i < size) { if (vals(i) == v) return; i += 1 } // already held
    if (size < k) {
      var c = size
      vals(c) = v; size += 1
      while (c > 0) { // sift up
        val p = (c - 1) >> 1
        if (vals(c) > vals(p)) {
          val t = vals(c); vals(c) = vals(p); vals(p) = t; c = p
        } else return
      }
    } else {
      vals(0) = v
      var c = 0
      while (true) { // sift down
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < size && vals(l) > vals(m)) m = l
        if (r < size && vals(r) > vals(m)) m = r
        if (m == c) return
        val t = vals(c); vals(c) = vals(m); vals(m) = t
        c = m
      }
    }
  }

  /** The held values, sorted ascending. */
  def sorted: Array[Long] = {
    val out = java.util.Arrays.copyOf(vals, size)
    java.util.Arrays.sort(out)
    out
  }
}

/** `bottomk_longs(v, k)` → `array<long>`: the k smallest DISTINCT values per
  * group, ascending — the KMV bottom-k sketch as ONE bounded aggregate.
  *
  * Why not `distinct()` + `row_number().over(Window.partitionBy(key))`? The
  * distinct is a full (key, value) shuffle and the window then moves every
  * distinct (key, hash) pair to ONE reducer per key and sorts it — a
  * corpus-sized sort per key at 100 TB. This aggregate runs inside Spark's
  * partial-aggregation machinery (ObjectHashAggregate): each map task
  * reduces its slice to ≤ k values per key BEFORE the shuffle, so the
  * exchange carries O(keys · k · tasks) rows — the same posture as
  * [[TopKByDistance]]. In-buffer distinctness makes the dedup free: a bounded
  * buffer of distinct values merges associatively, so no distinct pre-pass
  * is needed at all.
  */
case class BottomKLongs(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKLongBuffer] {

  require(k > 0, s"bottomk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_longs"

  override def createAggregationBuffer(): BottomKLongBuffer =
    new BottomKLongBuffer(k)

  override def update(buf: BottomKLongBuffer, input: InternalRow): BottomKLongBuffer = {
    val v = value.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKLongBuffer, other: BottomKLongBuffer): BottomKLongBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.vals(i)); i += 1 }
    buf
  }

  override def eval(buf: BottomKLongBuffer): Any =
    new GenericArrayData(buf.sorted)

  override def serialize(buf: BottomKLongBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 8)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKLongBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BottomKLongBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}

object BottomKLongs {
  /** Column API: `groupBy(key).agg(bottomk($"h", 64).as("kmv"))`. */
  def bottomk(v: Column, k: Int): Column =
    ColumnShim.column(
      BottomKLongs(ColumnShim.expression(v), k).toAggregateExpression())
}
