package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Size-capped long collection buffer. The append that would cross `cap`
  * latches an OVERFLOWED flag instead of storing: the buffer keeps at most
  * `cap` values, further appends are constant-time no-ops, and overflow
  * survives merges — so a hot group's state is O(cap) no matter how many
  * rows it has.
  */
final class CappedLongsBuffer(val cap: Int) {
  private var vals = new Array[Long](math.min(math.max(cap.toLong, 1L), 16L).toInt)
  var size = 0
  var overflowed = false // latched; survives merges

  def values: Array[Long] = vals

  def append(v: Long): Unit = {
    if (overflowed) return
    if (size >= cap) { overflowed = true; return } // the value that crosses cap
    if (size == vals.length)
      vals = java.util.Arrays.copyOf(vals,
        math.min(math.max(vals.length * 2L, 16L), cap.toLong).toInt)
    vals(size) = v
    size += 1
  }

  /** Latch straight into the overflowed state (deserialization shortcut). */
  def markOverflowed(): Unit = overflowed = true
}

/** `capped_longs(v, cap)` → `array<long>` of the group's values sorted
  * ascending, or NULL when the group holds MORE than `cap` values.
  *
  * This is the hot-bucket guard as ONE aggregate: the count-then-collect
  * window form ([[graft.operators.Dedup.lshCandidates]]' previous shape) had
  * to SORT the whole stream to count per bucket before anything could be
  * collected; here the guard is the buffer's own overflow latch, so a
  * boilerplate bucket with millions of members costs `cap + 1` slots and
  * constant-time discards — no sort, no second pass, and map-side partial
  * aggregation reduces each task's slice before the one exchange. NULL (not
  * a truncated array) marks overflow so droppers can't mistake a capped
  * group for a complete one.
  */
case class CappedCollectLongs(
    value: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongsBuffer] {

  require(cap >= 0, s"capped_longs requires cap >= 0, got $cap")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "capped_longs"

  override def createAggregationBuffer(): CappedLongsBuffer =
    new CappedLongsBuffer(cap)

  override def update(buf: CappedLongsBuffer, input: InternalRow): CappedLongsBuffer = {
    val v = value.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedLongsBuffer, other: CappedLongsBuffer): CappedLongsBuffer = {
    if (other.overflowed) buf.markOverflowed()
    else {
      var i = 0
      while (i < other.size && !buf.overflowed) { buf.append(other.values(i)); i += 1 }
    }
    buf
  }

  override def eval(buf: CappedLongsBuffer): Any =
    if (buf.overflowed) null
    else {
      val out = java.util.Arrays.copyOf(buf.values, buf.size)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(buf: CappedLongsBuffer): Array[Byte] = {
    // an overflowed buffer's values are irrelevant (the group is dropped and
    // overflow survives merges), so ship only the latch
    val n = if (buf.overflowed) 0 else buf.size
    val bb = ByteBuffer.allocate(9 + n * 8)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte).putInt(buf.cap)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val over = bb.get() == 1
    val buf = new CappedLongsBuffer(bb.getInt())
    val n = bb.getInt()
    if (over) buf.markOverflowed()
    else {
      var i = 0
      while (i < n) { buf.append(bb.getLong()); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}

object CappedCollectLongs {
  /** Column API: `groupBy(key).agg(cappedLongs($"id", 1024).as("members"))`. */
  def cappedLongs(v: Column, cap: Int): Column =
    ColumnShim.column(
      CappedCollectLongs(ColumnShim.expression(v), cap).toAggregateExpression())
}
