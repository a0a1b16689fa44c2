package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra-Gries frequency summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The buffer holds at most `k` (item → counter) entries. Streaming update:
  * a seen item increments its counter; an unseen item takes a free slot, or
  * — when all `k` slots are full — decrements EVERY counter by one (zeros
  * evicted). Merge sums the two counter maps and, if more than `k` entries
  * survive, subtracts the (k+1)-th largest counter from all and drops the
  * non-positive remainder — the PODS-2012 reduction that preserves the MG
  * error bound across arbitrary merge trees.
  *
  * Guarantee (what downstream code may rely on): after any update/merge
  * sequence over a stream of length n, every item with true count
  * > n/(k+1) is PRESENT in the summary, and each retained counter
  * under-counts by at most n/(k+1). Which OTHER items appear (and the
  * exact counter values) depends on partitioning order — so the summary is
  * a candidate set, not an answer; pair it with an exact re-count of the
  * ≤ k candidates for a deterministic result
  * ([[graft.operators.TextAnalysis.heavyHitters]]).
  *
  * This is the one frequency sketch the corpus pass can run as a plain
  * aggregate: per-map-task partials are ≤ k entries, the shuffle carries
  * O(k · tasks) rows, and no token-cardinality state exists anywhere —
  * unlike `groupBy(token)`, whose hash table is the vocabulary itself.
  */
final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String, by: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + by)
      case None if counts.size < k => counts.update(item, by)
      case None =>
        // decrement-all by min(by, smallest counter) would still be O(k);
        // plain by=1 streaming hits this branch, bulk adds only via merge
        var dec = by
        val minC = counts.valuesIterator.min
        if (minC < dec) dec = minC
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - dec }
        counts.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(counts.remove)
        if (by > dec) add(item, by - dec)
    }
  }

  /** PODS-2012 merge: sum counters, then shrink back to ≤ k entries by
    * subtracting the (k+1)-th largest counter from all.
    */
  def mergeFrom(other: MgBuffer): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, c) => c - cut }
      counts.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(counts.remove)
    }
  }
}

/** `misra_gries(item, k)` → `array<struct<token string, est bigint>>`, the
  * surviving (item, lower-bound count) pairs sorted by (est DESC, token).
  */
case class MisraGriesAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0, s"misra_gries requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.resultType
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = buf.counts.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val items = buf.counts.toArray
    val bytes = items.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(8 + bytes.map(_.length + 12).sum)
    bb.putInt(buf.k).putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length).put(bytes(i)).putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object MisraGriesAgg {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  /** Column API: `df.agg(misraGries($"token", 64).as("cand"))`. */
  def misraGries(item: Column, k: Int): Column =
    ColumnShim.column(
      MisraGriesAgg(ColumnShim.expression(item), k).toAggregateExpression())
}
