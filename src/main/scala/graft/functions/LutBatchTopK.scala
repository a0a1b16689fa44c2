package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `lut_batch_topk(id, codes[, codes2])` — ALL queries' ADC/SDC/RVQ lookup
  * tables ride inside ONE aggregate over the quantized corpus scan (r16;
  * guide §1.2/§2.4 — the [[BatchTopK]] shape for the compressed domain).
  *
  * The former plans cross-joined the corpus with the broadcast per-query
  * LUT frame — materializing one joined row per (query, vector) pair
  * (30 M at the sf0.1 ADC scan) carrying the LUT pointer, then paying a
  * per-row group-hash in the top-k aggregate. Here the corpus is scanned
  * once; each row scores against every query's LUT inline and feeds that
  * query's bounded [[TopKBuffer]]; partials merge map-side and the exchange
  * carries O(|Q|·k·tasks) buffer rows.
  *
  * Exactness: per-pair scores are the same strict left-to-right double sums
  * as [[LutCodesDistExpr]] (`Σ_s lut[s][codes[s]]`) / [[RvqLutDistExpr]]
  * (`Σ_s lut[s][codes1[s]·n2[s]+codes2[s]]`) over the same LUT doubles (the
  * tables are built by the same Scala code the per-query UDF ran), and the
  * buffer is the same (dist, id) tie rule — results are bit-identical
  * (PQSpec pins aggregate ≡ crossJoin form).
  */
case class LutBatchTopK(
    children: Seq[Expression],
    qids: Array[Long],
    luts: Array[Array[Array[Double]]],
    n2: Array[Int], // null → single-codes scoring; else the RVQ inner stride
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[TopKBuffer]] {

  require(k > 0, s"lut_batch_topk requires k > 0, got $k")
  require(children.size == (if (n2 == null) 2 else 3),
    "lut_batch_topk arity must match the scoring form")
  require(qids.length == luts.length)

  private def id: Expression = children(0)
  private def codes1: Expression = children(1)

  override def nullable: Boolean = false
  override def dataType: DataType = BatchTopK.resultType
  override def prettyName: String = "lut_batch_topk"

  override def createAggregationBuffer(): Array[TopKBuffer] =
    Array.fill(qids.length)(new TopKBuffer(k))

  override def update(bufs: Array[TopKBuffer], input: InternalRow): Array[TopKBuffer] = {
    val idV = id.eval(input)
    val c1V = codes1.eval(input)
    val c2V = if (n2 == null) null else children(2).eval(input)
    if (idV != null && c1V != null && (n2 == null || c2V != null)) {
      val rowId = idV.asInstanceOf[Long]
      val c1 = c1V.asInstanceOf[ArrayData]
      val m = c1.numElements()
      if (n2 == null) {
        var qi = 0
        while (qi < bufs.length) {
          val lut = luts(qi)
          var total = 0.0
          var s = 0
          while (s < m) { total += lut(s)(c1.getInt(s)); s += 1 }
          val buf = bufs(qi)
          if (buf.wouldAccept(total)) buf.insert(total, rowId)
          qi += 1
        }
      } else {
        val c2 = c2V.asInstanceOf[ArrayData]
        var qi = 0
        while (qi < bufs.length) {
          val lut = luts(qi)
          var total = 0.0
          var s = 0
          while (s < m) {
            total += lut(s)(c1.getInt(s) * n2(s) + c2.getInt(s)); s += 1
          }
          val buf = bufs(qi)
          if (buf.wouldAccept(total)) buf.insert(total, rowId)
          qi += 1
        }
      }
    }
    bufs
  }

  override def merge(bufs: Array[TopKBuffer], other: Array[TopKBuffer]): Array[TopKBuffer] = {
    var qi = 0
    while (qi < bufs.length) {
      val o = other(qi)
      var i = 0
      while (i < o.size) { bufs(qi).insert(o.dists(i), o.ids(i)); i += 1 }
      qi += 1
    }
    bufs
  }

  override def eval(bufs: Array[TopKBuffer]): Any =
    new GenericArrayData(Array.tabulate(bufs.length) { qi =>
      val nn = bufs(qi).sorted.map { case (id, d) => InternalRow(id, d) }
      InternalRow(qids(qi), new GenericArrayData(nn))
    })

  override def serialize(bufs: Array[TopKBuffer]): Array[Byte] = {
    var sz = 8
    bufs.foreach(b => sz += 4 + b.size * 16)
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(k).putInt(bufs.length)
    bufs.foreach { b =>
      bb.putInt(b.size)
      var i = 0
      while (i < b.size) { bb.putDouble(b.dists(i)).putLong(b.ids(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[TopKBuffer] = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt()
    val nq = bb.getInt()
    Array.fill(nq) {
      val buf = new TopKBuffer(kk)
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
      buf
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LutBatchTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LutBatchTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object LutBatchTopK {

  /** Single-codes scoring (`Σ_s lut[s][codes[s]]` — ADC/SDC). */
  def lutTopk(id: Column, codes: Column, qids: Array[Long],
      luts: Array[Array[Array[Double]]], k: Int): Column =
    ColumnShim.column(
      LutBatchTopK(Seq(ColumnShim.expression(id), ColumnShim.expression(codes)),
        qids, luts, null, k).toAggregateExpression())

  /** Dual-codes scoring (`Σ_s lut[s][c1[s]·n2[s]+c2[s]]` — RVQ). */
  def rvqTopk(id: Column, codes1: Column, codes2: Column, qids: Array[Long],
      luts: Array[Array[Array[Double]]], n2: Array[Int], k: Int): Column =
    ColumnShim.column(
      LutBatchTopK(Seq(ColumnShim.expression(id), ColumnShim.expression(codes1),
        ColumnShim.expression(codes2)), qids, luts, n2, k).toAggregateExpression())
}
