package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `spann_probe_topk(head_id, id, vec)` — SPANN stage-2 (posting probe +
  * exact distance + replica-deduped bounded top-k) fused into ONE aggregate
  * pass over the posting scan (r16, the round's headline fusion; guide §1.2
  * "per-task work" + §2.4 "remove shuffles outright").
  *
  * The former plan probed `cand ⋈ postings` (BroadcastHashJoin), joined
  * `broadcast(queries)` to attach the query vector, projected the distance,
  * and fed an ObjectHashAggregate keyed by query_id — materializing one
  * joined row per (candidate query, posting entry) and paying a per-row
  * group-hash lookup plus interpreted aggregate-input eval. Here the
  * stage-1 candidates ride INSIDE the aggregate as a head→queries index
  * (both sides bounded by the batch-query contract: |Q|·internalK pairs),
  * every posting row binary-searches its head once, and only the probing
  * queries' buffers take a distance — no joined rows, no group hashing, one
  * scan. The exchange carries O(|Q|·k·tasks) buffer rows, the [[BatchTopK]]
  * scale shape.
  *
  * Exactness: per-pair distance is [[DistKernel.pair]] (strict left-to-right
  * double math, identical to the [[VectorDistance]] column the join form
  * projected), and the per-query buffer is the SAME distinct-id
  * [[TopKBuffer]] the join form's `topkDistinct` aggregate used — so the
  * kept (dist, id) sets, the replica dedup, and the (dist, id) tie rules are
  * identical row for row (SpannSpec pins fused ≡ join-form).
  */
case class SpannProbeTopK(
    headId: Expression,
    id: Expression,
    vec: Expression,
    qids: Array[Long],
    qvecs: Array[Array[Double]],
    probeHeads: Array[Long],
    probeOffsets: Array[Int],
    probeQIdx: Array[Int],
    k: Int,
    metric: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[TopKBuffer]] {

  require(k > 0, s"spann_probe_topk requires k > 0, got $k")
  require(probeOffsets.length == probeHeads.length + 1)

  override def children: Seq[Expression] = Seq(headId, id, vec)
  override def nullable: Boolean = false
  override def dataType: DataType = BatchTopK.resultType
  override def prettyName: String = "spann_probe_topk"

  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private lazy val metricTag: Int = DistKernel.tag(metric)

  @transient private lazy val qNorms: Array[Double] =
    qvecs.map { qv =>
      var s = 0.0; var i = 0
      while (i < qv.length) { s += qv(i) * qv(i); i += 1 }
      s
    }

  // distinct-id buffers: replica dedup inside the aggregate, exactly the
  // join form's `topkDistinct`
  override def createAggregationBuffer(): Array[TopKBuffer] =
    Array.fill(qids.length)(new TopKBuffer(k, distinct = true))

  private def headSlot(h: Long): Int = {
    var lo = 0
    var hi = probeHeads.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = probeHeads(mid)
      if (v < h) lo = mid + 1
      else if (v > h) hi = mid - 1
      else return mid
    }
    -1
  }

  override def update(bufs: Array[TopKBuffer], input: InternalRow): Array[TopKBuffer] = {
    val hV = headId.eval(input)
    if (hV != null) {
      val slot = headSlot(hV.asInstanceOf[Long])
      if (slot >= 0) {
        val idV = id.eval(input)
        val vV = vec.eval(input)
        if (idV != null && vV != null) {
          val rowId = idV.asInstanceOf[Long]
          val arr = vV.asInstanceOf[ArrayData]
          val n = arr.numElements()
          val v = new Array[Double](n)
          var i = 0
          while (i < n) {
            v(i) = if (vecIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            i += 1
          }
          var vNorm = 0.0
          if (metricTag == DistKernel.Cos) {
            var j = 0
            while (j < n) { vNorm += v(j) * v(j); j += 1 }
          }
          var p = probeOffsets(slot)
          val end = probeOffsets(slot + 1)
          while (p < end) {
            val qi = probeQIdx(p)
            val qv = qvecs(qi)
            val m = math.min(n, qv.length)
            val d = DistKernel.pair(qv, v, m, metricTag, qNorms(qi), vNorm)
            val buf = bufs(qi)
            if (buf.wouldAccept(d)) buf.insert(d, rowId)
            p += 1
          }
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
      val buf = new TopKBuffer(kk, distinct = true)
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
      buf
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpannProbeTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpannProbeTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(headId = newChildren(0), id = newChildren(1), vec = newChildren(2))
}

/** `spann_probe_lut_topk(head_id, id, codes)` — the COMPRESSED stage-2
  * ([[SpannProbeTopK]]'s shape with ADC LUT scoring): each probed posting
  * entry costs `m` table lookups against the probing query's LUT, exactly
  * [[LutCodesDistExpr]]'s left-to-right sum over the same LUT doubles the
  * former per-query UDF built; replica dedup rides in the distinct-id
  * buffers. Same candidate CSR index and scale shape as the full-precision
  * fusion.
  */
case class SpannProbeLutTopK(
    headId: Expression,
    id: Expression,
    codes: Expression,
    qids: Array[Long],
    luts: Array[Array[Array[Double]]],
    probeHeads: Array[Long],
    probeOffsets: Array[Int],
    probeQIdx: Array[Int],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[TopKBuffer]] {

  require(k > 0, s"spann_probe_lut_topk requires k > 0, got $k")
  require(probeOffsets.length == probeHeads.length + 1)
  require(qids.length == luts.length)

  override def children: Seq[Expression] = Seq(headId, id, codes)
  override def nullable: Boolean = false
  override def dataType: DataType = BatchTopK.resultType
  override def prettyName: String = "spann_probe_lut_topk"

  override def createAggregationBuffer(): Array[TopKBuffer] =
    Array.fill(qids.length)(new TopKBuffer(k, distinct = true))

  private def headSlot(h: Long): Int = {
    var lo = 0
    var hi = probeHeads.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = probeHeads(mid)
      if (v < h) lo = mid + 1
      else if (v > h) hi = mid - 1
      else return mid
    }
    -1
  }

  override def update(bufs: Array[TopKBuffer], input: InternalRow): Array[TopKBuffer] = {
    val hV = headId.eval(input)
    if (hV != null) {
      val slot = headSlot(hV.asInstanceOf[Long])
      if (slot >= 0) {
        val idV = id.eval(input)
        val cV = codes.eval(input)
        if (idV != null && cV != null) {
          val rowId = idV.asInstanceOf[Long]
          val c = cV.asInstanceOf[ArrayData]
          val m = c.numElements()
          var p = probeOffsets(slot)
          val end = probeOffsets(slot + 1)
          while (p < end) {
            val qi = probeQIdx(p)
            val lut = luts(qi)
            var total = 0.0
            var s = 0
            while (s < m) { total += lut(s)(c.getInt(s)); s += 1 }
            val buf = bufs(qi)
            if (buf.wouldAccept(total)) buf.insert(total, rowId)
            p += 1
          }
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
      val buf = new TopKBuffer(kk, distinct = true)
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
      buf
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpannProbeLutTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpannProbeLutTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(headId = newChildren(0), id = newChildren(1), codes = newChildren(2))
}

object SpannProbeLutTopK {
  def probeLutTopk(
      headId: Column,
      id: Column,
      codes: Column,
      qids: Array[Long],
      luts: Array[Array[Array[Double]]],
      probeHeads: Array[Long],
      probeOffsets: Array[Int],
      probeQIdx: Array[Int],
      k: Int): Column =
    ColumnShim.column(
      SpannProbeLutTopK(ColumnShim.expression(headId), ColumnShim.expression(id),
        ColumnShim.expression(codes), qids, luts, probeHeads, probeOffsets,
        probeQIdx, k).toAggregateExpression())
}

object SpannProbeTopK {

  /** Build the head→probing-queries CSR index from collected stage-1
    * candidate pairs `(query_id, head_id)`. Duplicate pairs (the widened
    * probe can re-name a head) dedupe here — the join form's duplicate probe
    * rows were no-ops in the distinct-id buffer anyway.
    */
  def buildProbeIndex(pairs: Array[(Long, Long)], qids: Array[Long])
      : (Array[Long], Array[Int], Array[Int]) = {
    val qIdx = qids.zipWithIndex.toMap
    val byHead = pairs.distinct.groupBy(_._2)
    val heads = byHead.keys.toArray.sorted
    val offsets = new Array[Int](heads.length + 1)
    val flat = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < heads.length) {
      offsets(i) = flat.length
      byHead(heads(i)).map(p => qIdx(p._1)).sorted.foreach(flat += _)
      i += 1
    }
    offsets(heads.length) = flat.length
    (heads, offsets, flat.toArray)
  }

  def probeTopk(
      headId: Column,
      id: Column,
      vec: Column,
      qids: Array[Long],
      qvecs: Array[Array[Double]],
      probeHeads: Array[Long],
      probeOffsets: Array[Int],
      probeQIdx: Array[Int],
      k: Int,
      metric: String): Column =
    ColumnShim.column(
      SpannProbeTopK(ColumnShim.expression(headId), ColumnShim.expression(id),
        ColumnShim.expression(vec), qids, qvecs, probeHeads, probeOffsets,
        probeQIdx, k, metric).toAggregateExpression())
}
