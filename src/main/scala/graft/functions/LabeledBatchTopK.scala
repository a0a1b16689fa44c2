package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `labeled_batch_topk(id, vec, label)` — the contrastive-mining form of
  * [[BatchTopK]]: every anchor (query) rides inside ONE aggregate with its
  * label, and each corpus row updates, per anchor, one of TWO bounded
  * [[TopKBuffer]]s chosen by label agreement — nearest same-label rows
  * (positives, the anchor itself excluded, capped `kPos`) and nearest
  * different-label rows (hard negatives, capped `kNeg`).
  *
  * This replaces the one-scan-per-label-value loop
  * ([[graft.operators.SimilaritySearch.hardNegatives]] pre-r10): the corpus
  * is scanned ONCE regardless of how many classes exist, partials merge
  * map-side, and the exchange carries O(|anchors|·(kPos+kNeg)·tasks) buffer
  * rows — the same plan shape that makes [[BatchTopK]] survive a 100 TB
  * corpus, now label-aware. Anchors are collected to the driver under the
  * usual "query batch is broadcastable" contract (a contrastive mining
  * batch is training-batch-sized, not corpus-sized).
  *
  * Distance math is [[DistKernel.pair]] — double accumulation, strictly
  * left-to-right, identical to [[BatchTopK]]/[[VectorDistance]] — so
  * results stay oracle-exact. A `kPos`/`kNeg` of 0 disables that side's
  * buffer (hard-negative mining needs no positives).
  */
case class LabeledBatchTopK(
    id: Expression,
    vec: Expression,
    label: Expression,
    qids: Array[Long],
    qvecs: Array[Array[Double]],
    qlabels: Array[Long],
    kPos: Int,
    kNeg: Int,
    metric: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[TopKBuffer]] {

  require(kPos >= 0 && kNeg >= 0 && kPos + kNeg > 0,
    s"labeled_batch_topk needs at least one positive side: kPos=$kPos kNeg=$kNeg")
  require(qids.length == qvecs.length && qids.length == qlabels.length)

  override def children: Seq[Expression] = Seq(id, vec, label)
  override def nullable: Boolean = false
  override def dataType: DataType = LabeledBatchTopK.resultType
  override def prettyName: String = "labeled_batch_topk"

  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private lazy val metricTag: Int = DistKernel.tag(metric)
  @transient private lazy val dim: Int =
    if (qvecs.isEmpty) 0 else qvecs(0).length
  @transient private lazy val qNorms: Array[Double] =
    qvecs.map { qv =>
      var s = 0.0; var i = 0
      while (i < qv.length) { s += qv(i) * qv(i); i += 1 }
      s
    }

  // buffer layout: [pos(q0), neg(q0), pos(q1), neg(q1), …]; a disabled side
  // gets a 0-capacity buffer that is simply never inserted into
  override def createAggregationBuffer(): Array[TopKBuffer] =
    Array.tabulate(qids.length * 2) { i =>
      new TopKBuffer(if (i % 2 == 0) math.max(kPos, 1) else math.max(kNeg, 1))
    }

  override def update(bufs: Array[TopKBuffer], input: InternalRow): Array[TopKBuffer] = {
    val idV = id.eval(input)
    val vV = vec.eval(input)
    val lV = label.eval(input)
    if (idV != null && vV != null && lV != null) {
      val rowId = idV.asInstanceOf[Long]
      val rowLabel = lV.asInstanceOf[Number].longValue
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
      var qi = 0
      while (qi < qids.length) {
        val same = qlabels(qi) == rowLabel
        // a same-label row can only ever be a positive; skip the distance
        // entirely when that side is disabled or the row IS the anchor
        if (same) {
          if (kPos > 0 && rowId != qids(qi)) {
            val qv = qvecs(qi)
            val m = math.min(n, qv.length)
            bufs(2 * qi).insert(
              DistKernel.pair(qv, v, m, metricTag, qNorms(qi), vNorm), rowId)
          }
        } else if (kNeg > 0) {
          val qv = qvecs(qi)
          val m = math.min(n, qv.length)
          bufs(2 * qi + 1).insert(
            DistKernel.pair(qv, v, m, metricTag, qNorms(qi), vNorm), rowId)
        }
        qi += 1
      }
    }
    bufs
  }

  override def merge(bufs: Array[TopKBuffer], other: Array[TopKBuffer]): Array[TopKBuffer] = {
    var bi = 0
    while (bi < bufs.length) {
      val live = if (bi % 2 == 0) kPos > 0 else kNeg > 0
      if (live) {
        val o = other(bi)
        var i = 0
        while (i < o.size) { bufs(bi).insert(o.dists(i), o.ids(i)); i += 1 }
      }
      bi += 1
    }
    bufs
  }

  override def eval(bufs: Array[TopKBuffer]): Any =
    new GenericArrayData(Array.tabulate(qids.length) { qi =>
      def nn(b: TopKBuffer) =
        new GenericArrayData(b.sorted.map { case (id, d) => InternalRow(id, d) })
      InternalRow(qids(qi), nn(bufs(2 * qi)), nn(bufs(2 * qi + 1)))
    })

  override def serialize(bufs: Array[TopKBuffer]): Array[Byte] = {
    var sz = 12
    bufs.foreach(b => sz += 4 + b.size * 16)
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(kPos).putInt(kNeg).putInt(bufs.length)
    bufs.foreach { b =>
      bb.putInt(b.size)
      var i = 0
      while (i < b.size) { bb.putDouble(b.dists(i)).putLong(b.ids(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[TopKBuffer] = {
    val bb = ByteBuffer.wrap(bytes)
    val kp = bb.getInt(); val kn = bb.getInt()
    val nb = bb.getInt()
    Array.tabulate(nb) { bi =>
      val buf = new TopKBuffer(if (bi % 2 == 0) math.max(kp, 1) else math.max(kn, 1))
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
      buf
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LabeledBatchTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LabeledBatchTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), vec = newChildren(1), label = newChildren(2))
}

object LabeledBatchTopK {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("pos", TopKByDistance.resultType, nullable = false),
      StructField("neg", TopKByDistance.resultType, nullable = false))),
    containsNull = false)

  /** Collect a broadcastable-by-contract labeled anchor frame
    * `(query_id, qvec, qlabel)` as sorted parallel arrays.
    */
  def collectQueries(
      anchors: DataFrame): (Array[Long], Array[Array[Double]], Array[Long]) = {
    val rows = anchors.select("query_id", "qvec", "qlabel").collect()
      .map { r =>
        val qid = r.get(0) match {
          case l: java.lang.Long    => l.longValue
          case i: java.lang.Integer => i.longValue
          case other                => other.toString.toLong
        }
        val v = r.getSeq[Any](1).map {
          case f: java.lang.Float  => f.toDouble
          case d: java.lang.Double => d.doubleValue
        }.toArray
        (qid, v, r.get(2).asInstanceOf[Number].longValue)
      }.sortBy(_._1)
    (rows.map(_._1), rows.map(_._2), rows.map(_._3))
  }

  def labeledBatchTopk(
      id: Column,
      vec: Column,
      label: Column,
      qids: Array[Long],
      qvecs: Array[Array[Double]],
      qlabels: Array[Long],
      kPos: Int,
      kNeg: Int,
      metric: String): Column =
    ColumnShim.column(
      LabeledBatchTopK(ColumnShim.expression(id), ColumnShim.expression(vec),
        ColumnShim.expression(label), qids, qvecs, qlabels, kPos, kNeg, metric)
        .toAggregateExpression())
}
