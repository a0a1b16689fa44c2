package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `batch_topk(id, vec)` — ALL queries ride inside one aggregate: each corpus
  * row updates a per-query bounded [[TopKBuffer]]; partials merge per
  * partition, and the final row is `array<struct<query_id, nn>>`.
  *
  * This is the batch-search plan shape (Q2, `CoreInterface.h:49`) with the
  * |Q|×|N| join row fan-out removed: a `crossJoin(broadcast(queries))`
  * materializes one joined row per (query, vector) pair before aggregating
  * them away again — here the corpus is scanned ONCE and only the
  * O(|Q|·k·partitions) buffer rows ever exist. Queries are collected to the
  * driver under the same "queries are broadcastable" contract the join form
  * relies on.
  *
  * Distance math matches [[VectorDistance]]/[[NearestHeadsExpr]] exactly
  * (double accumulation, left-to-right; cosine = 1 − dot/√(‖a‖²·‖b‖²) with
  * the 0-denominator → 1.0 guard), so results stay oracle-exact.
  */
case class BatchTopK(
    id: Expression,
    vec: Expression,
    qids: Array[Long],
    qvecs: Array[Array[Double]],
    k: Int,
    metric: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[TopKBuffer]] {

  require(k > 0, s"batch_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(id, vec)
  override def nullable: Boolean = false
  override def dataType: DataType = BatchTopK.resultType
  override def prettyName: String = "batch_topk"

  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // hoisted out of the per-(row × query) hot loop: metric dispatch as an int
  // tag, query vectors flattened to ONE contiguous array (stride = dim)
  private lazy val metricTag: Int = DistKernel.tag(metric)
  @transient private lazy val dim: Int =
    if (qvecs.isEmpty) 0 else qvecs(0).length
  @transient private lazy val uniformDim: Boolean = qvecs.forall(_.length == dim)
  @transient private lazy val flatQ: Array[Double] = {
    val out = new Array[Double](qvecs.length * dim)
    var qi = 0
    while (qi < qvecs.length) {
      System.arraycopy(qvecs(qi), 0, out, qi * dim, dim)
      qi += 1
    }
    out
  }

  @transient private lazy val qNorms: Array[Double] =
    qvecs.map { qv =>
      var s = 0.0; var i = 0
      while (i < qv.length) { s += qv(i) * qv(i); i += 1 }
      s
    }

  // ‖q‖ per query for the wide-dim L2 triangle-inequality reject (r16,
  // DistKernel.updateAll); null elsewhere so narrow/non-L2 paths pay nothing
  @transient private lazy val sqrtQNorms: Array[Double] =
    if (metricTag == DistKernel.L2 && dim >= DistKernel.AbandonMinDim)
      qNorms.map(math.sqrt)
    else null

  override def createAggregationBuffer(): Array[TopKBuffer] =
    Array.fill(qids.length)(new TopKBuffer(k))

  override def update(bufs: Array[TopKBuffer], input: InternalRow): Array[TopKBuffer] = {
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
      if (uniformDim && n >= dim) {
        DistKernel.updateAll(v, flatQ, qNorms, dim, metricTag, bufs, rowId,
          vNorm, sqrtQNorms)
      } else {
        // ragged fallback (mixed query dims): per-pair prefix distance
        var qi = 0
        while (qi < qvecs.length) {
          val qv = qvecs(qi)
          val m = math.min(n, qv.length)
          bufs(qi).insert(
            DistKernel.pair(qv, v, m, metricTag, qNorms(qi), vNorm), rowId)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BatchTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BatchTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), vec = newChildren(1))
}

object BatchTopK {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("nn", TopKByDistance.resultType, nullable = false))),
    containsNull = false)

  /** Collect a (broadcastable-by-contract) queries frame as sorted
    * `(ids, vecs)` arrays; float vectors widen to double (exact).
    */
  def collectQueries(queries: DataFrame): (Array[Long], Array[Array[Double]]) = {
    val rows = queries.select("query_id", "qvec").collect()
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
        (qid, v)
      }.sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  def batchTopk(
      id: Column,
      vec: Column,
      qids: Array[Long],
      qvecs: Array[Array[Double]],
      k: Int,
      metric: String): Column =
    ColumnShim.column(
      BatchTopK(ColumnShim.expression(id), ColumnShim.expression(vec),
        qids, qvecs, k, metric).toAggregateExpression())
}
