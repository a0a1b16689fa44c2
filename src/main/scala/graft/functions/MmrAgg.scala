package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Growable (id, rel, vec) pool buffer for [[MmrGreedy]]. The pool is
  * bounded by the rerank-budget contract (≤ poolR rows per query, tens), so
  * collecting it into the aggregate buffer is the same bounded-frame posture
  * as [[TopKBuffer]] — never corpus-shaped.
  */
final class MmrPoolBuffer {
  var ids = new Array[Long](16)
  var rels = new Array[Double](16)
  var vecs = new Array[Array[Double]](16)
  var size = 0

  def add(id: Long, rel: Double, vec: Array[Double]): Unit = {
    if (size == ids.length) {
      ids = java.util.Arrays.copyOf(ids, size * 2)
      rels = java.util.Arrays.copyOf(rels, size * 2)
      vecs = java.util.Arrays.copyOf(vecs, size * 2)
    }
    ids(size) = id; rels(size) = rel; vecs(size) = vec; size += 1
  }
}

/** `mmr_greedy(id, rel, vec, k, λ)` → the k greedy MMR picks of one query's
  * relevance pool as `array<struct<pick int, id bigint, score double>>` —
  * the k sequential driver-coordinated round jobs of the former
  * dataframe-loop formulation collapsed into ONE aggregation pass (r16,
  * guide §1.2 "the distributed algorithm": the greedy recursion is a
  * per-group computation over a bounded pool, not k cluster-wide joins).
  *
  * Exactness contract (must reproduce the DF form bit for bit, and the
  * oracle's unrolled-CTE replay):
  *  - pairwise `sim = 1.0 − cos_dist(cand, sel)` with cos_dist exactly
  *    [[VectorDistance]]'s: one interleaved dot/norm loop, `1 − dot/√(na·nb)`,
  *    zero denom → 1.0 (inputs widen float→double per element, exact);
  *  - `max_{s∈selected} sim` with Spark's max semantics
  *    (`java.lang.Double.compare` ordering: NaN greatest, −0.0 < 0.0);
  *  - `score = (1−λ)·rel − λ·ms` in that literal double arithmetic;
  *  - argmax by (score, id ascending) via the same Double.compare ordering —
  *    the DF's `max_by(struct(id, x), struct(x, −id))`;
  *  - round 1 picks max (rel, id asc) and emits score = rel;
  *  - a pool smaller than k yields fewer picks (the DF's empty round).
  * The scan order of the pool cannot affect the result: the argmax ordering
  * is total (ids are distinct by the pool contract).
  */
case class MmrGreedy(
    id: Expression,
    rel: Expression,
    vec: Expression,
    k: Int,
    lambda: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MmrPoolBuffer] {

  require(k > 0, s"mmr_greedy requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(id, rel, vec)
  override def nullable: Boolean = false
  override def dataType: DataType = MmrGreedy.resultType
  override def prettyName: String = "mmr_greedy"

  private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): MmrPoolBuffer = new MmrPoolBuffer

  override def update(buf: MmrPoolBuffer, input: InternalRow): MmrPoolBuffer = {
    val idV = id.eval(input)
    val relV = rel.eval(input)
    val vecV = vec.eval(input)
    if (idV != null && relV != null && vecV != null) {
      val arr = vecV.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val v = new Array[Double](n)
      var i = 0
      while (i < n) {
        v(i) = if (vecIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf.add(idV.asInstanceOf[Long], relV.asInstanceOf[Double], v)
    }
    buf
  }

  override def merge(buf: MmrPoolBuffer, other: MmrPoolBuffer): MmrPoolBuffer = {
    var i = 0
    while (i < other.size) {
      buf.add(other.ids(i), other.rels(i), other.vecs(i)); i += 1
    }
    buf
  }

  /** cos distance, exactly [[VectorDistance]].nullSafeEval's loop. */
  private def cosDist(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }

  override def eval(buf: MmrPoolBuffer): Any = {
    val n = buf.size
    val picks = math.min(k, n)
    val out = new Array[Any](picks)
    val sel = new Array[Boolean](n)
    val selIdx = new Array[Int](picks)
    var t = 0
    while (t < picks) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!sel(i)) {
          val score =
            if (t == 0) buf.rels(i)
            else {
              // max over selected of sim(cand, sel) — Spark max ordering
              var ms = Double.NegativeInfinity
              var s = 0
              while (s < t) {
                val sim = 1.0 - cosDist(buf.vecs(i), buf.vecs(selIdx(s)))
                if (java.lang.Double.compare(sim, ms) > 0) ms = sim
                s += 1
              }
              (1.0 - lambda) * buf.rels(i) - lambda * ms
            }
          val c = if (best < 0) 1 else java.lang.Double.compare(score, bestScore)
          if (c > 0 || (c == 0 && buf.ids(i) < buf.ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      sel(best) = true
      selIdx(t) = best
      out(t) = InternalRow(t + 1, buf.ids(best), bestScore)
      t += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MmrPoolBuffer): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) { bytes += 8 + 8 + 4 + 8 * buf.vecs(i).length; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putLong(buf.ids(i)).putDouble(buf.rels(i)).putInt(buf.vecs(i).length)
      val v = buf.vecs(i)
      var j = 0
      while (j < v.length) { bb.putDouble(v(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MmrPoolBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MmrPoolBuffer
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val id = bb.getLong(); val rel = bb.getDouble()
      val len = bb.getInt()
      val v = new Array[Double](len)
      var j = 0
      while (j < len) { v(j) = bb.getDouble(); j += 1 }
      buf.add(id, rel, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrGreedy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrGreedy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), rel = newChildren(1), vec = newChildren(2))
}

object MmrGreedy {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("pick", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  def mmrGreedy(id: Column, rel: Column, vec: Column, k: Int,
      lambda: Double): Column =
    ColumnShim.column(
      MmrGreedy(ColumnShim.expression(id), ColumnShim.expression(rel),
        ColumnShim.expression(vec), k, lambda).toAggregateExpression())
}
