package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `nearest_heads(vec)` → the `r` nearest head vectors as
  * `array<struct<id bigint, dist double>>`, ascending (dist, id).
  *
  * The head table rides INSIDE the expression (it is ratio-bounded ≤ ~20% of
  * the corpus by SelectHead's contract, `SPANNIndex.cpp:707-815`, and tiny in
  * absolute terms — this is the same "heads live in memory" assumption the
  * reference's BuildHead makes). Compared to `crossJoin(broadcast(heads))`,
  * this skips materializing one joined row per (vector, head) pair — for a
  * posting build that is |N|·|H| row copies avoided; only the O(|N|·r)
  * result rows ever exist.
  *
  * Distance math is identical to [[VectorDistance]] (double accumulation,
  * left-to-right), so outputs stay oracle-exact.
  */
case class NearestHeadsExpr(
    child: Expression,
    headIds: Array[Long],
    headVecs: Array[Array[Double]],
    r: Int,
    metric: String)
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = TopKByDistance.resultType
  override def prettyName: String = "nearest_heads"

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // cosine needs per-head norms; precompute once per executor
  @transient private lazy val headNorms: Array[Double] =
    headVecs.map { hv =>
      var s = 0.0; var i = 0
      while (i < hv.length) { s += hv(i) * hv(i); i += 1 }
      s
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val q = new Array[Double](n)
    var i = 0
    while (i < n) {
      q(i) = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var qNorm = 0.0
    if (metric == "cos") {
      var j = 0
      while (j < n) { qNorm += q(j) * q(j); j += 1 }
    }
    val buf = new TopKBuffer(r)
    var h = 0
    while (h < headVecs.length) {
      val hv = headVecs(h)
      val m = math.min(n, hv.length)
      val d = metric match {
        case "l2sq" =>
          var s = 0.0; var k = 0
          while (k < m) { val x = q(k) - hv(k); s += x * x; k += 1 }
          s
        case "dot" | "ip" =>
          var s = 0.0; var k = 0
          while (k < m) { s += q(k) * hv(k); k += 1 }
          if (metric == "ip") -s else s
        case "cos" =>
          var s = 0.0; var k = 0
          while (k < m) { s += q(k) * hv(k); k += 1 }
          val denom = math.sqrt(qNorm * headNorms(h))
          if (denom == 0.0) 1.0 else 1.0 - s / denom
      }
      buf.insert(d, headIds(h))
      h += 1
    }
    new GenericArrayData(buf.sorted.map { case (id, d) => InternalRow(id, d) })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestHeadsExpr {
  /** Collect a (ratio-bounded) heads frame and build the column. */
  def fromHeads(heads: DataFrame, vec: Column, r: Int, metric: String): Column = {
    val rows = heads.select("head_id", "head_vec").collect()
    val ids = rows.map(_.getLong(0))
    // widen float heads to double (exact) so one internal representation
    // serves both float- and double-typed head tables
    val vecs = rows.map(_.getSeq[Any](1).map {
      case f: java.lang.Float => f.toDouble
      case d: java.lang.Double => d.doubleValue
    }.toArray)
    ColumnShim.column(
      NearestHeadsExpr(ColumnShim.expression(vec), ids, vecs, r, metric))
  }
}
