package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** `pq_codes(vec)` → the `m` nearest-centroid codes of a vector, one pass,
  * no boxing — [[PQ.Codebooks.quantizeOne]] as a Catalyst expression.
  *
  * Per subspace `s` the scan keeps the FIRST index attaining the minimal
  * l2sq (strict `<` update over ascending `c`, exactly quantizeOne's rule),
  * with the same strict left-to-right per-pair accumulation — codes are
  * bit-identical to the Scala-UDF form, which built a boxed Seq slice per
  * (row, subspace) and profiled as the dominant cost of the quantize pass
  * (600 k rows × m subspaces per corpus quantization at sf0.1).
  */
case class PqCodesExpr(child: Expression,
    centers: Array[Array[Array[Double]]], dsub: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // flatten each subspace's centroid block once per executor: stride dsub
  @transient private lazy val flat: Array[Array[Double]] =
    centers.map { cs =>
      val out = new Array[Double](cs.length * dsub)
      var c = 0
      while (c < cs.length) {
        System.arraycopy(cs(c), 0, out, c * dsub, dsub)
        c += 1
      }
      out
    }

  override def nullSafeEval(v: Any): Any = evalArray(v.asInstanceOf[ArrayData])

  def evalArray(arr: ArrayData): ArrayData = {
    val m = centers.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val block = flat(s)
      val nC = centers(s).length
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      var base = 0
      while (c < nC) {
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (childIsFloat) arr.getFloat(off + i).toDouble
                   else arr.getDouble(off + i)) - block(base + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { best = c; bestD = d }
        c += 1
        base += dsub
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodesExpr].getName)
      s"${ev.value} = $ref.evalArray($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}

object PqCodesExpr {
  def apply(vec: Column, centers: Array[Array[Array[Double]]], dsub: Int): Column =
    ColumnShim.column(
      new PqCodesExpr(ColumnShim.expression(vec), centers, dsub))
}
