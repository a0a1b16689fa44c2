package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
    // malformed input fails loudly (r15 ADVICE): the replaced UDF's
    // vec.slice silently scored a truncated tail on a short vector; the
    // direct-offset reads below would instead throw an opaque
    // ArrayIndexOutOfBoundsException from generated code
    if (arr.numElements() < m * dsub)
      throw new IllegalArgumentException(
        s"pq_codes: vector has ${arr.numElements()} elements, " +
          s"codebook expects m*dsub = ${m * dsub}")
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

/** `pq_assign(sub, sv)` → nearest-centroid code of ONE subvector against
  * `centers(sub)` — the Lloyd-iteration assignment of [[PQ.train]] as a
  * Catalyst expression. Bit-identical to the Scala-UDF form it replaces:
  * same strict left-to-right per-pair accumulation, same strict `<` first-min
  * update over ascending `c` — only the per-row boxing (a `Seq[Double]`
  * materialized per (row, iteration)) is gone. The codebooks are
  * iteration-local plan constants, exactly as the UDF captured them via
  * broadcast; with the shared codegen cache the per-iteration re-plan is
  * cheap (r15 wave E).
  */
case class PqAssignExpr(left: Expression, right: Expression,
    centers: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(subAny: Any, svAny: Any): Any =
    evalAssign(subAny.asInstanceOf[Int], svAny.asInstanceOf[ArrayData])

  def evalAssign(sub: Int, sv: ArrayData): Int = {
    val cs = centers(sub)
    val n = sv.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cc = cs(c)
      var d = 0.0
      var i = 0
      while (i < n) { val x = sv.getDouble(i) - cc(i); d += x * x; i += 1 }
      if (d < bestD) { best = c; bestD = d }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sub, sv) => {
      val ref = ctx.addReferenceObj("pqAssign", this, classOf[PqAssignExpr].getName)
      s"${ev.value} = $ref.evalAssign($sub, $sv);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssignExpr =
    copy(left = newLeft, right = newRight)
}

object PqAssignExpr {
  def apply(sub: Column, sv: Column,
      centers: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(new PqAssignExpr(
      ColumnShim.expression(sub), ColumnShim.expression(sv), centers))
}

/** `pq_reconstruct(codes)` → the centroid concatenation `centers(s)(codes(s))`
  * — [[PQ.reconstruct]]'s UDF as an expression. Values are read from the very
  * same codebook arrays the UDF arraycopy'd, so reconstructions are
  * bit-identical; only the per-row boxed `Seq[Int]` and the Scala-UDF
  * serialization wrapper are gone (the residual chain of q197 runs this over
  * the full corpus twice per train+quantize).
  */
case class PqReconstructExpr(child: Expression,
    centers: Array[Array[Array[Double]]], dsub: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(codesAny: Any): Any =
    evalArray(codesAny.asInstanceOf[ArrayData])

  def evalArray(codes: ArrayData): ArrayData = {
    val m = centers.length
    val out = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      System.arraycopy(centers(s)(codes.getInt(s)), 0, out, s * dsub, dsub)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqRecon", this, classOf[PqReconstructExpr].getName)
      s"${ev.value} = $ref.evalArray($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqReconstructExpr =
    copy(child = newChild)
}

object PqReconstructExpr {
  def apply(codes: Column, centers: Array[Array[Array[Double]]], dsub: Int): Column =
    ColumnShim.column(
      new PqReconstructExpr(ColumnShim.expression(codes), centers, dsub))
}
