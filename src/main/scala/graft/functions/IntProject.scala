package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `int_project(sv)` — integer matrix-vector product: row `j` of the output
  * is `Σ_d sv[d] · weights[j][d]` over a `ARRAY<BIGINT>` input. Exact LONG
  * arithmetic, identical to the unrolled
  * `getItem(d) * lit(w) reduce(+)` column formulation it replaces — that
  * form generated one `+`-chain term per (row, dim) pair (~13k generated
  * Java lines for an 8×64 projection), blowing Janino's 64 KB method limit
  * and knocking the whole stage out of whole-stage codegen; this expression
  * is one generated call. A missing coordinate (input shorter than a weight
  * row) nulls the whole output, mirroring the old form's NULL-propagating
  * getItem.
  */
case class IntProjectExpr(child: Expression, weights: Array[Array[Long]])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  // evalArray itself returns null on a short input, so the expression is
  // nullable even over a non-null child — without this override ev.isNull
  // is the FalseLiteral constant and the generated assignment to it fails
  // Janino compilation ("not an rvalue")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int_project"

  override def nullSafeEval(v: Any): Any = evalArray(v.asInstanceOf[ArrayData])

  def evalArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](weights.length)
    var j = 0
    while (j < weights.length) {
      val w = weights(j)
      if (w.length > n) return null
      var s = 0L
      var d = 0
      while (d < w.length) { s += arr.getLong(d) * w(d); d += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intProject", this,
      classOf[IntProjectExpr].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.evalArray($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `codepoint_hist(text)` — ONE pass over a string's code points producing
  * `[count(cp % bins = 0), …, count(cp % bins = bins−1), n_codepoints,
  * Σ codepoints]` as `ARRAY<BIGINT>[bins + 2]`. Replaces the
  * `transform(sequence(1, length), i -> ascii(substr(i, 1)))` +
  * per-bin `filter` column formulation, which is O(len²) per row (each
  * substr(i, 1) re-walks the string to offset i, and each of the 64 bin
  * filters re-scans the exploded array) — the q122/q163 verify dumps were
  * dominated by it, and at corpus scale a quadratic per-row cost is a
  * correctness-of-design bug, not a constant. Value-identical: Spark's
  * `length`/`substr`/`ascii` operate on code points, exactly this walk.
  */
case class CodepointHistExpr(child: Expression, bins: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "codepoint_hist"

  override def nullSafeEval(v: Any): Any =
    evalString(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  def evalString(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = u.toString
    val out = new Array[Long](bins + 2)
    var i = 0
    var n = 0L
    var sum = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(cp % bins) += 1
      n += 1
      sum += cp
      i += Character.charCount(cp)
    }
    out(bins) = n
    out(bins + 1) = sum
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codepointHist", this,
      classOf[CodepointHistExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalString($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `centered_project(x)` — the PCA projection `out_j = round((Σ_i (x_i −
  * mean_i) · comp_j_i) · postScale_j, roundScale)` as one compact call,
  * replacing the unrolled per-(component, dim) literal column chains that
  * blew Janino's 64 KB method limit on q217/q297 (the IntProjectExpr
  * rationale, double flavor). Bit-identical to the column form: strict
  * left-to-right double accumulation over ascending i, multiply-then-round,
  * and `BigDecimal.valueOf(x).setScale(s, HALF_UP)` — exactly Spark's
  * `round()` on DoubleType (the nearDupStream precedent). An input shorter
  * than the component width nulls the output (the old form nulled every
  * coordinate through getItem's NULL propagation).
  */
case class CenteredProjectExpr(
    child: Expression,
    mean: Array[Double],
    components: Array[Array[Double]],
    postScale: Array[Double],
    roundScale: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  // see IntProjectExpr: null-returning evalArray requires nullable = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centered_project"

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = evalArray(v.asInstanceOf[ArrayData])

  def evalArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Double](components.length)
    var j = 0
    while (j < components.length) {
      val comp = components(j)
      if (comp.length > n) return null
      var s = 0.0
      var i = 0
      while (i < comp.length) {
        val x = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        s += (x - mean(i)) * comp(i)
        i += 1
      }
      out(j) = BigDecimal.valueOf(s * postScale(j))
        .setScale(roundScale, BigDecimal.RoundingMode.HALF_UP).toDouble
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centeredProject", this,
      classOf[CenteredProjectExpr].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.evalArray($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
