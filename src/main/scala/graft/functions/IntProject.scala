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
