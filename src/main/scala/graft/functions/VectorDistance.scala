package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Distance kernels over dense vectors, as a whole-stage-codegen'd Catalyst
  * expression (no UDF / no boxing in the hot loop).
  *
  * Semantics mirror the reference kernels
  * (`AnnService/inc/Core/Common/DistanceUtils.h:22-163`):
  *   - `l2sq` : SQUARED euclidean distance, `sum((x-y)^2)`
  *   - `dot`  : plain inner product `sum(x*y)`
  *   - `ip`   : inner product as a DISTANCE (smaller = closer), `-dot`
  *              (the reference dispatches InnerProduct to the cosine kernel,
  *              `DistanceUtils.h:124-140`; the monotone-equivalent `-dot`
  *              keeps ranking identical)
  *   - `cos`  : cosine distance `1 - dot / sqrt(|x|^2 * |y|^2)`
  *              (`DistanceUtils.h:105-116` converts cosine similarity to a
  *              distance; zero-norm inputs yield distance 1.0)
  *
  * All math is double-precision with strict left-to-right accumulation so the
  * DuckDB oracle (`list_sum(list_transform(list_zip(a,b), ...))` with `::DOUBLE`
  * widening) produces bitwise-identical results. Float inputs are widened
  * per-element (exact); mixed float/double operands are supported.
  */
case class VectorDistance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"dist_$metric"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val typesOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    })
    if (!typesOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    else if (!VectorDistance.Metrics.contains(metric))
      TypeCheckResult.TypeCheckFailure(
        s"unknown metric '$metric' (expected one of ${VectorDistance.Metrics.mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    @inline def lx(i: Int): Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
    @inline def ry(i: Int): Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
    metric match {
      case "l2sq" =>
        var s = 0.0; var i = 0
        while (i < n) { val d = lx(i) - ry(i); s += d * d; i += 1 }
        s
      case "dot" | "ip" =>
        var s = 0.0; var i = 0
        while (i < n) { s += lx(i) * ry(i); i += 1 }
        if (metric == "ip") -s else s
      case "cos" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val xv = lx(i); val yv = ry(i)
          dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
        }
        val denom = math.sqrt(na * nb)
        if (denom == 0.0) 1.0 else 1.0 - dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat" else s"$a.getDouble"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat" else s"$b.getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val header = s"final int $n = java.lang.Math.min($a.numElements(), $b.numElements());"
      metric match {
        case "l2sq" =>
          s"""
             |$header
             |double $s = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double d = $lGet($i) - $rGet($i);
             |  $s += d * d;
             |}
             |${ev.value} = $s;
           """.stripMargin
        case "dot" | "ip" =>
          val sign = if (metric == "ip") "-" else ""
          s"""
             |$header
             |double $s = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $s += $lGet($i) * $rGet($i);
             |}
             |${ev.value} = $sign$s;
           """.stripMargin
        case "cos" =>
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val dn = ctx.freshName("dn")
          s"""
             |$header
             |double $s = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final double x = $lGet($i);
             |  final double y = $rGet($i);
             |  $s += x * y; $na += x * x; $nb += y * y;
             |}
             |final double $dn = java.lang.Math.sqrt($na * $nb);
             |${ev.value} = ($dn == 0.0) ? 1.0 : 1.0 - $s / $dn;
           """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDistance {
  val Metrics: Set[String] = Set("l2sq", "dot", "ip", "cos")
}

/** Column-API front door for the distance kernels. */
object dist {
  private def mk(metric: String)(a: Column, b: Column): Column =
    ColumnShim.column(VectorDistance(ColumnShim.expression(a), ColumnShim.expression(b), metric))

  /** Squared L2 distance (reference semantics: L2 is squared). */
  def l2sq(a: Column, b: Column): Column = mk("l2sq")(a, b)
  /** Inner product. */
  def dot(a: Column, b: Column): Column = mk("dot")(a, b)
  /** Inner product as a distance (`-dot`, smaller = closer). */
  def ip(a: Column, b: Column): Column = mk("ip")(a, b)
  /** Cosine distance `1 - cos_sim`. */
  def cos(a: Column, b: Column): Column = mk("cos")(a, b)

  def byName(metric: String)(a: Column, b: Column): Column = mk(metric)(a, b)
}
