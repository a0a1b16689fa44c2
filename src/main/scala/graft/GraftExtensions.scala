package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorDistance

/** SparkSessionExtensions registration: exposes the distance kernels to SQL
  * (`SELECT dist_l2sq(a.vec, b.vec) ...`). Enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, metric) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorDistance].getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"$name expects 2 arguments")
          VectorDistance(args.head, args(1), metric)
        }))
    }
    // window-top-k → bounded-aggregate rewrite (semantics-preserving; see
    // graft.plans.WindowTopKRewrite; spark.graft.rewriteWindowTopK=false
    // to disable)
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftExtensions {
  val functions: Seq[(String, String)] = Seq(
    "dist_l2sq" -> "l2sq",
    "dist_dot" -> "dot",
    "dist_ip" -> "ip",
    "dist_cos" -> "cos")

  /** Register on an ALREADY-RUNNING session (builder extensions only apply
    * to sessions created after `.withExtensions`; `getOrCreate` on an
    * existing session silently ignores them).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, metric) =>
      org.apache.spark.sql.graft.ColumnShim.registerFunction(
        spark, name, args => {
          require(args.length == 2, s"$name expects 2 arguments")
          VectorDistance(args.head, args(1), metric)
        })
    }
}
