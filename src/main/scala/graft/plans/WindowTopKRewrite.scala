package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TopKByDistance

/** Optimizer rule: rewrite the naive window-formulated top-k —
  *
  * {{{
  * Project [p, rank, id, dist...]
  *   Filter rank <= k
  *     Window [row_number() over (partition by p order by dist ASC, id ASC) AS rank]
  *       child
  * }}}
  *
  * — into the bounded [[TopKByDistance]] aggregate + explode, the plan shape
  * whose exchange carries O(|groups|·k·tasks) rows instead of the full
  * |groups|×|candidates| space (a Window must shuffle EVERY candidate row to
  * its group's partition before ranking; the aggregate reduces map-side).
  *
  * Fires only when it is semantics-preserving and strictly better:
  *  - the window function is exactly `row_number()` ordered by
  *    `(<double expr> ASC, <long attr> ASC)` — the engine's deterministic
  *    (dist, id) contract;
  *  - the filter is `rank <= lit` / `rank < lit` / `= lit`;
  *  - everything projected above is in {partition keys, rank, id, dist}, so
  *    dropping the other candidate columns is safe.
  *
  * Registered by [[graft.GraftExtensions]] (injectOptimizerRule); disable
  * with `spark.graft.rewriteWindowTopK=false`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def enabled(plan: LogicalPlan): Boolean =
    conf.getConfString("spark.graft.rewriteWindowTopK", "true").toBoolean

  /** Extract the limit k from the rank predicate. */
  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) =>
      Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) =>
      Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) && k == 1 =>
      Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled(plan)) return plan
    plan.transformUp {
      case p @ Project(projList,
          Filter(cond,
            w @ Window(
              Seq(a @ Alias(WindowExpression(RowNumber(),
                WindowSpecDefinition(partitionSpec, Seq(
                  SortOrder(distExpr, Ascending, _, _),
                  SortOrder(idAttr: Attribute, Ascending, _, _)), _)), _)),
              _, _, child, _)))
          if idAttr.dataType == LongType &&
            distExpr.dataType == org.apache.spark.sql.types.DoubleType &&
            distExpr.deterministic &&
            partitionSpec.forall(_.isInstanceOf[Attribute]) =>
        val rankAttr = a.toAttribute
        rankLimit(cond, rankAttr) match {
          case Some(k) if k > 0 &&
              // every column the Project uses must survive the aggregate
              projList.flatMap(_.references).forall { r =>
                partitionSpec.exists(_.asInstanceOf[Attribute].semanticEquals(r)) ||
                r.semanticEquals(rankAttr) || r.semanticEquals(idAttr) ||
                distExpr.references.contains(r) && distExpr.isInstanceOf[Attribute] &&
                  distExpr.asInstanceOf[Attribute].semanticEquals(r)
              } =>
            val partAttrs = partitionSpec.map(_.asInstanceOf[Attribute])
            // groupBy(partition keys).agg(topk(id, dist, k) AS nn)
            val topkAgg = TopKByDistance(idAttr, distExpr, k).toAggregateExpression()
            val nnAlias = Alias(topkAgg, "_nn")()
            val agg = Aggregate(partAttrs, partAttrs :+ nnAlias, child)
            // posexplode(nn) → (pos, r struct<id, dist>)
            val posExplode = PosExplode(nnAlias.toAttribute)
            val posAttr = AttributeReference("_pos", IntegerType, nullable = false)()
            val rAttr = AttributeReference("_r",
              TopKByDistance.resultType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
                .elementType, nullable = false)()
            val gen = Generate(posExplode, unrequiredChildIndex = Nil, outer = false,
              qualifier = None, generatorOutput = Seq(posAttr, rAttr), child = agg)
            // rebuild the original projection in terms of the exploded rows
            val newProj = projList.map { ne =>
              val rebuilt = ne.transform {
                case attr: Attribute if attr.semanticEquals(rankAttr) =>
                  Add(posAttr, Literal(1))
                case attr: Attribute if attr.semanticEquals(idAttr) =>
                  GetStructField(rAttr, 0, Some("id"))
                case attr: Attribute if distExpr.isInstanceOf[Attribute] &&
                    attr.semanticEquals(distExpr.asInstanceOf[Attribute]) =>
                  GetStructField(rAttr, 1, Some("dist"))
              }
              (rebuilt match {
                case al: Alias => al
                case other     => Alias(other, ne.name)(exprId = ne.exprId)
              }): NamedExpression
            }
            Project(newProj, gen)
          case _ => p
        }
    }
  }
}
