package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/**
 * Optimizer-rule form of the skew-split COUNT(DISTINCT) rewrite — the
 * reference's `SplitAggregateRule`
 * (`flink-table-planner/.../rules/logical/SplitAggregateRule`, gated
 * there behind `table.optimizer.distinct-agg.split.enabled`; SURVEY
 * §4.1 "Distinct-agg split (skew)"). For SQL users who can't call
 * `graft.operators.SkewAgg` directly:
 *
 *   Aggregate(g, count(DISTINCT x))
 *     → Aggregate(g, sum(pc))
 *         over Aggregate(g ++ pmod(xxhash64(x), N), count(DISTINCT x) pc)
 *
 * Off by default, like the reference: enable with
 * `spark.graft.distinctAggSplit.buckets = N` (N > 0) plus
 * `spark.experimental.extraOptimizations` or the
 * `graft.functions.GraftExtensions` entry point. The rewrite fires
 * only on the narrow shape it provably preserves: attribute grouping
 * keys and exactly one undistorted COUNT(DISTINCT attr) (no FILTER
 * clause, no other aggregate functions) — everything else is left to
 * Catalyst's stock RewriteDistinctAggregates.
 */
case class SplitDistinctAggRule() extends Rule[LogicalPlan] {

  private val SaltName = "__graft_salt"

  private def buckets: Int =
    try SQLConf.get.getConfString("spark.graft.distinctAggSplit.buckets", "0").toInt
    catch { case _: NumberFormatException => 0 }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val n = buckets
    if (n <= 0) return plan
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if eligible(groupExprs, aggExprs) =>
        val groupAttrs = groupExprs.map(_.asInstanceOf[Attribute])
        val (distinctAlias, cnt) = theDistinctCount(aggExprs).get
        // the salt is grouped as a raw expression over the child (the
        // aliased copy in the output is the plan marker; downstream
        // column pruning may drop it)
        val saltExpr = Pmod(new XxHash64(cnt.aggregateFunction.children), Literal(n.toLong))
        val salt = Alias(saltExpr, SaltName)()
        val pc = Alias(
          AggregateExpression(
            Count(cnt.aggregateFunction.children), Complete, isDistinct = true),
          "__graft_pc")()
        val inner = Aggregate(
          groupAttrs :+ saltExpr,
          groupAttrs ++ Seq(salt, pc),
          child)
        // coalesce: a global (no-group) distinct count over EMPTY input
        // must stay 0 — sum over the empty inner aggregate is NULL
        val total = Alias(
          Coalesce(Seq(
            Cast(AggregateExpression(Sum(pc.toAttribute), Complete, isDistinct = false),
              LongType),
            Literal(0L))),
          distinctAlias.name)(exprId = distinctAlias.exprId)
        Aggregate(
          groupAttrs,
          aggExprs.map {
            case a: Alias if a.exprId == distinctAlias.exprId => total
            case other => other
          },
          inner)
    }
  }

  /** The single COUNT(DISTINCT attr) alias, if the shape qualifies. */
  private def theDistinctCount(aggExprs: Seq[NamedExpression]): Option[(Alias, AggregateExpression)] = {
    val counts = aggExprs.collect {
      case a @ Alias(ae @ AggregateExpression(c: Count, _, true, None, _), _)
          if c.children.forall(_.isInstanceOf[Attribute]) => (a, ae)
    }
    if (counts.size == 1) counts.headOption else None
  }

  private def eligible(groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression]): Boolean = {
    val allAttrGroups = groupExprs.forall(_.isInstanceOf[Attribute])
    // never re-match our own inner aggregate
    val salted = groupExprs.exists {
      case a: Attribute => a.name == SaltName
      case _ => false
    }
    def isGroupPassthrough(e: NamedExpression) = e match {
      case a: Attribute => groupExprs.exists(_.semanticEquals(a))
      case _ => false
    }
    // every aggregate alias must BE the single rewritable distinct
    // count — a second aggregate (even another count-distinct over an
    // expression) would reference child columns the salted inner
    // aggregate no longer outputs
    val onlyThatAggregate = theDistinctCount(aggExprs) match {
      case None => false
      case Some((theAlias, _)) =>
        aggExprs.forall { e =>
          isGroupPassthrough(e) || (e match {
            case a: Alias => a.exprId == theAlias.exprId
            case _ => false
          })
        }
    }
    allAttrGroups && !salted && onlyThatAggregate
  }
}
