package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: pre-aggregate below grouping-set expansion.
  *
  * ROLLUP / CUBE / GROUPING SETS analyze to `Aggregate(keys+gid, aggs,
  * Expand(projections, ..., child))`, and Expand replicates EVERY child row
  * once per grouping set — on a 100 TB fact table that is billions of rows
  * times the number of grouping sets, shuffled into the final aggregation.
  * When every aggregate is re-aggregatable (COUNT re-aggregates as SUM;
  * SUM/MIN/MAX as themselves), the same result is obtained by first
  * aggregating `child` to the finest grouping (all grouping columns), then
  * expanding only the |distinct groups| pre-aggregated rows:
  *
  *   Aggregate(keys+gid, aggs', Expand(proj', Aggregate(keys, partials, child)))
  *
  * The reference engine hand-rolls three rewrite rules on its own plan tree
  * (SURVEY.md §4.1); this is the same mechanism Spark-natively — a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * (graft.engine.GraftExtensions), running inside Catalyst's operator-
  * optimization fixed point. The rewrite is opt-out-safe: it fires only on
  * the exact Aggregate-over-Expand shape with plain COUNT/SUM/MIN/MAX
  * (no DISTINCT, no FILTER), bails whenever any slot is not understood,
  * and is idempotent (the rewritten plan has an Aggregate under Expand,
  * which the guard rejects). Contract queries q_rollup / q_cube /
  * q_grouping_sets are written single-phase and verified against the
  * DuckDB oracle WITH this rule active, proving semantics preservation.
  */
object PreAggGroupingSets extends Rule[LogicalPlan] {

  private def supported(a: AggregateExpression): Boolean =
    !a.isDistinct && a.filter.isEmpty && (a.aggregateFunction match {
      case _: Count | _: Sum | _: Min | _: Max => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, _, ex: Expand, _)
        if !ex.child.isInstanceOf[Aggregate] && ex.projections.length >= 2 =>
      rewrite(agg, ex).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate, ex: Expand): Option[Aggregate] = {
    val child = ex.child
    val projections = ex.projections
    val output = ex.output

    // Grouping expressions must be bare attributes: the grouping columns
    // plus Spark's synthetic spark_grouping_id.
    val geAttrs = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }
    val gidAttr = geAttrs.find(_.name == VirtualColumn.groupingIdName)
      .getOrElse(return None)
    val groupingAttrs = geAttrs.filterNot(_.exprId == gidAttr.exprId)
    // GROUP BY GROUPING SETS ((),()): with no grouping columns the injected
    // partial Aggregate would be global and emit one row on EMPTY input,
    // where the unrewritten plan emits zero rows — bail.
    if (groupingAttrs.isEmpty) return None
    val posOf = output.map(_.exprId).zipWithIndex.toMap
    val gidPos = posOf.getOrElse(gidAttr.exprId, return None)
    val groupingPos = groupingAttrs.map(a => posOf.getOrElse(a.exprId, return None))

    // Every gid slot is an integer literal; every grouping slot is either
    // the source attribute or a null literal (the grouping-set pattern).
    if (!projections.forall(_(gidPos).isInstanceOf[Literal])) return None
    val baseKeys: Seq[Attribute] = groupingPos.map { j =>
      var key: Attribute = null
      projections.foreach { p =>
        p(j) match {
          case Literal(null, _) => ()
          case a: Attribute =>
            if (key == null) key = a else if (key.exprId != a.exprId) return None
          case _ => return None
        }
      }
      if (key == null) return None
      key
    }
    if (!baseKeys.forall(child.outputSet.contains)) return None

    // Aggregates: plain COUNT/SUM/MIN/MAX over child columns only (an
    // aggregate over a null-patterned grouping output is NOT re-aggregatable).
    val aggExprs = agg.aggregateExpressions.flatMap(_.collect {
      case a: AggregateExpression => a
    })
    if (aggExprs.isEmpty || !aggExprs.forall(supported)) return None
    val groupingOutSet = AttributeSet(geAttrs)
    if (!aggExprs.forall(a => a.references.subsetOf(child.outputSet) &&
        a.references.intersect(groupingOutSet).isEmpty)) return None

    // One partial per distinct aggregate; the final re-aggregation keeps
    // the original result type (a re-summed DECIMAL widens, so cast back).
    val partialFor = mutable.LinkedHashMap.empty[Expression, (Alias, Expression)]
    aggExprs.foreach { a =>
      val key = a.canonicalized
      if (!partialFor.contains(key)) {
        val partial = Alias(a, s"_pre${partialFor.size}")()
        val pAttr = partial.toAttribute
        val fin: Expression = a.aggregateFunction match {
          case _: Count => Sum(pAttr).toAggregateExpression()
          case _: Min   => Min(pAttr).toAggregateExpression()
          case _: Max   => Max(pAttr).toAggregateExpression()
          case _: Sum =>
            val f = Sum(pAttr).toAggregateExpression()
            if (f.dataType == a.dataType) f else Cast(f, a.dataType)
        }
        partialFor(key) = (partial, fin)
      }
    }
    val partials = partialFor.values.map(_._1).toSeq
    val partialAgg = Aggregate(baseKeys,
      baseKeys.map(a => a: NamedExpression) ++ partials, child, None)

    val partialAttrs = partials.map(_.toAttribute)
    val newOutput = partialAttrs ++ groupingPos.map(output(_)) :+ output(gidPos)
    val newProjections = projections.map { p =>
      partialAttrs.map(a => a: Expression) ++ groupingPos.map(p(_)) :+ p(gidPos)
    }
    val newExpand = Expand(newProjections, newOutput, partialAgg)

    val newAggExprs = agg.aggregateExpressions.map(_.transformUp {
      case a: AggregateExpression if partialFor.contains(a.canonicalized) =>
        partialFor(a.canonicalized)._2
    }.asInstanceOf[NamedExpression])
    Some(Aggregate(agg.groupingExpressions, newAggExprs, newExpand, agg.hint))
  }
}
