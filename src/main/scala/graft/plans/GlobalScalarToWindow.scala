package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse `frame ⋈ globalAgg(frame)` into ONE pass.
  *
  * The natural way to write "rows of F compared against a scalar of F"
  * (the TPC-H Q15 max-revenue view, Q11's HAVING-vs-total threshold, a
  * BM25 corpus-stats decoration) is a join between a frame and a global
  * aggregate over that same frame:
  *
  *   val agg = f.agg(max("x").as("mx"))
  *   f.join(broadcast(agg), $"x" === $"mx")        // or f.crossJoin(agg)
  *
  * Catalyst plans the frame's subtree TWICE for that shape — the analyzer
  * deduplicates the self-referenced attributes, so the two subtrees stop
  * being identical and not even AQE exchange reuse can merge them; if the
  * frame is an aggregation over a fact table, the fact is scanned and
  * aggregated twice (measured on Q2/Q15/Q11 in round 8 — the motivating
  * regressions). The equivalent single-pass form is a window over an
  * empty partition:
  *
  *   f.withColumn("mx", max($"x").over(Window.partitionBy()))
  *    .filter($"x" === $"mx")
  *
  * This rule performs that rewrite automatically when it is provably
  * sound:
  *  - the join is Inner/Cross and the right side is a GLOBAL aggregate
  *    (no grouping — exactly one row, so the join is a scalar decoration,
  *    never a multiplier);
  *  - stripped of deterministic top-level Filters, the left subtree is
  *    CANONICALLY EQUAL to the aggregate's child (same frame; the
  *    stripped filters are re-applied above the window, where they keep
  *    the aggregate's all-rows semantics);
  *  - every aggregate function involved is window-expressible and
  *    deterministic (sum/min/max/count/avg, no DISTINCT, no FILTER).
  *
  * Single-partition windows funnel the frame through one task, so the
  * rewrite is a win when the frame is smaller than re-deriving it — true
  * whenever the frame is itself an aggregation (dim-cardinality) over
  * something expensive. That is exactly the matched shape: the join's
  * 1-row side proves the user wanted a scalar of the frame, and the
  * duplicated subtree is the price the rule removes. Empty-input
  * semantics are preserved: a global aggregate emits one row and the
  * join then emits |F| rows — as does the window (zero rows when F is
  * empty, in both forms).
  *
  * Registered via `GraftExtensions` (injectOptimizerRule — runs in the
  * user-rule batch after the main optimization, when inferred IsNotNull
  * filters have already split the subtrees; `GlobalScalarToWindowSpec`
  * proves plan shape + result equality, and the full DuckDB oracle gate
  * runs every declared query through the rule).
  */
object GlobalScalarToWindow extends Rule[LogicalPlan] {

  private val frame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
  private val spec = WindowSpecDefinition(Nil, Nil, frame)

  private def windowable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
      (ae.aggregateFunction match {
        case _: Sum | _: Min | _: Max | _: Count | _: Average => true
        case _ => false
      })

  /** Split top-level deterministic Filters off a plan. */
  private def stripFilters(p: LogicalPlan): (Seq[Expression], LogicalPlan) =
    p match {
      case Filter(c, child) if c.deterministic =>
        val (rest, base) = stripFilters(child)
        (c +: rest, base)
      case other => (Nil, other)
    }

  /** Prove `other` is the same frame as `base` (up to attribute ids and
    * column pruning) and return the map from other's output attributes to
    * base's. Column pruning matters because the scalar aggregate usually
    * consumes a SUBSET of the frame's columns, so the optimizer narrows
    * the duplicated subtree before this rule sees it.
    */
  private def align(base: LogicalPlan, other: LogicalPlan): Option[AttributeMap[Attribute]] = {
    import org.apache.spark.sql.catalyst.plans.QueryPlan.normalizeExpressions
    if (base.canonicalized == other.canonicalized &&
        base.output.size == other.output.size)
      return Some(AttributeMap(other.output.zip(base.output)))
    (base, other) match {
      // same child frame, other's aggregate list pruned to a subset
      case (b @ Aggregate(g1, a1, c1, _), o @ Aggregate(g2, a2, c2, _))
          if c1.canonicalized == c2.canonicalized &&
            g1.map(normalizeExpressions(_, c1.output).canonicalized) ==
              g2.map(normalizeExpressions(_, c2.output).canonicalized) =>
        val normBase = a1.map(normalizeExpressions(_, c1.output).canonicalized)
        val pairs = a2.zip(o.output).map { case (e2, out2) =>
          val i = normBase.indexOf(normalizeExpressions(e2, c2.output).canonicalized)
          if (i < 0) return None
          out2 -> b.output(i)
        }
        Some(AttributeMap(pairs))
      // other is an attribute-only projection of the same frame
      case (_, Project(ps, c2)) if ps.forall(_.isInstanceOf[Attribute]) =>
        align(base, c2).map { m =>
          AttributeMap(other.output.zip(
            ps.map(p => m.getOrElse(p.asInstanceOf[Attribute],
              p.asInstanceOf[Attribute]))))
        }
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, cond, _)
        if (jt == Inner || jt == Cross) && cond.forall(_.deterministic) =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Option[Expression]): Option[LogicalPlan] = {
    // right = [Filters over agg output] Aggregate(Nil, aggExprs, aggChild)
    val (rightFilters, rightBase) = stripFilters(right)
    val agg = rightBase match {
      case a @ Aggregate(Nil, _, _, _) => a
      case _ => return None
    }
    if (!agg.aggregateExpressions.forall(_.isInstanceOf[Alias])) return None
    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (aggFns.isEmpty || !aggFns.forall(windowable)) return None
    if (!agg.aggregateExpressions.forall(_.deterministic)) return None

    // left = [Filters] base, base ≅ agg.child (the same frame, re-analyzed
    // with fresh attribute ids by DeduplicateRelations, and possibly
    // column-pruned down to what the scalar aggregate consumes)
    val (leftFilters, leftBase) = stripFilters(left)
    val attrMap = align(leftBase, agg.child).getOrElse(return None)
    def remap(e: Expression): Expression = e.transform {
      case a: Attribute => attrMap.getOrElse(a, a)
    }

    // one window column per distinct aggregate call
    val distinctFns = {
      val seen = scala.collection.mutable.LinkedHashMap
        .empty[Expression, (AggregateExpression, Alias)]
      aggFns.foreach { ae =>
        val r = remap(ae).asInstanceOf[AggregateExpression]
        seen.getOrElseUpdate(ae.canonicalized,
          (ae, Alias(WindowExpression(r, spec), "_gstw")()))
      }
      seen
    }
    val win = Window(distinctFns.values.map(_._2).toSeq, Nil, Nil, leftBase)

    // re-apply the left filters, then project the join's output schema:
    // left.output ++ the aggregate's named outputs (same exprIds, so every
    // downstream reference keeps resolving), then the join condition
    val filtered = leftFilters.foldRight(win: LogicalPlan)(Filter(_, _))
    val aggOutputs = agg.aggregateExpressions.map { case a: Alias =>
      val newChild = a.child.transform {
        case ae: AggregateExpression => distinctFns(ae.canonicalized)._2.toAttribute
      }
      Alias(newChild, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    val projected = Project(left.output ++ aggOutputs, filtered)
    val withCond = (cond.toSeq ++ rightFilters)
      .foldRight(projected: LogicalPlan)(Filter(_, _))
    // the rewrite must preserve the join's output exactly
    if (withCond.output.map(_.exprId) != j.output.map(_.exprId)) return None
    Some(withCond)
  }
}
