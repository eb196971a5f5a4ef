package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the ubiquitous per-group top-k idiom
  *
  *   df.withColumn("rn", row_number().over(W)).filter($"rn" <= k).drop("rn")
  *
  * plans as Project -> Filter -> Window, which shuffles and SORTS every
  * row of every group before discarding all but k of them. When the rank
  * column itself is dropped (so only the selected rows matter, not their
  * numbers), the whole subtree is algebraically a per-key top-k — this
  * rule replaces it with the engine's [[TopKPerKey]] operator, whose
  * partial stage caps each input partition's contribution at k rows per
  * key BEFORE the exchange (see TopKPerKeyPlan.scala): the shuffle moves
  * O(partitions * keys * k) rows instead of the full table, and nothing
  * is globally sorted.
  *
  * This is the rule form of what Spark's InferWindowGroupLimit does for
  * rank filters — but where that optimization still materializes the
  * Window (it only prunes rows feeding it), this rewrite removes the
  * Window entirely, which is only legal because the rank value is dead.
  *
  * Rewrite conditions (all checked structurally, no heuristics):
  *  - the Window computes exactly ONE expression: `row_number()` over a
  *    spec with a non-empty ORDER BY;
  *  - the filter's conjuncts include `rn <= k` / `rn < k+1` / `rn = 1`
  *    with literal positive k on the row-number attribute;
  *  - no OTHER conjunct and no projected column references the rank
  *    attribute (it is dead outside the pruned filter);
  *  - ties at the boundary: row_number breaks ties arbitrarily when the
  *    ORDER BY is not total; the heap keeps an equally arbitrary k — the
  *    rewrite preserves Spark's nondeterminism class, not a particular
  *    tie outcome (queries wanting determinism already need a total
  *    order, rewritten or not).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (see
  * GraftExtensions), so it runs inside the operator-optimization batch —
  * BEFORE InferWindowGroupLimit's batch — on every session built with
  * the graft extensions; user code keeps writing the stock window idiom.
  */
object RankToTopKRule extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that the conjunct is `rank-attr <= k`, if it is one. */
  private def rankLimit(e: Expression, rn: ExprId): Option[Int] = e match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn && k == 1 => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, _)), _)), _, _, child, _)))
        if os.nonEmpty && ps.nonEmpty =>
      // ps empty (global rank) would need ClusteredDistribution(Nil),
      // which Spark rejects — the global form stays on the Window path
      // (see w09 for the scalable two-pass global rank)
      val conjuncts = splitConjunctivePredicates(cond)
      val ks = conjuncts.flatMap(rankLimit(_, alias.exprId))
      val rest = conjuncts.filter(rankLimit(_, alias.exprId).isEmpty)
      val rankIsDead = !(projectList ++ rest)
        .exists(_.references.exists(_.exprId == alias.exprId))
      // k <= 0 selects nothing; leave it to the stock plan rather than
      // special-casing an empty relation here
      if (ks.isEmpty || ks.min <= 0 || !rankIsDead) p
      else {
        val topk = TopKPerKey(ks.min, ps, os, child)
        Project(projectList,
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      }
  }
}
