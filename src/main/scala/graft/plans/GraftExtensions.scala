package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** Optimizer rule: impossible-cosine-threshold pruning.
  *
  * Cosine similarity is bounded above by 1 (Cauchy–Schwarz; our expression
  * returns 0.0 for degenerate inputs), so a predicate `cosine_sim(a,b) ≥ t`
  * with t meaningfully above 1 can never hold. Folding it to FALSE lets
  * Catalyst's PruneFilters + PropagateEmptyRelation collapse the whole
  * subtree — the vector scan never runs. The margin guards against the
  * ~1+ε float roundoff of self-similarity.
  *
  * This is the SURVEY §4 "custom Rule" demo: semantics-preserving,
  * injected either per-session (`Graft.init` via
  * `spark.experimental.extraOptimizations`) or cluster-wide via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object ImpossibleCosineFilter extends Rule[LogicalPlan] {
  private val Bound = 1.0 + 1e-6

  /** A comparison that can only evaluate to FALSE or NULL, never TRUE. */
  private def isImpossible(e: Expression): Boolean = e match {
    case GreaterThanOrEqual(_: CosineSimilarity, Literal(d: Double, DoubleType)) => d > Bound
    case GreaterThan(_: CosineSimilarity, Literal(d: Double, DoubleType)) => d >= Bound
    case LessThanOrEqual(Literal(d: Double, DoubleType), _: CosineSimilarity) => d > Bound
    case LessThan(Literal(d: Double, DoubleType), _: CosineSimilarity) => d >= Bound
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Null-rejecting positions: a Filter (or inner-join condition) emits a
    // row only when the condition is TRUE, so a top-level conjunct that can
    // only be FALSE-or-NULL empties the subtree regardless of nullability.
    // When installed via experimental.extraOptimizations this runs AFTER the
    // main batches (PruneFilters/PropagateEmptyRelation won't re-run; by
    // then the predicate may even sit in a pushed join condition), so we
    // collapse the subtree ourselves — preserving the plan's isStreaming.
    val pruned = plan.transform {
      case f @ Filter(cond, _) if conjuncts(cond).exists(isImpossible) =>
        LocalRelation(f.output, Nil, isStreaming = f.isStreaming)
      case j @ Join(_, _, _: InnerLike, Some(cond), _)
          if conjuncts(cond).exists(isImpossible) =>
        LocalRelation(j.output, Nil, isStreaming = j.isStreaming)
    }
    // Everywhere else (projections, NOT(...), outer-join conditions) the
    // NULL outcome is observable — NOT(NULL) is NULL, not TRUE — so fold to
    // FALSE only when the predicate cannot be NULL.
    pruned.transformAllExpressions {
      case e if isImpossible(e) && !e.nullable => Literal.FalseLiteral
    }
  }
}

/** Production registration hook:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => ImpossibleCosineFilter)
}
