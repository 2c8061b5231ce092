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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val folded = plan.transformAllExpressions {
      case GreaterThanOrEqual(_: CosineSimilarity, Literal(d: Double, DoubleType))
          if d > Bound => Literal.FalseLiteral
      case GreaterThan(_: CosineSimilarity, Literal(d: Double, DoubleType))
          if d >= Bound => Literal.FalseLiteral
      case LessThanOrEqual(Literal(d: Double, DoubleType), _: CosineSimilarity)
          if d > Bound => Literal.FalseLiteral
      case LessThan(Literal(d: Double, DoubleType), _: CosineSimilarity)
          if d >= Bound => Literal.FalseLiteral
    }
    // When installed via experimental.extraOptimizations this runs AFTER
    // the main batches (PruneFilters/PropagateEmptyRelation won't re-run;
    // by then the predicate may even sit in a pushed join condition), so
    // collapse the now-false subtrees ourselves.
    folded.transform {
      case f @ Filter(Literal.FalseLiteral, _) =>
        LocalRelation(f.output, Nil, isStreaming = false)
      case j @ Join(_, _, _: InnerLike, Some(Literal.FalseLiteral), _) =>
        LocalRelation(j.output, Nil, isStreaming = false)
    }
  }
}

/** Production registration hook:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => ImpossibleCosineFilter)
}
