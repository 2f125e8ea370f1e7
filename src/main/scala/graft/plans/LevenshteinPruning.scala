package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: strengthen `levenshtein(a, b) <= k` predicates with
  * the cheap necessary condition `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is bounded below by the length difference, so the
  * added conjunct never changes results — but it is evaluable in a few
  * instructions versus the O(|a|·|b|) DP of levenshtein, and (unlike
  * the levenshtein call) it is a band predicate the optimizer can push
  * independently toward each join side's scan. On the self-similarity
  * join (SURVEY.md §2.3 J14) this prunes most candidate pairs before
  * the expensive comparison runs.
  *
  * Fixpoint safety: the optimizer re-applies rules until stable, so the
  * rewrite must be idempotent — we skip any predicate whose guard is
  * already present among the conjuncts.
  */
object LevenshteinPruning extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, bound: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), bound)

  private def strengthen(cond: Expression): Expression = {
    val conjuncts = splitConjuncts(cond)
    val guards = conjuncts.flatMap {
      case LessThanOrEqual(lev: Levenshtein, bound: Literal) =>
        Some(guardFor(lev, bound))
      case LessThan(lev: Levenshtein, bound: Literal) =>
        Some(guardFor(lev, bound))
      case GreaterThanOrEqual(bound: Literal, lev: Levenshtein) =>
        Some(guardFor(lev, bound))
      case _ => None
    }
    val missing = guards.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    missing.foldLeft(cond)(And(_, _))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val strengthened = strengthen(cond)
      if (strengthened fastEquals cond) f else Filter(strengthened, child)
    // predicate pushdown may have moved the filter into the join condition
    case j @ Join(_, _, _, Some(cond), _) =>
      val strengthened = strengthen(cond)
      if (strengthened fastEquals cond) j else j.copy(condition = Some(strengthened))
  }
}
