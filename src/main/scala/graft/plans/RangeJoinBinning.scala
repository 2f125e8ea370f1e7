package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: plan a pure range join as a binned equi-join.
  *
  * An inner join whose only predicate is a time-band condition
  * `rt >= lt + offL AND rt < lt + offU` (no equi conjunct) is planned
  * by stock Spark as a broadcast nested loop — O(|L|·|R|) comparisons,
  * dead at scale. But a half-open band of integer width W = offU - offL
  * admits a lossless discretization: under the bin map `b(x) = x div W`,
  * every qualifying right row's bin is either `b(lt + offL)` or
  * `b(lt + offL) + 1` (the band spans at most two W-wide bins, because
  * `b(x + W) = b(x) + 1` and b is monotone — true for truncating
  * division at any sign). The join is therefore rewritten into a UNION
  * of two equi-joins on computed bin keys, each carrying the original
  * band condition as an exact post-filter:
  *
  * {{{
  *   Join(L, R, rt≥lt+offL ∧ rt<lt+offU)
  *     ⇒ Union(
  *         Join(L, R, b(lt+offL)   = b(rt) ∧ band),
  *         Join(L, R, b(lt+offL)+1 = b(rt) ∧ band))
  * }}}
  *
  * Each arm hash-partitions on its bin expression (ExtractEquiJoinKeys
  * accepts computed keys), so the nested loop becomes two shuffled
  * equi-joins — the manual dataflow of
  * [[graft.ops.ScaleJoins.rangeCountByBins]], produced automatically.
  * No row duplicates across arms: a right row's bin equals exactly one
  * of the two key values.
  *
  * Guards (rule fires only when all hold):
  *  - inner join, deterministic subplans/condition (arms duplicate both
  *    inputs — nondeterministic expressions would diverge between arms);
  *  - NO equi conjunct already present (if one exists Spark already
  *    hash-joins; this also makes the rewrite idempotent — the arms it
  *    emits contain equi conjuncts, so they can never rematch);
  *  - both band endpoints are the same (left expr, right expr) pair at
  *    integral types, with literal integer offsets.
  */
object RangeJoinBinning extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  /** Decompose `base + offset` / `base - offset` into (base, offset). */
  private def shifted(e: Expression): (Expression, Long) = e match {
    case Add(b, l, _) if litLong(l).isDefined => val (bb, o) = shifted(b); (bb, o + litLong(l).get)
    case Add(l, b, _) if litLong(l).isDefined => val (bb, o) = shifted(b); (bb, o + litLong(l).get)
    case Subtract(b, l, _) if litLong(l).isDefined => val (bb, o) = shifted(b); (bb, o - litLong(l).get)
    case other => (other, 0L)
  }

  /** (rightExpr, leftBase, off) meaning `rt >= lt + off`. */
  private def asLower(c: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def mk(a: Expression, b: Expression, strict: Boolean) = {
      val (base, off) = shifted(b)
      if (sideOk(a, r) && sideOk(base, l) && integral(a) && integral(base))
        Some((a, base, if (strict) off + 1 else off))
      else None
    }
    c match {
      case GreaterThanOrEqual(a, b) => mk(a, b, strict = false)
      case LessThanOrEqual(b, a) => mk(a, b, strict = false)
      case GreaterThan(a, b) => mk(a, b, strict = true)
      case LessThan(b, a) => mk(a, b, strict = true)
      case _ => None
    }
  }

  /** (rightExpr, leftBase, off) meaning `rt < lt + off`. */
  private def asUpper(c: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def mk(a: Expression, b: Expression, strict: Boolean) = {
      val (base, off) = shifted(b)
      if (sideOk(a, r) && sideOk(base, l) && integral(a) && integral(base))
        Some((a, base, if (strict) off else off + 1))
      else None
    }
    c match {
      case LessThan(a, b) => mk(a, b, strict = true)
      case GreaterThan(b, a) => mk(a, b, strict = true)
      case LessThanOrEqual(a, b) => mk(a, b, strict = false)
      case GreaterThanOrEqual(b, a) => mk(a, b, strict = false)
      case _ => None
    }
  }

  private def sideOk(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def hasEquiConjunct(conjs: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjs.exists {
      case EqualTo(a, b) => (sideOk(a, l) && sideOk(b, r)) || (sideOk(a, r) && sideOk(b, l))
      case EqualNullSafe(a, b) => (sideOk(a, l) && sideOk(b, r)) || (sideOk(a, r) && sideOk(b, l))
      case _ => false
    }

  private def planDeterministic(p: LogicalPlan): Boolean =
    p.collectFirst { case n if n.expressions.exists(!_.deterministic) => n }.isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if cond.deterministic && planDeterministic(left) && planDeterministic(right) =>
      val conjs = splitConjuncts(cond)
      if (hasEquiConjunct(conjs, left, right)) j
      else {
        val bands = for {
          lo <- conjs.flatMap(asLower(_, left, right))
          hi <- conjs.flatMap(asUpper(_, left, right))
          if lo._1.semanticEquals(hi._1) && lo._2.semanticEquals(hi._2)
          w = hi._3 - lo._3 if w > 0
        } yield (lo._1, lo._2, lo._3, w)
        bands.headOption.fold(j: LogicalPlan) { case (rt, lt, offL, w) =>
          val wLit = Literal(w)
          val binR = IntegralDivide(Cast(rt, LongType), wLit)
          val bin0 = IntegralDivide(Add(Cast(lt, LongType), Literal(offL)), wLit)
          val arm0 = Join(left, right, Inner, Some(And(EqualTo(bin0, binR), cond)), hint)
          val arm1 = Join(left, right, Inner,
            Some(And(EqualTo(Add(bin0, Literal(1L)), binR), cond)), hint)
          Union(Seq(arm0, arm1))
        }
      }
  }
}
