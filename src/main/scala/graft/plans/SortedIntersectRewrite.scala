package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import graft.functions.SortedIntersectSize

/** Optimizer rule: lower `size(array_intersect(a, b))` onto the
  * allocation-free two-pointer kernel
  * ([[graft.functions.SortedIntersectSize]]) when BOTH inputs are
  * provably sorted, distinct, null-free string arrays — i.e. literally
  * shaped `array_sort(array_distinct(…))` over non-null elements, the
  * canonical shingle-set form. A user writing the stock Spark idiom
  * gets the kernel the Dedup operators use internally (no hash set, no
  * union array) without knowing it exists.
  *
  * The guard is strictly syntactic + type-based, because each clause
  * carries the semantics:
  *  - `array_sort` ascending is the kernel's merge order;
  *  - `array_distinct` makes "two-pointer match count" equal
  *    `array_intersect`'s distinct-intersection cardinality (with
  *    duplicates they diverge);
  *  - `containsNull = false` element type: the kernel's UTF8 compare
  *    never sees a null (array_sort puts nulls last, the two-pointer
  *    walk would NPE).
  *
  * Idempotent by construction: the rewrite output contains no
  * `Size(ArrayIntersect(…))` to re-match at the optimizer fixpoint.
  */
object SortedIntersectRewrite extends Rule[LogicalPlan] {

  /** The ANALYZED (lambda-bound) shape of `array_sort`'s default
    * ascending comparator — `ArraySort.defaultComparator` itself is the
    * unbound template, so neither reference equality nor semanticEquals
    * recognizes it post-analysis. A custom comparator (descending, by
    * length, …) must NOT trigger the rewrite: the kernel merges in
    * ascending order only.
    */
  private def isDefaultAscComparator(f: Expression): Boolean = f match {
    // full bound form (nullable elements)
    case LambdaFunction(
        If(And(IsNull(l1: NamedLambdaVariable), IsNull(r1: NamedLambdaVariable)), Literal(0, _),
          If(IsNull(l2: NamedLambdaVariable), Literal(1, _),
            If(IsNull(r2: NamedLambdaVariable), Literal(-1, _),
              If(LessThan(l3: NamedLambdaVariable, r3: NamedLambdaVariable), Literal(-1, _),
                If(GreaterThan(l4: NamedLambdaVariable, r4: NamedLambdaVariable), Literal(1, _),
                  Literal(0, _)))))),
        Seq(la: NamedLambdaVariable, ra: NamedLambdaVariable), _) =>
      Seq(l1, l2, l3, l4).forall(_.exprId == la.exprId) &&
        Seq(r1, r2, r3, r4).forall(_.exprId == ra.exprId)
    // null-branch-pruned form the main optimizer batches leave behind on
    // containsNull = false inputs (injected rules run AFTER them)
    case LambdaFunction(
        If(LessThan(l1: NamedLambdaVariable, r1: NamedLambdaVariable), Literal(-1, _),
          If(GreaterThan(l2: NamedLambdaVariable, r2: NamedLambdaVariable), Literal(1, _),
            Literal(0, _))),
        Seq(la: NamedLambdaVariable, ra: NamedLambdaVariable), _) =>
      Seq(l1, l2).forall(_.exprId == la.exprId) &&
        Seq(r1, r2).forall(_.exprId == ra.exprId)
    case _ => false
  }

  private def sortedDistinctStrings(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(_), cmp, _) if isDefaultAscComparator(cmp) =>
      e.dataType match {
        case ArrayType(StringType, containsNull) => !containsNull
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), legacySizeOfNull)
        if !legacySizeOfNull && sortedDistinctStrings(l) && sortedDistinctStrings(r) =>
      Cast(SortedIntersectSize(l, r), IntegerType)
  }
}
