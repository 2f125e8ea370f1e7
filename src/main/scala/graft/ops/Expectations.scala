package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Great-
  * Expectations shape, and the reference's validation-flag pass
  * re-expressed as a reusable audit): each rule is a VALIDITY predicate
  * over a row; the audit reports per-rule violation counts in ONE
  * aggregation pass over the data — n rules cost one scan, not n.
  *
  * A NULL predicate result counts as a violation (unknown is not
  * valid) — the tri-state trap every SQL-side validity check hits; the
  * audit folds it in with `not coalesce(pred, false)`.
  *
  * Scale shape: conditional sums are algebraic partial aggs (map-side
  * combine → one row per task), and the per-rule unpivot happens on the
  * ONE-ROW aggregate via stack — never on the data. Referential rules
  * join their lookup in before the audit (broadcast for dimension-sized
  * lookups, as in the q118 conformance query).
  */
object Expectations {

  /** @param rules (name, validity predicate) pairs — predicate TRUE =
    *              row passes. Names must be distinct identifiers
    *              (`[A-Za-z0-9_]+`): they are spliced into the stack()
    *              SQL below both as string literals and as generated
    *              column identifiers, so a quote or space would
    *              misparse the expression at runtime.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules to audit")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"rule name '$name' must match [A-Za-z0-9_]+ (spliced into SQL)")
    }
    val aggs = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v_$name")
    } :+ count(lit(1)).as("__checked")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) =>
      s"'$name', __v_$name"
    }.mkString(", ")
    one.select(expr(s"stack(${rules.size}, $stackArgs) as (rule, n_violations)"),
        col("__checked").as("n_checked"))
      .select(col("rule"), col("n_violations"), col("n_checked"))
  }
}
