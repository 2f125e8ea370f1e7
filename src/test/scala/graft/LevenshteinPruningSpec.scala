package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule must add the length-band guard to
  * levenshtein threshold predicates without changing results (and
  * without breaking the optimizer's fixpoint).
  */
class LevenshteinPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("optimized plan contains the derived length-difference guard") {
    val names = Seq("MARIA", "MARIIA", "JOSE", "JOSEPHINE").toDF("a")
    val other = Seq("MARIA", "JOSE").toDF("b")
    val q = names.crossJoin(other).filter(levenshtein($"a", $"b") <= 1)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length(a") || optimized.toLowerCase.contains("abs((length"),
      s"length guard missing from optimized plan:\n$optimized")
    // results are unchanged by the strengthening (guard is necessary,
    // not sufficient): JOSEPHINE is 5 edits from JOSE, excluded anyway
    val got = q.as[(String, String)].collect().toSet
    assert(got === Set(("MARIA", "MARIA"), ("MARIIA", "MARIA"), ("JOSE", "JOSE")))
  }

  test("rule is idempotent under the optimizer fixpoint (no conjunct growth)") {
    // parquet-backed so the optimizer cannot constant-fold the predicate
    val n = graft.core.Tables.nation(spark, sfDir)
    val a = n.select($"n_name".as("a"))
    val b = n.select($"n_name".as("b"))
    val q = a.crossJoin(b).filter(levenshtein($"a", $"b") <= 2)
    val plan = q.queryExecution.optimizedPlan.toString
    // exactly one guard, not one per optimizer iteration
    assert(plan.sliding("abs(".length).count(_ == "abs(") === 1, plan)
    assert(q.count() > 0)
  }
}
