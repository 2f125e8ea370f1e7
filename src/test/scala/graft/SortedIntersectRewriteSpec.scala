package graft

import org.apache.spark.sql.functions._

/** The injected rewrite must lower the stock
  * `size(array_intersect(array_sort(array_distinct(…)), …))` idiom onto
  * the two-pointer kernel — and must NOT fire when any safety clause
  * (distinctness, default ascending order) is missing.
  */
class SortedIntersectRewriteSpec extends SparkTestBase {
  import spark.implicits._

  // parquet-backed so constant folding cannot collapse the expression
  // before the injected rule runs (literal relations fold away first)
  private def docs = graft.core.Tables.documents(spark, sfDir).limit(20)
  private def df = docs.select($"doc_id", $"text".as("x"),
    reverse($"text").as("y"))

  private def shingleish(c: org.apache.spark.sql.Column) =
    array_sort(array_distinct(split(c, " ")))

  test("canonical shape rewrites to the kernel and keeps results") {
    val q = df.select(size(array_intersect(shingleish($"x"), shingleish($"y"))).as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("sorted_intersect_size"), s"kernel not planned:\n$plan")
    // expected values via an idiom the rule does NOT touch (no sort —
    // array_intersect is order-insensitive)
    val want = df.select(size(array_intersect(array_distinct(split($"x", " ")),
        array_distinct(split($"y", " ")))).as("n"))
      .as[Int].collect().toSeq
    assert(q.as[Int].collect().toSeq === want)
    assert(want.exists(_ > 0))
  }

  test("no array_distinct -> no rewrite (duplicate semantics differ)") {
    val q = df.select(size(array_intersect(array_sort(split($"x", " ")),
      array_sort(split($"y", " ")))).as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("sorted_intersect_size"), plan)
  }

  test("custom comparator -> no rewrite (kernel needs ascending order)") {
    val q = df.select(size(array_intersect(
      array_sort(array_distinct(split($"x", " ")), (a, b) => length(b) - length(a)),
      shingleish($"y"))).as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("sorted_intersect_size"), plan)
  }

  test("rewrite equals stock evaluation on the documents fixture") {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(50)
    val pairs = docs.select($"doc_id".as("id_a"), shingleish($"text").as("sa"))
      .crossJoin(docs.select($"doc_id".as("id_b"), shingleish($"text").as("sb")))
      .filter($"id_a" < $"id_b")
    val viaIdiom = pairs.select($"id_a", $"id_b",
        size(array_intersect($"sa", $"sb")).as("n"))
      .as[(Long, Long, Int)].collect().toSet
    // force the un-rewritten path: duplicate-preserving sort (no
    // distinct) over already-distinct arrays is semantically identical
    val viaStock = pairs.select($"id_a", $"id_b",
        size(array_intersect(array_sort($"sa"), array_sort($"sb"))).as("n"))
      .as[(Long, Long, Int)].collect().toSet
    assert(viaIdiom === viaStock)
    assert(viaIdiom.nonEmpty)
  }
}
