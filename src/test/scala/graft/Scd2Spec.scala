package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd2

/** SCD Type-2 history builder: golden intervals, run collapse, null
  * tracked values, point-in-time lookup, and the single-shuffle plan
  * contract (both windows share one partitionBy(key) exchange).
  */
class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def history = {
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"), (2L, 10L, 5L, "X"))
      .toDF("k", "eff", "seq", "v")
    Scd2.fromChangeLog(log, Seq("k"), Seq("v"), "eff", Seq("seq"))
  }

  test("scd2 collapses runs and closes intervals at the next change") {
    val rows = history
      .select($"k", $"version", $"v", $"effective_from", $"effective_to", $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq === Seq(
      (1L, 1L, "A", 10L, Some(30L), false),   // the 20L duplicate collapsed
      (1L, 2L, "B", 30L, Some(40L), false),
      (1L, 3L, "A", 40L, None, true),          // A again = NEW version
      (2L, 1L, "X", 10L, None, true)))
  }

  test("scd2 null-safe compare: a run of null values is one version") {
    val log = Seq(
      (1L, 10L, 1L, Option.empty[String]), (1L, 20L, 2L, Option.empty[String]),
      (1L, 30L, 3L, Some("A")))
      .toDF("k", "eff", "seq", "v")
    val h = Scd2.fromChangeLog(log, Seq("k"), Seq("v"), "eff", Seq("seq"))
      .select($"version", $"v", $"effective_from")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    assert(h.toSeq === Seq((1L, None, 10L), (2L, Some("A"), 30L)))
  }

  test("asOf picks the covering version (half-open intervals)") {
    val at = Scd2.asOf(history, lit(35L))
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(at === Set((1L, "B"), (2L, "X")))
    // exactly at a boundary: the NEW version covers (from <= at)
    val atBoundary = Scd2.asOf(history, lit(30L))
      .filter($"k" === 1L).select($"v").as[String].collect().toSeq
    assert(atBoundary === Seq("B"))
  }

  test("plan: one hash exchange serves both window passes") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = history
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val shuffles = walk(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size === 1,
      s"change-filter should preserve the window partitioning; got ${shuffles.size} exchanges")
  }
}
