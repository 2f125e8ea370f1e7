package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The RangeJoinBinning optimizer rule: an inequality-only time-band
  * join must plan as two binned equi-joins (no nested loop) and return
  * exactly the rows of the un-rewritten join.
  */
class RangeJoinBinningSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def anchors = Seq((1L, 100L), (2L, 160L), (3L, -40L), (4L, 3600L))
    .toDF("id", "at")
  private def points = Seq(39L, 40L, 41L, 99L, 100L, 159L, 160L, 199L, 200L,
    -100L, -41L, -40L, 0L, 3599L, 3700L).toDF("pt")

  test("band join rewrites to equi arms: no nested loop, same rows as naive") {
    val joined = anchors.join(points,
      $"pt" >= $"at" - 60 && $"pt" < $"at" + 60)
    val plan = planOf(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("Union"), s"no two-arm union:\n$plan")

    val got = joined.select($"id", $"pt").as[(Long, Long)].collect().sorted.toSeq
    // ground truth on the driver — the semantics the rewrite must keep
    val pts = points.as[Long].collect()
    val want = anchors.as[(Long, Long)].collect().toSeq.flatMap { case (id, at) =>
      pts.filter(p => p >= at - 60 && p < at + 60).map(id -> _)
    }.sorted
    assert(got === want)
    assert(got.nonEmpty && want.exists(_._1 == 3L), "negative-time band must match")
  }

  test("strict/inclusive bound variants keep exact semantics") {
    for ((cond, pred) <- Seq(
      ($"pt" > $"at" - 60 && $"pt" <= $"at" + 60,
        (at: Long, p: Long) => p > at - 60 && p <= at + 60),
      ($"at" - 60 <= $"pt" && $"at" + 60 > $"pt",
        (at: Long, p: Long) => at - 60 <= p && at + 60 > p))) {
      val joined = anchors.join(points, cond)
      val plan = planOf(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      val got = joined.select($"id", $"pt").as[(Long, Long)].collect().sorted.toSeq
      val pts = points.as[Long].collect()
      val want = anchors.as[(Long, Long)].collect().toSeq.flatMap { case (id, at) =>
        pts.filter(p => pred(at, p)).map(id -> _)
      }.sorted
      assert(got === want)
    }
  }

  test("joins with an equi key are left alone") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "lt")
    val r = Seq((1L, 15L), (2L, 100L)).toDF("k", "rt")
    val joined = l.join(r, l("k") === r("k") && $"rt" >= $"lt" - 10 && $"rt" < $"lt" + 10)
    val plan = planOf(joined)
    assert(!plan.contains("Union"), s"equi join must not be rewritten:\n$plan")
    assert(joined.count() === 1)
  }

  test("the q91 dataflow through a NAIVE DataFrame join now plans scalably") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select($"event_id", $"ts".cast("long").as("t"), $"event_type")
    val anchors = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("aid"), $"t".as("at"))
    val naive = anchors.join(ev.select($"t".as("pt")),
        $"pt" >= $"at" - 3600 && $"pt" < $"at" + 3600)
      .groupBy($"aid").agg(count(lit(1)).as("n_nearby"))
    val plan = planOf(naive)
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop survived:\n$plan")
    // rewritten plan must agree with the hand-binned operator
    val manual = graft.ops.ScaleJoins.rangeCountByBins(
        anchors.select($"aid".as("event_id"), $"at".as("t")), ev.select($"t"),
        "event_id", "t", 3600L, 3600L, 3600L)
      .select($"event_id", $"n_nearby").as[(Long, Long)].collect().toSet
    val got = naive.select($"aid", $"n_nearby").as[(Long, Long)].collect().toSet
    assert(got === manual)
  }
}
