package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The custom physical operator, proven three ways: bit-equality with
  * the SortMergeJoin formulation on real data, the node actually
  * planned (strategy fired, not silently fallen back), and the
  * exchange budget identical to SMJ's (the kernel is the win, not a
  * partitioning trick).
  */
class IntervalOverlapJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def li = graft.core.Tables.lineitem(spark, sfDir)
    .filter($"l_partkey" < 500)
    .select($"l_partkey".as("pk"),
      $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
      $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
      $"l_quantity".cast("long").as("q"), $"l_returnflag".as("rf"))

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case s: QueryStageExec => s +: walk(s.plan)
    case _ => p +: p.children.flatMap(walk)
  }

  test("physical FIFO equals the SortMergeJoin formulation exactly") {
    val buys = li.filter($"rf" === "R").drop("rf")
    val sells = li.filter($"rf" =!= "R").drop("rf")
    val ord = Seq("sec", "ok", "ln", "q")
    val smj = graft.ops.Allocate.fifoMatch(buys, sells, "pk", ord, "q")
    val phys = graft.ops.Allocate.fifoMatchPhysical(buys, sells, "pk", ord, "q")
    assert(phys.columns.toSeq === smj.columns.toSeq)
    assert(phys.except(smj).isEmpty && smj.except(phys).isEmpty)
    assert(phys.count() === smj.count(), "multiplicity must match too")
  }

  test("the strategy plans IntervalOverlapJoinExec with SMJ's exchange budget") {
    val buys = li.filter($"rf" === "R").drop("rf")
    val sells = li.filter($"rf" =!= "R").drop("rf")
    val df = graft.ops.Allocate.fifoMatchPhysical(buys, sells, "pk",
      Seq("sec", "ok", "ln", "q"), "q")
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[graft.plans.IntervalOverlapJoinExec]),
      s"custom exec not planned:\n${df.queryExecution.executedPlan}")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles === 2,
      s"expected the 2 per-side exchanges only, got $shuffles:\n${df.queryExecution.executedPlan}")
  }

  test("OVERLAPPING sides: sweep kernel equals the brute-force join") {
    // heavily overlapping synthetic intervals on both sides, 3 keys
    def mk(side: Int) = (0 until 400).map { i =>
      val k = (i % 3).toLong
      val lo = ((i * 2654435761L + side * 97L) % 1000L)
      (k, lo, lo + 1L + ((i * 48271L) % 150L), side * 1000L + i)
    }
    val l = mk(0).toDF("k", "lo", "hi", "lid")
    val r = mk(1).toDF("k2", "lo2", "hi2", "rid")
    val got = graft.plans.IntervalOverlapJoin.join(
        l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
      .select($"lid", $"rid")
    val want = l.join(r, $"k" === $"k2" && $"lo" < $"hi2" && $"lo2" < $"hi")
      .select($"lid", $"rid")
    assert(got.count() === want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("skewed key: 1e5-interval key streams without buffering its output") {
    // One hot key carries 100k disjoint-ish intervals per side (each
    // left matches ~2 rights → ~200k pairs walked with O(1) active
    // set), plus an EXPLOSIVE key where all 2000×2000 intervals
    // mutually overlap → 4M output pairs from one key. Round-7 debt:
    // the exec buffered one key's full match array before emission —
    // the explosive key is exactly the 100-TB OOM shape. The streamed
    // kernel emits row-by-row; this pins the resume-mid-key walk
    // (group boundaries, active-set suspension) at volume.
    val hotL = (0 until 100000).map(i => (0L, i.toLong, i + 2L, i.toLong))
    val hotR = (0 until 100000).map(i => (0L, i + 1L, i + 3L, i.toLong))
    val boomL = (0 until 2000).map(i => (1L, 0L, 1000000L, 100000L + i))
    val boomR = (0 until 2000).map(i => (1L, 0L, 1000000L, 100000L + i))
    val l = (hotL ++ boomL).toDF("k", "lo", "hi", "lid").repartition(4)
    val r = (hotR ++ boomR).toDF("k2", "lo2", "hi2", "rid").repartition(4)
    val joined = graft.plans.IntervalOverlapJoin.join(
      l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
    // hot key: left [i,i+2) vs right [j+1,j+3) overlap iff
    // i < j+3 ∧ j+1 < i+2 ⇔ j ∈ {i-2, i-1, i} → 3 per left minus the
    // 3 out-of-range (j<0) pairs at the i=0/1 boundary
    val hotPairs = 3L * 100000 - 3
    val boomPairs = 2000L * 2000
    assert(joined.count() === hotPairs + boomPairs)
    // lazy prefix consumption stays correct (streamed iterator path)
    val it = joined.select($"lid", $"rid").toLocalIterator()
    val first = (0 until 10).map(_ => it.next()).toSeq
    assert(first.size === 10 && first.forall(_ != null))
  }

  test("disjoint singleton intervals: overlap join on a hand fixture") {
    val l = Seq((1L, 0L, 10L, "a"), (1L, 10L, 15L, "b"), (2L, 0L, 5L, "c"))
      .toDF("k", "lo", "hi", "tag")
    val r = Seq((1L, 8L, 12L, "x"), (2L, 5L, 9L, "y"), (3L, 0L, 9L, "z"))
      .toDF("k2", "lo2", "hi2", "tag2")
    val got = graft.plans.IntervalOverlapJoin.join(
        l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
      .select($"tag", $"tag2")
      .collect().map(row => (row.getString(0), row.getString(1))).toSet
    // k=1: [0,10)x[8,12) overlap, [10,15)x[8,12) overlap; k=2: [0,5)x[5,9) touch only
    assert(got === Set(("a", "x"), ("b", "x")))
  }

  test("string-typed keys route through the interpreted ordering (ROADMAP debt #5)") {
    // same fixture as above with string keys — the exec must group and
    // align by the type's ordering, not a Long cast
    val l = Seq(("k1", 0L, 10L, "a"), ("k1", 10L, 15L, "b"), ("k2", 0L, 5L, "c"),
        ("k10", 3L, 7L, "d")) // "k10" < "k2" lexicographically — ordering matters
      .toDF("k", "lo", "hi", "tag")
    val r = Seq(("k1", 8L, 12L, "x"), ("k2", 5L, 9L, "y"), ("k3", 0L, 9L, "z"),
        ("k10", 5L, 6L, "w"))
      .toDF("k2", "lo2", "hi2", "tag2")
    val df = graft.plans.IntervalOverlapJoin.join(
      l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
    // the custom node actually planned (no silent fallback)
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[graft.plans.IntervalOverlapJoinExec]),
      s"strategy fell back:\n${df.queryExecution.executedPlan}")
    val got = df.select($"tag", $"tag2")
      .collect().map(row => (row.getString(0), row.getString(1))).toSet
    assert(got === Set(("a", "x"), ("b", "x"), ("d", "w")))
  }

  test("mismatched key types are rejected, not silently miscompared") {
    val l = Seq((1L, 0L, 10L, "a")).toDF("k", "lo", "hi", "tag")
    val r = Seq(("1", 8L, 12L, "x")).toDF("k2", "lo2", "hi2", "tag2")
    val ex = intercept[Exception] {
      graft.plans.IntervalOverlapJoin.join(
        l, r, "k", "lo", "hi", "k2", "lo2", "hi2").collect()
    }
    assert(ex.getMessage != null)
  }
}
