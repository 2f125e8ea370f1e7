package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.LinkGraph
import graft.ops.{Allocate, Behavior, Eval, Inequality, Ranks}

/** Ground truth for the twelfth-wave operators on hand-built fixtures:
  * two-phase ranks ≡ the window row_number they replace, proration
  * budget-exactness and tie-breaks, Gini corner cases (all-equal,
  * max-concentration, zero-mass), chi-squared independence zeros, BFS
  * frontier semantics (settled nodes never re-expand, min over seeds),
  * and first-seen cumulative counts.
  */
class StatOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("twoPhaseRank equals per-group window row_number") {
    val df = (1 to 97).map(i => (s"g${i % 3}", (i * 37) % 41, i))
      .toDF("grp", "v", "k")
    val got = Ranks.twoPhaseRank(df, "grp", Seq("v", "k"), "rank")
      .select($"grp", $"v", $"k", $"rank")
    val want = df.withColumn("rank",
      row_number().over(Window.partitionBy($"grp").orderBy($"v", $"k"))
        .cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("prorate: allocations sum to the budget, remainders break ties by key") {
    val w = Seq(("g", "a", 1L), ("g", "b", 1L), ("g", "c", 1L))
      .toDF("grp", "key", "w")
    val got = Allocate.prorate(w, "grp", "key", "w", budget = 10L)
      .orderBy($"key")
      .collect().map(r => (r.getString(1), r.getLong(3))).toSeq
    // base = 3 each, leftover 1 goes to the smallest key
    assert(got === Seq(("a", 4L), ("b", 3L), ("c", 3L)))
  }

  test("prorate: proportionality and exact budget on skewed weights") {
    val w = Seq(("g", "a", 5L), ("g", "b", 3L), ("g", "c", 2L))
      .toDF("grp", "key", "w")
    val got = Allocate.prorate(w, "grp", "key", "w", budget = 7L)
      .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    assert(got.values.sum === 7L)
    // 7*5/10=3.5 -> 3 rem 5; 7*3/10=2.1 -> 2 rem 1; 7*2/10=1.4 -> 1 rem 4
    // leftover 1 goes to 'a' (largest remainder)
    assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("prorate: NULL and non-positive weights are excluded, not allocated") {
    val w = Seq(("g", "a", Some(3L)), ("g", "b", Some(0L)),
        ("g", "c", Option.empty[Long]), ("g", "d", Some(-2L)))
      .toDF("grp", "key", "w")
    val got = Allocate.prorate(w, "grp", "key", "w", budget = 5L)
      .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    assert(got === Map("a" -> 5L))
  }

  test("giniMicro: all-equal is 0, max concentration approaches (n-1)/n") {
    val eq = Seq(("g", 7L, 1L), ("g", 7L, 2L), ("g", 7L, 3L))
      .toDF("grp", "v", "k")
    assert(Inequality.giniMicro(eq, "grp", "v", "k")
      .select($"gini_micro").head.getLong(0) === 0L)
    // one key owns everything: G = (2*4*10 - 5*10)/(4*10) = 30/40 = 0.75
    val conc = Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 0L, 3L), ("g", 10L, 4L))
      .toDF("grp", "v", "k")
    assert(Inequality.giniMicro(conc, "grp", "v", "k")
      .select($"gini_micro").head.getLong(0) === 750000L)
  }

  test("giniMicro: zero-mass group yields NULL, not a division error") {
    val z = Seq(("g", 0L, 1L), ("g", 0L, 2L)).toDF("grp", "v", "k")
    val row = Inequality.giniMicro(z, "grp", "v", "k").head
    assert(row.getLong(1) === 2L && row.isNullAt(3))
  }

  test("chiSquareCells: independent table has zero contributions") {
    // counts r x c = rowShare * colShare * T exactly
    val rows = Seq.fill(6)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
      Seq.fill(3)(("y", "u")) ++ Seq.fill(1)(("y", "v"))
    val got = Eval.chiSquareCells(rows.toDF("r0", "c0"), "r0", "c0")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("x", "u")) === ((6L, 6000000L, 0L)))
    assert(got(("y", "v")) === ((1L, 1000000L, 0L)))
  }

  test("chiSquareCells: a dependent 2x2 has symmetric positive contributions") {
    val rows = Seq.fill(5)(("x", "u")) ++ Seq.fill(1)(("x", "v")) ++
      Seq.fill(1)(("y", "u")) ++ Seq.fill(5)(("y", "v"))
    val got = Eval.chiSquareCells(rows.toDF("r0", "c0"), "r0", "c0")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    // all four cells deviate equally: (O*T-R*C)^2/(T*R*C) = (60-36)^2/(12*36)
    val want = math.round(24.0 * 24.0 * 1e6 / (12.0 * 36.0))
    assert(got.values.toSet === Set(want))
  }

  test("bfsDistances: frontier expansion matches hop distances, min over seeds") {
    // line 1->2->3->4->5, plus a shortcut 10->4; seeds {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("id")
    val got = LinkGraph.bfsDistances(edges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 is reached at hop 1 via 10 (not hop 3 via the line); 5 at hop 2;
    // nothing beyond maxHops
    assert(got === Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 4L -> 1L,
      3L -> 2L, 5L -> 2L))
  }

  test("bfsDistances: early-exhausted frontier stops cleanly") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = LinkGraph.bfsDistances(edges, Seq(1L).toDF("id"), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }

  test("tfidfCosineTopK: identical docs are mutual top neighbors at cos 1e6") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val got = graft.ext.LangModel
      .tfidfCosineTopK(docs, "doc_id", "text", k = 1, maxDf = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 1000000L)) && got(2L) === ((1L, 1000000L)))
    // doc 3 shares no bigram with 1/2: no candidate pair survives
    assert(!got.contains(3L))
  }

  test("tfidfCosineTopK: df-cap drops a ubiquitous bigram from the vocabulary") {
    // 'q q' appears in all 3 docs; with maxDf=2 it leaves the space and
    // docs 1/2 still match on 'a b' while doc 3 has no vector at all
    val docs = Seq((1L, "q q a b"), (2L, "q q a b"), (3L, "q q"))
      .toDF("doc_id", "text")
    val got = graft.ext.LangModel
      .tfidfCosineTopK(docs, "doc_id", "text", k = 2, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === Set((1L, 2L), (2L, 1L)))
  }

  test("bpeMerges: greedy left-to-right fold and weighted pair counts") {
    // corpus: 'aaab' x2, 'ab' x1 -> round 1 pairs: (a,a):4, (a,b):3
    // merge (a,a); re-tokenize 'aaab' -> [aa, a, b] (greedy, no overlap)
    // round 2 pairs: (aa,a):2, (a,b):3 -> merge (a,b)
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = graft.ext.LangModel.bpeMerges(docs, "text", rounds = 2)
      .orderBy($"merge_round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L)))
  }

  test("bpeMerges: stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = graft.ext.LangModel.bpeMerges(docs, "text", rounds = 5)
    assert(got.count() === 0L)
  }

  test("attribution: last-touch windows out, first-touch is unwindowed") {
    val events = Seq(
      // u1: click(d0) -> view(d1) -> purchase(d2): last=view, first=click
      (1L, 0L, 1L, "click"), (2L, 86400L, 1L, "view"),
      (3L, 2 * 86400L, 1L, "purchase"),
      // u2: click(d0) -> purchase(d20): last-touch outside 7d window,
      // first-touch still credits click
      (4L, 0L, 2L, "click"), (5L, 20L * 86400L, 2L, "purchase"),
      // u3: purchase with no preceding touch: no credit anywhere
      (6L, 0L, 3L, "purchase"))
      .toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"sec").as("ts"),
        $"user_id", $"event_type")
    val got = Behavior.attribution(events, "purchase", windowSec = 7L * 86400L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("view" -> ((1L, 0L)), "click" -> ((0L, 2L))))
  }

  test("attribution: a purchase is not a touch for a later purchase") {
    val events = Seq(
      (1L, 0L, 1L, "view"), (2L, 100L, 1L, "purchase"),
      (3L, 200L, 1L, "purchase"))
      .toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"sec").as("ts"),
        $"user_id", $"event_type")
    val got = Behavior.attribution(events, "purchase", windowSec = 86400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("view", 2L, 2L)))
  }

  test("emaFixedPoint: seeded with first value, folds in order") {
    // order by sec: vals 1000 then 2000; alpha=1/2:
    // ema = (2000 + 1000) div 2 = 1500; rows arrive out of order
    val df = Seq(("k", 20L, 2L, 2000L), ("k", 10L, 1L, 1000L),
        ("solo", 5L, 1L, 777L))
      .toDF("key0", "sec", "id", "v")
    val got = graft.ops.TimeSeries
      .emaFixedPoint(df, "key0", Seq("sec", "id"), "v", num = 1L, den = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("k") === ((2L, 2000L, 1500L)))
    assert(got("solo") === ((1L, 777L, 777L)))
  }

  test("cappedRunningSum: clamps at zero mid-fold, order matters") {
    // in ts order: +5, -10 (clamps to 0), +3 -> 3; the unordered sum
    // would be max(0, -2) = 0 — proves the fold respects the order
    val df = Seq(("p", 1L, 1L, 5L), ("p", 2L, 2L, -10L), ("p", 3L, 3L, 3L))
      .toDF("key0", "sec", "id", "d")
    val got = graft.ops.TimeSeries
      .cappedRunningSum(df, "key0", Seq("sec", "id"), "d")
      .head
    assert(got.getLong(1) === 3L && got.getLong(2) === 3L)
  }

  test("cappedRunningSumSegmented == cappedRunningSum for every chunk size") {
    // pseudo-random signed deltas over 3 keys, 200 moves each — the
    // max-plus composition is exact, so equality is bit-for-bit
    val rows = for (k <- 0 until 3; i <- 0 until 200) yield {
      val d = ((i * 2654435761L + k * 40503L) % 37L) - 18L
      (s"k$k", i.toLong, i.toLong, d)
    }
    val df = rows.toDF("key0", "sec", "id", "d")
    val plain = graft.ops.TimeSeries
      .cappedRunningSum(df, "key0", Seq("sec", "id"), "d")
    for (c <- Seq(1, 7, 64, 1000)) {
      val seg = graft.ops.TimeSeries
        .cappedRunningSumSegmented(df, "key0", Seq("sec", "id"), "d", c)
      assert(seg.except(plain).isEmpty && plain.except(seg).isEmpty,
        s"chunk=$c diverged")
    }
  }

  test("emaSegmentedFixedPoint: chunked truncation stays within den/num " +
      "of the per-step fold and matches it exactly when chunk=1") {
    val rows = for (k <- 0 until 3; i <- 0 until 150) yield
      (s"k$k", i.toLong, i.toLong, (i * 48271L + k * 137L) % 100000L)
    val df = rows.toDF("key0", "sec", "id", "v")
    val step = graft.ops.TimeSeries
      .emaFixedPoint(df, "key0", Seq("sec", "id"), "v", num = 3L, den = 8L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val seg1 = graft.ops.TimeSeries
      .emaSegmentedFixedPoint(df, "key0", Seq("sec", "id"), "v",
        num = 3L, den = 8L, chunk = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(seg1 === step, "chunk=1 must replay per-step truncation exactly")
    for (c <- Seq(4, 8)) {
      val seg = graft.ops.TimeSeries
        .emaSegmentedFixedPoint(df, "key0", Seq("sec", "id"), "v",
          num = 3L, den = 8L, chunk = c)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      step.foreach { case (k, v) =>
        assert(math.abs(seg(k) - v) <= 3L,
          s"chunk=$c key=$k seg=${seg(k)} step=$v")
      }
    }
  }

  test("fifoMatch: lots fill demands in arrival order, shortage unmatched") {
    // buys 10,5; sells 8,4,7 -> intervals [0,10)[10,15) vs [0,8)[8,12)[12,19):
    // b1-s1=8, b1-s2=2, b2-s2=2, b2-s3=3; sell 3 is 4 short (total supply 15)
    val buys = Seq(("k", 1L, 10L), ("k", 2L, 5L)).toDF("key0", "t", "q")
    val sells = Seq(("k", 1L, 8L), ("k", 2L, 4L), ("k", 3L, 7L))
      .toDF("key0", "t", "q")
    val got = graft.ops.Allocate
      .fifoMatch(buys, sells, "key0", Seq("t"), "q")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 1L, 8L), (1L, 2L, 2L), (2L, 2L, 2L), (2L, 3L, 3L)))
  }

  test("cusumStats: Lindley closed form equals the clamped fold") {
    val xs = Seq(30L, 10L, 40L, 5L, 50L, 45L, 2L, 60L)
    val k = 26L; val h = 20L
    // reference: direct sequential fold
    var c = 0L; var mx = 0L; var alarms = 0L
    xs.foreach { x =>
      c = math.max(0L, c + (x - k)); mx = math.max(mx, c)
      if (c > h) alarms += 1
    }
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("key0", "t", "x")
    val got = graft.ops.TimeSeries
      .cusumStats(df, "key0", Seq("t"), "x", k, h).head
    assert(got.getLong(1) === xs.size.toLong)
    assert(got.getLong(2) === c, "final")
    assert(got.getLong(3) === mx, "max")
    assert(got.getLong(4) === alarms, "alarms")
  }

  test("maxDrawdown: peak shortfall over the cumulative walk") {
    // deltas +5,-3,+1,-4,+10 -> V 5,2,3,-1,9; peaks 5 -> dd max = 6
    val df = Seq(("u", 1L, 5L), ("u", 2L, -3L), ("u", 3L, 1L),
        ("u", 4L, -4L), ("u", 5L, 10L))
      .toDF("key0", "t", "d")
    val got = graft.ops.TimeSeries
      .maxDrawdown(df, "key0", Seq("t"), "d").head
    assert(got.getLong(2) === 9L && got.getLong(3) === 6L)
  }

  test("kaplanMeier: textbook product-limit with censoring, micro fold") {
    // durations: 1e, 2e, 2e, 3c, 4e, 5c
    val df = Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L))
      .map { case (t, e) => ("g", t, e) }.toDF("grp0", "dur", "ev")
    val got = graft.ops.Survival.kaplanMeier(df, "grp0", "dur", "ev")
      .orderBy($"t")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // S: 1e6*5 div 6 = 833333; *3 div 5 = 499999; *1 div 2 = 249999
    assert(got.toSeq === Seq((1L, 6L, 1L, 833333L), (2L, 5L, 2L, 499999L),
      (4L, 2L, 1L, 249999L)))
  }

  test("busDaysSql: closed form matches java.time over a month of spans") {
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val base = LocalDate.of(2026, 7, 27) // a Monday
    val spans = for (s <- 0 until 14; len <- Seq(0, 1, 3, 7, 10, 30))
      yield (base.plusDays(s.toLong), base.plusDays((s + len).toLong))
    def ref(a: LocalDate, b: LocalDate): Long =
      Iterator.iterate(a)(_.plusDays(1)).takeWhile(_.isBefore(b))
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    val rows = spans.map { case (a, b) =>
      (a.toEpochDay, b.toEpochDay, ref(a, b)) }
    val df = rows.toDF("e1", "e2", "want")
    val got = df.withColumn("got",
        expr(graft.ops.Calendar.busDaysSql("e1", "e2", divOp = "div")))
      .filter($"got" =!= $"want")
    assert(got.count() === 0L)
  }

  test("weightedShortestPaths: cheaper two-hop path beats the direct edge") {
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val r1 = LinkGraph.weightedShortestPaths(edges, seeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 0L, 2L -> 10L, 3L -> 1L),
      "one round sees only direct edges")
    val r2 = LinkGraph.weightedShortestPaths(edges, seeds, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 0L, 2L -> 2L, 3L -> 1L),
      "second round relaxes through the cheap middle node")
  }

  test("markovTwoStep: a two-state alternating chain squares to identity") {
    val events = Seq.tabulate(6) { i =>
      (i.toLong, i.toLong, 1L, if (i % 2 == 0) "v" else "c")
    }.toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"sec").as("ts"),
        $"user_id", $"event_type")
    val got = Behavior.markovTwoStep(events)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("v", "v") -> 1000000L, ("c", "c") -> 1000000L))
  }

  test("lagCrossCorr: a pure shift is perfectly correlated at its lag") {
    // y(t) = x(t-2): at lag 2 the joined pairs line up exactly
    val days = (0L to 19L).map(t => (t, 3L * t + 7L, 3L * (t - 2L) + 7L))
      .toDF("day", "x", "y")
    val got = graft.ops.TimeSeries.lagCrossCorr(days, "day", "x", "y", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(2L) === 1000000L, s"lag-2 r_micro was ${got(2L)}")
    assert(got(0L) === 1000000L, "a linear series correlates at every lag")
  }

  test("welchT: symmetric samples give t = 0; formula matches reference") {
    val rows = Seq(("g", 0, 100L), ("g", 0, 200L), ("g", 0, 300L),
      ("g", 1, 100L), ("g", 1, 200L), ("g", 1, 300L),
      ("h", 0, 100L), ("h", 0, 120L), ("h", 1, 200L), ("h", 1, 260L))
    val df = rows.toDF("grp0", "variant", "cents")
    val got = graft.ops.Eval.welchT(df, "grp0", "variant", "cents")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got("g") === ((0L, 0L)))
    // h: m0=110 v0=200, m1=230 v1=1800 -> t = -120/sqrt(100+900)
    val tRef = math.round(-120.0 * 1000000.0 / math.sqrt(1000.0))
    assert(got("h")._1 === -120000000L && got("h")._2 === tRef)
  }

  test("mannWhitneyU: midranks under ties, U and tie-corrected z") {
    // v0 = {1,2,3}, v1 = {2,3,4}: midranks 1, 2.5, 2.5, 4.5, 4.5, 6
    // -> R1 = 13, U = 7, T = 12
    val rows = Seq(("g", 0, 1L), ("g", 0, 2L), ("g", 0, 3L),
      ("g", 1, 2L), ("g", 1, 3L), ("g", 1, 4L))
    val got = graft.ops.Eval
      .mannWhitneyU(rows.toDF("grp0", "variant", "cents"),
        "grp0", "variant", "cents").head
    assert(got.getLong(1) === 3L && got.getLong(2) === 3L)
    assert(got.getLong(3) === 14L, "U2 = 2U = 14")
    val zRef = math.round(5.0 * 1000000.0 /
      (2.0 * math.sqrt(3.0 * 3.0 / 12.0 * (7.0 - 12.0 / 30.0))))
    assert(got.getLong(4) === zRef)
  }

  test("bootstrapMeanCi: deterministic, ordered bounds, degenerate group collapses") {
    val rows = (1 to 300).map(i => ("g", ((i * 48271) % 997).toLong, i.toLong)) :+
      (("solo", 42L, 1L))
    val df = rows.toDF("grp0", "cents", "k")
    def run() = graft.ops.Eval.bootstrapMeanCi(df, "grp0", "cents", "k",
        reps = 40, m = 50)
      .select("grp", "n", "m_eff", "mean_micro", "lo_micro", "hi_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val a = run(); val b = run()
    assert(a === b, "hash-driven resampling must be a pure function of the data")
    val g = a.find(_._1 == "g").get
    assert(g._2 === 300L && g._3 === 50L, s"n/m_eff wrong: $g")
    assert(g._5 <= g._6, s"lo > hi: $g")
    assert(g._5 < g._4 && g._4 < g._6,
      s"full mean should sit inside a 95% band on smooth data: $g")
    // single-row group: every draw is the same row -> band collapses
    val s1 = a.find(_._1 == "solo").get
    assert(s1._3 === 1L && s1._4 === 42000000L &&
      s1._5 === 42000000L && s1._6 === 42000000L, s"degenerate: $s1")
  }

  test("randomizationTestMicro: strong effect rejects, label-free effect doesn't") {
    // "big": variant 1 values are 100x variant 0's — no random
    // relabeling reproduces that gap, so the smoothed p-value is the
    // minimum 1000/(n_perms+1)
    val big = (1 to 60).map(i => ("big", i % 2, i.toLong, if (i % 2 == 1) 10000L else 100L))
    // "null": value is independent of the label — the observed diff is
    // tiny and most relabelings exceed it
    val nul = (1 to 60).map(i => ("null", i % 2, (100 + i).toLong, (i % 7).toLong))
    val df = (big ++ nul).toDF("grp0", "variant", "k", "cents")
    def run() = graft.ops.Eval.randomizationTestMicro(
        df, "grp0", "variant", "k", "cents", perms = 40)
      .select("grp", "n0", "n1", "n_perms", "n_ge", "p_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val a = run()
    assert(a === run(), "hash-driven permutation must be deterministic")
    assert(a("big")._2 === 30L && a("big")._3 === 30L)
    assert(a("big")._5 === 0L && a("big")._6 === 1000L / 41L,
      s"strong effect should never be exceeded: ${a("big")}")
    assert(a("null")._6 > 200L, s"null effect should not reject: ${a("null")}")
  }

  test("one-vs-rest variants restricted to {0,1} reproduce the binary tests") {
    val rows = Seq(("g", 0, 1L), ("g", 0, 2L), ("g", 0, 3L),
      ("g", 1, 2L), ("g", 1, 3L), ("g", 1, 4L),
      ("h", 0, 100L), ("h", 0, 120L), ("h", 1, 200L), ("h", 1, 260L))
    val df = rows.toDF("grp0", "variant", "cents")
    // MW: the variant=1 slice of OVR must equal mannWhitneyU exactly
    val ovrMw = graft.ops.Eval.mannWhitneyOneVsRest(df, "grp0", "variant", "cents")
      .filter($"variant" === 1L)
      .select("grp", "n0", "n1", "u2", "z_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val binMw = graft.ops.Eval.mannWhitneyU(df, "grp0", "variant", "cents")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(ovrMw === binMw, s"OVR variant-1 slice drifts: $ovrMw vs $binMw")
    // Welch: OVR is variant-minus-rest, binary is v0-minus-v1 — the
    // variant=1 slice must be the NEGATION of the binary stats
    val ovrW = graft.ops.Eval.welchOneVsRest(df, "grp0", "variant", "cents")
      .filter($"variant" === 1L)
      .select("grp", "mean_diff_micro", "t_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val binW = graft.ops.Eval.welchT(df, "grp0", "variant", "cents")
      .select("grp", "mean_diff_micro", "t_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    binW.foreach { case (g, (md, t)) =>
      assert(ovrW(g) === ((-md, -t)), s"$g: ${ovrW(g)} != ${(-md, -t)}")
    }
  }

  test("mannWhitneyU: all-tied group is dropped (zero variance)") {
    val rows = Seq(("g", 0, 5L), ("g", 0, 5L), ("g", 1, 5L), ("g", 1, 5L))
    assert(graft.ops.Eval
      .mannWhitneyU(rows.toDF("grp0", "variant", "cents"),
        "grp0", "variant", "cents").count() === 0L)
  }

  test("mrrWaterfall: four buckets and the per-period movement identity") {
    val m = Seq(("A", 1L, 100L), ("A", 2L, 150L), ("A", 3L, 120L),
      ("B", 2L, 50L))
      .toDF("cust0", "midx0", "rev0")
    val got = graft.ops.Revenue.mrrWaterfall(m, "cust0", "midx0", "rev0")
      .orderBy($"midx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 100L, 100L, 0L, 0L, 0L),
      (2L, 200L, 50L, 50L, 0L, 0L),
      (3L, 120L, 0L, 0L, 30L, 50L),
      (4L, 0L, 0L, 0L, 0L, 120L)))
    // identity: mrr(t) - mrr(t-1) = new + exp - con - churn
    got.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 - p._2 === c._3 + c._4 - c._5 - c._6)
    }
  }

  test("theilSen: one wild outlier cannot move the median slope") {
    // y = 2x exactly except y(5) = 1000: 10 points -> 45 pairs; the
    // 9 outlier pairs sit at the extremes, the median pair slope is 2
    val pts = (0L to 9L).map(x => ("g", x, if (x == 5L) 1000L else 2L * x))
      .toDF("grp0", "x0", "y0")
    val got = graft.ops.Eval.theilSen(pts, "grp0", "x0", "y0").head
    assert(got.getLong(1) === 45L)
    assert(got.getLong(2) === 2000000L, s"slope was ${got.getLong(2)}")
  }

  test("longestStreak: islands over distinct days, duplicates collapse") {
    // user a: days 1,2,3, 7,8, dup 2 -> streak 3, active 5
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("a", 7L),
        ("a", 8L), ("b", 4L))
      .toDF("u", "day")
    val got = graft.ops.Behavior.longestStreak(df, "u", "day")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((5L, 3L)), "b" -> ((1L, 1L))))
  }

  test("kCorePeel: leaves peel off round by round, the cycle survives") {
    // triangle 1-2-3 with tail 3-4-5: k=2 drops 5 (deg 1), then 4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val got = LinkGraph.kCorePeel(pairs, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCorePeel: everything below k vanishes entirely") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    assert(LinkGraph.kCorePeel(pairs, k = 2, rounds = 3).count() === 0L)
  }

  test("pointInPolygon: square parity, half-open tiling boundary convention") {
    // west/south boundary inside (3: left edge, 4: SW corner), east
    // boundary outside (6) — adjacent fences tile with no double-count
    val pts = Seq((1L, 5L, 5L), (2L, 15L, 5L), (3L, 0L, 5L), (4L, 0L, 0L),
        (5L, -3L, 5L), (6L, 10L, 5L))
      .toDF("id", "x", "y")
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val got = graft.ops.Spatial.pointInPolygon(pts, "x", "y", sq)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> false, 6L -> false))
  }

  test("coveredTime: overlaps merge, gaps do not count") {
    val iv = Seq(("g", 0L, 10L), ("g", 5L, 15L), ("g", 20L, 25L),
        ("h", 0L, 3L), ("h", 0L, 3L)) // exact duplicate intervals
      .toDF("grp", "start", "end")
    val got = graft.ops.Sweep.coveredTime(iv).orderBy($"grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("g", 3L, 20L), ("h", 2L, 3L)))
  }

  test("coveredTime: two-phase lead matches the single-window sweep on a big group") {
    val iv = (1L to 4000L).map { k =>
      val s = (k * 48271L) % 9973L
      ("g", s, s + 1 + (k * 16807L) % 211L)
    }.toDF("grp", "start", "end")
    val got = graft.ops.Sweep.coveredTime(iv)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    import org.apache.spark.sql.expressions.{Window => W}
    val deltas = iv.select($"grp", $"start".as("t"), lit(1L).as("delta"))
      .unionByName(iv.select($"grp", $"end".as("t"), lit(-1L).as("delta")))
    val w = W.partitionBy($"grp").orderBy($"t", $"delta")
    val naive = deltas
      .withColumn("run", sum($"delta").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("nt", lead($"t", 1).over(w))
      .agg(sum(when($"run" > 0, $"nt" - $"t").otherwise(0L)))
      .head.getLong(0)
    assert(got === ((4000L, naive)))
  }

  test("benfordProfile: uniform digits share 1/9, leading digit extraction") {
    val df = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).map(d => d * 100 + 23))
      .toDF("v") // 123, 223, ... 923: leading digits 1..9 once each
    val got = graft.ops.Drift.benfordProfile(df, "v").orderBy($"digit")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === (1L to 9L))
    assert(got.forall(_._2 == 1L))
    assert(got.forall(_._3 == 111111L))
  }

  test("pmiCollocations: hand-computed micro-nats and min-count gate") {
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    // unigrams x:3 y:3 (N1=6); bigrams (x,y):3 (y,x):2 (NB=5)
    // PMI(x,y) = ln(3*36/(5*9)) = ln(2.4); PMI(y,x) = ln(1.6)
    val got = graft.ext.LangModel.pmiCollocations(docs, "text", k = 5, minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(("x", "y") -> ((3L, 875469L)), ("y", "x") -> ((2L, 470004L))))
    val gated = graft.ext.LangModel.pmiCollocations(docs, "text", k = 5, minCount = 3L)
    assert(gated.count() === 1L)
  }

  test("cumulativeDistinct: actives, first-seen news, running total") {
    val events = Seq(
      (1L, 10L, 1L), (2L, 20L, 2L),            // day 0: u1, u2 new
      (3L, 86400L + 5, 1L),                     // day 1: u1 active, no new
      (4L, 2 * 86400L + 5, 3L), (5L, 2 * 86400L + 9, 1L)) // day 2: u3 new
      .toDF("event_id", "sec", "user_id")
      .select($"event_id", timestamp_seconds($"sec").as("ts"), $"user_id")
    val got = Behavior.cumulativeDistinct(events).orderBy($"day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 2L, 2L, 2L), (1L, 1L, 0L, 2L),
      (2L, 2L, 1L, 3L)))
  }

  test("bestSplit: finds the exact step location in a clean level shift") {
    import spark.implicits._
    // 10 values at 5 then 10 values at 20: the split must land at k=10
    val df = ((1 to 10).map(t => (1L, t.toLong, 5L)) ++
      (11 to 20).map(t => (1L, t.toLong, 20L))).toDF("k", "t", "v")
    val got = graft.ops.TimeSeries.bestSplit(df, "k", Seq("t"), "v")
      .collect()(0)
    assert(got.getAs[Long]("split_pos") == 10L)
    assert(got.getAs[Long]("mean_pre_milli") == 5000L)
    assert(got.getAs[Long]("mean_post_milli") == 20000L)
  }

  test("bestSplit: a constant series ties to the earliest split") {
    import spark.implicits._
    val df = (1 to 8).map(t => (1L, t.toLong, 7L)).toDF("k", "t", "v")
    val got = graft.ops.TimeSeries.bestSplit(df, "k", Seq("t"), "v")
      .collect()(0)
    assert(got.getAs[Long]("split_pos") == 1L)
    assert(got.getAs[Long]("mean_pre_milli") == 7000L)
    assert(got.getAs[Long]("mean_post_milli") == 7000L)
  }
}
