package graft

import org.apache.spark.sql.functions._
import graft.ext.{LangModel, Sketches, TextAnalysis}
import graft.ops.{Behavior, Eval, Frontier, Spatial}

/** Ground truth for the eighth-wave operators on hand-built fixtures:
  * hand-computed cohort/transition/dwell tables, AUC corner cases
  * (perfect separation, all-ties, tie-averaging), calibration bin
  * clamping, grid-blocking completeness vs brute force, two-phase
  * frontier vs the quadratic dominance definition, BM25 length
  * normalization, OOV vocabulary tie-break, and HLL merge ≡ direct.
  */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"sec").as("ts"),
        $"user_id", $"event_type")

  test("cohortRetention: users cohort at first week, offsets count distinct actives") {
    // week length 604800: u1 active wk0 and wk2, u2 active wk0 only,
    // u3 arrives wk2; two events of u1 in wk0 count once
    val events = ev(
      (1L, 100L, 1L, "a"), (2L, 200L, 1L, "a"), (3L, 604800L * 2 + 5, 1L, "a"),
      (4L, 50L, 2L, "a"),
      (5L, 604800L * 2 + 9, 3L, "a"))
    val got = Behavior.cohortRetention(events)
      .orderBy($"cohort_week", $"week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 0L, 2L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }

  test("eventTransitions: adjacent pairs per user, micro rows sum to ~1e6 per prev") {
    val events = ev(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "cart"), (3L, 30L, 1L, "view"),
      (4L, 10L, 2L, "view"), (5L, 25L, 2L, "view"))
    val got = Behavior.eventTransitions(events)
      .orderBy($"prev_type", $"next_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("cart", "view", 1L, 1000000L),
      ("view", "cart", 1L, 500000L),
      ("view", "view", 1L, 500000L)))
  }

  test("eventTransitions: timestamp ties break on event_id") {
    val events = ev((2L, 10L, 1L, "b"), (1L, 10L, 1L, "a"), (3L, 20L, 1L, "c"))
    val got = Behavior.eventTransitions(events)
      .select($"prev_type", $"next_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(got === Set("a" -> "b", "b" -> "c"))
  }

  test("timeInState: gaps attribute to the earlier state; last events drop") {
    val events = ev(
      (1L, 0L, 1L, "idle"), (2L, 30L, 1L, "busy"), (3L, 100L, 1L, "idle"),
      (4L, 0L, 2L, "busy"), (5L, 10L, 2L, "busy"))
    val got = Behavior.timeInState(events).orderBy($"state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // u1: idle 0->30 (30s), busy 30->100 (70s); u2: busy 0->10 (10s)
    assert(got === Seq(("busy", 2L, 80L), ("idle", 1L, 30L)))
  }

  test("aucOneVsRest: perfect separation = 1e6, anti-separation = 0, all-ties = 5e5") {
    val df = Seq((10L, 1), (20L, 1), (1L, 0), (2L, 0)).toDF("score", "label")
    val got = Eval.aucOneVsRest(df, "score", "label")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got === Map(1 -> 1000000L, 0 -> 0L))

    val ties = Seq((5L, 1), (5L, 0), (5L, 1), (5L, 0)).toDF("score", "label")
    val gotTies = Eval.aucOneVsRest(ties, "score", "label")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(gotTies === Map(0 -> 500000L, 1 -> 500000L))
  }

  test("aucOneVsRest: hand-computed mixed case with a tie across classes") {
    // scores: pos {3, 2}, neg {2, 1}; pairs: (3,2)win (3,1)win
    // (2,2)half (2,1)win -> AUC = 3.5/4 = 0.875
    val df = Seq((3L, 1), (2L, 1), (2L, 0), (1L, 0)).toDF("score", "label")
    val got = Eval.aucOneVsRest(df, "score", "label")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got(1) === 875000L)
    assert(got(0) === 125000L) // complement: 1 - 0.875
  }

  test("aucOneVsRest: single-label input yields null AUC, not a fake 0") {
    val df = Seq((1L, 7), (2L, 7), (3L, 7)).toDF("score", "label")
    val got = Eval.aucOneVsRest(df, "score", "label").collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 0L)   // n_neg
    assert(got.head.isNullAt(3))          // auc_micro
  }

  test("calibrationBins: out-of-range p clamps to the edge bins") {
    val df = Seq((-5000L, 0L), (2000000L, 1L)).toDF("p_micro", "y")
    val got = Eval.calibrationBins(df, "p_micro", "y", bins = 10)
      .orderBy($"bin").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 9L))
  }

  test("nearestSite: int-typed micro-degree inputs do not overflow the distance") {
    // deltas of 100k micro-degrees square to 1e10 — past Int.MaxValue;
    // without the long cast the int math wraps and picks a wrong site
    val pts = Seq((1, 0, 0)).toDF("id", "lat", "lon")
    val sites = Seq((1, 100000, 0), (2, 90000, 0)).toDF("site_id", "lat", "lon")
    val got = Spatial.nearestSite(pts, sites).collect().head
    assert(got.getInt(1) === 2 && got.getLong(2) === 8100000000L)
  }

  test("calibrationBins: p = 1e6 clamps into the last bin; means are exact") {
    val df = Seq((1000000L, 1L), (950000L, 1L), (50000L, 0L), (149999L, 1L))
      .toDF("p_micro", "y")
    val got = Eval.calibrationBins(df, "p_micro", "y", bins = 10)
      .orderBy($"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 1L, 0L, 50000L, 0L),
      (1L, 1L, 1L, 149999L, 1000000L),
      (9L, 2L, 2L, 975000L, 1000000L)))
  }

  test("nearestSite: exact arg-min with ties to the lower site id") {
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 10L)).toDF("id", "lat", "lon")
    val sites = Seq((7L, 0L, 3L), (5L, 0L, -3L), (9L, 10L, 11L))
      .toDF("site_id", "lat", "lon")
    val got = Spatial.nearestSite(pts, sites).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // point 1 is 9 micro² from both site 5 and site 7 -> lower id 5 wins
    assert(got === Seq((1L, 5L, 9L), (2L, 9L, 1L)))
  }

  test("radiusNeighbors: grid blocking reproduces brute force exactly (incl. cell edges)") {
    // deterministic pseudo-random points in a small box, radius chosen
    // so pairs straddle cell boundaries; includes an exact-distance pair
    val pts = (1L to 120L).map { k =>
      (k, -500000L + (k * 2654435761L) % 1000001L, (k * 40503L + 7L) % 1000001L)
    }.toDF("id", "lat", "lon")
    val r = 60000L
    val got = Spatial.radiusNeighbors(pts, r)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val a = pts.select($"id".as("ia"), $"lat".as("la"), $"lon".as("oa"))
    val brute = a.crossJoin(pts.select($"id".as("ib"), $"lat".as("lb"), $"lon".as("ob")))
      .filter($"ia" =!= $"ib")
      .filter(($"la" - $"lb") * ($"la" - $"lb") + ($"oa" - $"ob") * ($"oa" - $"ob")
        <= lit(r * r))
      .groupBy($"ia").agg(count(lit(1)).as("n"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val full = (1L to 120L).map(k => k -> brute.getOrElse(k, 0L)).toMap
    assert(got === full)
    assert(got.values.sum > 0, "fixture must produce at least one pair")
    assert(got.values.exists(_ == 0), "fixture must include isolated points")
  }

  test("paretoFrontier: matches the quadratic dominance definition, with ties") {
    val pts = ((1L to 200L).map { k =>
      ((k * 48271L) % 97L, (k * 16807L) % 89L)
    } ++ Seq((96L, 0L), (96L, 5L), (0L, 88L), (50L, 50L), (50L, 50L)))
      .toDF("x", "y")
    val got = Frontier.paretoFrontier(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = pts.select($"x", $"y").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = all.filter { case (x, y) =>
      !all.exists { case (qx, qy) => qx > x && qy > y }
    }
    assert(got === want)
    // strict-both dominance: (96, 0) survives only if nothing beats it
    // on BOTH axes; a same-x higher-y point does not dominate it
    assert(got.contains((96L, 5L)) === want.contains((96L, 5L)))
  }

  test("bm25TopK: length normalization demotes the long document's repeated term") {
    // same tf for 'whale' in both docs, but doc 2 is much longer ->
    // its normalized score must be lower
    val docs = Seq(
      (1L, "whale whale sea"),
      (2L, "whale whale " + ("reef coral tide foam gull brine " * 8).trim),
      (3L, "sea sea sky")).toDF("doc_id", "text")
    val scored = LangModel.bm25TopK(docs, "doc_id", "text", k = 10)
    // columns: (id, tok, score_micro, rnk)
    val whale = scored.filter($"tok" === "whale")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(whale(1L) > whale(2L))
    val ranks = scored.filter($"id" === 1L).orderBy($"rnk")
      .collect().map(_.getString(1)).toSeq
    assert(ranks.head === "whale") // rarer + frequent beats 'sea'
  }

  test("oovRate: deterministic vocabulary boundary (count desc, token asc)") {
    // counts: aa=2, bb=2, cc=1; V=2 -> vocab {aa, bb}; doc tokens
    // 'aa bb cc cc' -> 2 OOV of 4 = 500000 micro
    val docs = Seq((1L, "aa bb cc cc"), (2L, "aa bb")).toDF("doc_id", "text")
    val got = LangModel.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((1L, 4L, 2L, 500000L), (2L, 2L, 0L, 0L)))
  }

  test("funnelConversion: window gates each step from FUNNEL ENTRY, order enforced") {
    val W = 100L
    val events = ev(
      // u1 completes in order within the window
      (1L, 0L, 1L, "a"), (2L, 10L, 1L, "b"), (3L, 20L, 1L, "c"),
      // u2: b BEFORE a -> not a conversion; later b missing
      (4L, 50L, 2L, "b"), (5L, 60L, 2L, "a"),
      // u3: b inside window, c past entry+W -> stops at b
      (6L, 0L, 3L, "a"), (7L, 90L, 3L, "b"), (8L, 150L, 3L, "c"),
      // u4 never enters (no a)
      (9L, 0L, 4L, "c"))
    val got = Behavior.funnelConversion(events, Seq("a", "b", "c"), W)
      .orderBy($"step_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, "a", 3L, 1000000L),
      (2L, "b", 2L, 666667L),   // u1, u3 (u2's b precedes its a)
      (3L, "c", 1L, 333333L)))  // only u1 (u3's c is past the window)
  }

  test("topPaths: first-k path per user, count desc then path asc") {
    val events = ev(
      (1L, 0L, 1L, "a"), (2L, 1L, 1L, "b"), (3L, 2L, 1L, "c"), (4L, 3L, 1L, "d"),
      (5L, 0L, 2L, "a"), (6L, 1L, 2L, "b"), (7L, 2L, 2L, "c"),
      (8L, 0L, 3L, "a"), (9L, 1L, 3L, "z"),
      (10L, 0L, 4L, "a"), (11L, 1L, 4L, "z"))
    val got = Behavior.topPaths(events, k = 3, topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a>b>c", 2L), ("a>z", 2L)))
  }

  test("maxConcurrency: sweep line with half-open touch, per-group, zero-length dropped") {
    val iv = Seq(
      ("x", 0L, 10L), ("x", 5L, 15L), ("x", 10L, 20L), // peak 2; [0,10) and [10,20) never overlap
      ("x", 7L, 7L),                                   // zero-length: dropped
      ("y", 0L, 100L), ("y", 1L, 2L), ("y", 1L, 2L), ("y", 1L, 2L) // nested burst: peak 4
    ).toDF("grp", "start", "end")
    val got = graft.ops.Sweep.maxConcurrency(iv).orderBy($"grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("x", 3L, 2L), ("y", 4L, 4L)))
  }

  test("maxConcurrency: two-phase result matches the single-window sweep on a big group") {
    val iv = (1L to 5000L).map { k =>
      val s = (k * 48271L) % 10007L
      ("g", s, s + 1 + (k * 16807L) % 97L)
    }.toDF("grp", "start", "end")
    val got = graft.ops.Sweep.maxConcurrency(iv)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
    import org.apache.spark.sql.expressions.{Window => W}
    val deltas = iv.select($"grp", $"start".as("t"), lit(1L).as("delta"))
      .unionByName(iv.select($"grp", $"end".as("t"), lit(-1L).as("delta")))
    val naive = deltas.withColumn("c",
        sum($"delta").over(W.partitionBy($"grp").orderBy($"t", $"delta")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .agg(max($"c")).head.getLong(0)
    assert(got === (("g", 5000L, naive)))
  }

  test("maxConcurrency: shuffle-offsets path equals the broadcast path") {
    val iv = (1L to 3000L).map { k =>
      val s = (k * 48271L) % 5003L
      (s"g${k % 7}", s, s + 1 + (k * 16807L) % 97L)
    }.toDF("grp", "start", "end")
    val bc = graft.ops.Sweep.maxConcurrency(iv).orderBy($"grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val sh = graft.ops.Sweep.maxConcurrency(iv, broadcastOffsets = false)
      .orderBy($"grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bc === sh)
  }

  test("olsByGroup: exact fit on a perfect line, degenerate groups yield nulls") {
    val df = Seq(
      ("lin", 0L, 5L), ("lin", 1L, 7L), ("lin", 2L, 9L),  // y = 2x + 5
      ("flat", 0L, 3L), ("flat", 1L, 3L),                  // slope 0, vary 0
      ("deg", 4L, 1L), ("deg", 4L, 9L)                     // constant x
    ).toDF("grp", "x", "y")
    val got = Eval.olsByGroup(df, "grp", "x", "y").orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(got === Seq(
      ("deg", 2L, None, None, None),
      ("flat", 2L, Some(0.0), Some(3.0), None),
      ("lin", 3L, Some(2.0), Some(5.0), Some(1.0))))
  }

  test("weightedQuantiles: crossing test lands on real values, weights shift the median") {
    // grp A: values 1(w5), 2(w1), 3(w1): W=7, median = first v with
    // 2*cum >= 7 -> cum(1)=5, 10 >= 7 -> median 1; p90: 10*cum >= 63 ->
    // cum(2)=6 (60 no), cum(3)=7 (70 yes) -> 3
    // grp B: equal weights 1..4 -> lower median = 2
    val df = Seq(
      ("A", 1L, 5L), ("A", 2L, 1L), ("A", 3L, 1L),
      ("B", 1L, 1L), ("B", 2L, 1L), ("B", 3L, 1L), ("B", 4L, 1L),
      ("B", 9L, 0L) // zero weight: no mass, must not appear
    ).toDF("grp", "v", "w")
    val got = graft.ops.WeightedStats.weightedQuantiles(df, "grp", "v", "w",
        Seq((1, 2, "med"), (9, 10, "p90")))
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("A", 7L, 1L, 3L), ("B", 4L, 2L, 4L)))
  }

  test("hllMergeRegisters: per-source merge equals the single-pass registers") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val toks = docs.select($"source", explode(TextAnalysis.tokens($"text")).as("tok"))
    val direct = Sketches.hllRegisters(toks.select($"tok"), "tok", p = 5)
      .orderBy($"bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val merged = Sketches.hllMergeRegisters(
        Sketches.hllRegistersBy(toks, Seq("source"), "tok", p = 5)
          .select($"bucket", $"register"))
      .orderBy($"bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged === direct)
  }

  test("markovStationary: deterministic 2-cycle settles on the uniform fixed point") {
    // a→b→a→b…: P = [[0,1],[1,0]]; π0 = (0.5, 0.5) is exactly
    // stationary, and integer floors lose nothing on exact halves
    val events = ev(
      (1L, 1L, 1L, "a"), (2L, 2L, 1L, "b"), (3L, 3L, 1L, "a"),
      (4L, 4L, 1L, "b"), (5L, 5L, 1L, "a"))
    val got = Behavior.markovStationary(events, rounds = 5)
      .orderBy($"state").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 500000L), ("b", 500000L)))
  }

  test("markovStationary: floor truncation bleeds at most states micro per round") {
    val events = graft.core.Tables.events(spark, sfDir)
    val pi = Behavior.markovStationary(events, rounds = 6)
      .agg(sum($"pi_micro")).collect()(0).getLong(0)
    // 5 states × 6 rounds × ≤1 micro floor loss each, plus the π0 div
    assert(pi <= 1000000L && pi >= 1000000L - 5L * 7L,
      s"mass out of the floor-loss envelope: $pi")
  }

  test("dbscanGrid: two blobs and a far point give two clusters and noise") {
    // blob A: 5 points within r of each other at (0,0); blob B: 5 at
    // (1000000, 0); outlier at (5000000, 5000000); minPts 4
    val a = (1L to 5L).map(k => (k, k * 100L, 0L))
    val b = (11L to 15L).map(k => (k, 1000000L + (k - 11L) * 100L, 0L))
    val pts = (a ++ b :+ ((99L, 5000000L, 5000000L))).toDF("id", "lat", "lon")
    val got = Spatial.dbscanGrid(pts, rMicro = 10000L, minPts = 4)
      .orderBy($"id").collect()
    val roles = got.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1L to 5L).forall(roles(_) == "core"))
    assert((11L to 15L).forall(roles(_) == "core"))
    assert(roles(99L) == "noise")
    val clusters = got.filter(!_.isNullAt(3))
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((1L to 5L).map(clusters).toSet == Set(1L))
    assert((11L to 15L).map(clusters).toSet == Set(11L))
    assert(got.filter(_.getString(2) == "noise").forall(_.isNullAt(3)))
  }

  test("dbscanGrid: border point adopts its core neighbor's cluster") {
    // 4 mutual cores at x=0..300 (each sees 3 others + self = 4);
    // border at x=10300: within r of core 4 only, itself sees 1 -> border
    val pts = Seq((1L, 0L, 0L), (2L, 100L, 0L), (3L, 200L, 0L),
      (4L, 300L, 0L), (9L, 10300L, 0L)).toDF("id", "lat", "lon")
    val got = Spatial.dbscanGrid(pts, rMicro = 10000L, minPts = 4)
      .orderBy($"id").collect()
    val byId = got.map(r => r.getLong(0) ->
      (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(byId(9L) == ("border", 1L), s"got $byId")
    assert(Seq(1L, 2L, 3L, 4L).forall(k => byId(k) == ("core", 1L)))
  }

  test("markovBacktest: trains only before the cutoff; a post-cutoff flip is invisible") {
    // pre-cutoff: a->b always; post-cutoff: a->c always. The model must
    // still predict b (trained pre-cutoff) and score 0 on the test side.
    val pre = (1 to 6).flatMap(k => Seq(
      (k * 10L, 100L + k, k.toLong, "a"), (k * 10L + 1, 200L + k, k.toLong, "b")))
    val post = (1 to 4).flatMap(k => Seq(
      (1000L + k * 10L, 86400L * 40 + k * 100L, 100L + k, "a"),
      (1001L + k * 10L, 86400L * 40 + k * 100L + 1, 100L + k, "c")))
    val events = ev((pre ++ post): _*)
    val got = Behavior.markovBacktest(events, cutoffDay = 30L).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 4L && r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("churnLabels: future window sets the label; features stop at the cutoff") {
    // u1 active pre and in the horizon -> not churned; u2 pre only ->
    // churned; u3 only post-horizon activity -> churned (and its
    // post-cutoff events must not leak into the features)
    val events = ev(
      (1L, 86400L * 2, 1L, "view"), (2L, 86400L * 12, 1L, "purchase"),
      (3L, 86400L * 3, 2L, "view"),
      (4L, 86400L * 4, 3L, "view"), (5L, 86400L * 25, 3L, "view"))
      .withColumn("value", lit(10.0))
    val got = Behavior.churnLabels(events, cutoffDay = 10L, horizonDays = 5L)
      .orderBy(col("user_id")).collect()
    val byU = got.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_events"), r.getAs[Boolean]("churned"))).toMap
    assert(byU(1L) == (1L, false)) // day-12 purchase is label-side only
    assert(byU(2L) == (1L, true))
    assert(byU(3L) == (1L, true)) // day-25 event beyond the horizon
  }

  test("rfmSegments: codes run 1..4 with 4 = best on every axis") {
    import spark.implicits._
    // 8 users with strictly increasing activity/spend and strictly
    // more recent last events: user 8 must land in segment 444
    val events = ev((1 to 8).flatMap { u =>
      (1 to u).map(j => ((u * 100 + j).toLong,
        86400L * u + j, u.toLong, "view"))
    }: _*).withColumn("value", $"user_id".cast("double"))
    val got = graft.ops.Behavior.rfmSegments(events, refDay = 20L)
      .collect()
    val total = got.map(_.getAs[Long]("n_users")).sum
    assert(total == 8L)
    assert(got.forall { r =>
      Seq("r_code", "f_code", "m_code").forall { c =>
        val v = r.getAs[Long](c); v >= 1L && v <= 4L } })
    // the most active, most recent, highest-spend user sits in 444
    assert(got.exists(r => r.getAs[Long]("segment") == 444L))
  }
}
