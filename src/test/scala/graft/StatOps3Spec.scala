package graft

import org.apache.spark.sql.functions._

/** Round-9 late-wave statistics: hand-walkable goldens for the
  * delta-method ratio SE, the leave-one-group-out jackknife, the
  * ACF/Ljung–Box screen, and the two-sample log-rank test.
  */
class StatOps3Spec extends SparkTestBase {
  import spark.implicits._

  test("ratio delta: constant per-unit ratio has zero variance") {
    // x = 3·y exactly for every unit → θ = 3, delta-method SE = 0
    val df = Seq(("a", 30L, 10L), ("a", 60L, 20L), ("a", 90L, 30L),
      ("a", 15L, 5L)).toDF("variant", "x", "y")
    val r = graft.ops.Eval.ratioMetricDelta(df, "variant", col("x"), col("y"))
      .collect()
    assert(r.head.getAs[Long]("ratio_micro") == 3000000L, r.toSeq)
    assert(r.head.getAs[Long]("se_micro") == 0L)
  }

  test("ratio delta: y ≡ 1 reduces to the plain SE of the mean") {
    // x = 2, 4, 6, 8 with unit denominators: θ = mean = 5,
    // s² = 20/3, Var(θ) = s²/n = 5/3, SE = sqrt(5/3) ≈ 1.290994
    val df = Seq(("a", 2L, 1L), ("a", 4L, 1L), ("a", 6L, 1L), ("a", 8L, 1L))
      .toDF("variant", "x", "y")
    val r = graft.ops.Eval.ratioMetricDelta(df, "variant", col("x"), col("y"))
      .collect()
    assert(r.head.getAs[Long]("ratio_micro") == 5000000L)
    assert(r.head.getAs[Long]("se_micro") == 1290994L, r.toSeq)
  }

  test("jackknife ratio: identical folds give zero SE; asymmetry > 0") {
    val same = (1 to 10).map(i => (i.toLong, 100L, 1L)).toDF("f", "x", "y")
    val r1 = graft.ops.Eval.jackknifeRatio(same, "f", col("x"), col("y"))
      .collect()
    assert(r1.head.getAs[Long]("theta_micro") == 100000000L)
    assert(r1.head.getAs[Long]("jk_se_milli") == 0L)
    // one outlier fold moves every LOO theta — SE strictly positive
    val skew = ((1 to 9).map(i => (i.toLong, 100000L, 1L)) :+ (10L, 2000000L, 1L))
      .toDF("f", "x", "y")
    val r2 = graft.ops.Eval.jackknifeRatio(skew, "f", col("x"), col("y"))
      .collect()
    assert(r2.head.getAs[Long]("n_folds") == 10L)
    assert(r2.head.getAs[Long]("jk_se_milli") > 0L, r2.toSeq)
  }

  test("acf: period-2 alternating series has r_1 = -1, r_2 = +1") {
    // x alternates 0, 10, 0, 10 … over a dense index; with the
    // (n−k)-pair sample ACF the lag-1 correlation is −1·(pair share)
    // of c0 — check signs and the exact lag-2 value on n = 40
    val n = 40
    val df = (0 until n).map(i => ("k", i.toLong, if (i % 2 == 0) 0L else 10L))
      .toDF("key", "t", "x")
    val r = graft.ops.TimeSeries.acfLjungBox(df, "key", "t", "x", maxLag = 2)
      .collect().map(row => row.getAs[Long]("lag") -> row).toMap
    // c0 = Σ(x−5)² = 40·25 = 1000
    // lag1: 39 pairs each (x−5)(x'−5) = −25 → c1 = −975, r1 = −975000
    assert(r(1L).getAs[Long]("r_micro") == -975000L, r)
    // lag2: 38 pairs each +25 → c2 = 950, r2 = 950000
    assert(r(2L).getAs[Long]("r_micro") == 950000L)
    assert(r(1L).getAs[Long]("m") == 39L)
    // Ljung-Box is large for this maximally autocorrelated series:
    // Q = n(n+2)·(r1²/39 + r2²/38) ≈ 40·42·(0.024375 + 0.023750) ≈ 80.8
    assert(r(1L).getAs[Long]("lb_q_milli") > 80000L)
    assert(r(1L).getAs[Long]("lb_q_milli") < 82000L)
  }

  test("acf: near-constant series with one blip — hand moments") {
    // x = 0 except x[0] = 4, n = 8, K = 1: x̄ = 0.5,
    // c0 = 4² − 8·0.25 = 14... check via the shared shape:
    // c0 = Σx² − S·(S/n) = 16 − 4·0.5 = 14
    // lag1 pairs: Σ x_t·x_{t+1} = 0; head sum = 4, tail sum = 0, m = 7
    // c1 = 0 − 0.5·(4+0) + 7·0.25 = −0.25 → r1 = round(−0.25/14·1e6)
    val df = (0 until 8).map(i => ("k", i.toLong, if (i == 0) 4L else 0L))
      .toDF("key", "t", "x")
    val r = graft.ops.TimeSeries.acfLjungBox(df, "key", "t", "x", maxLag = 1)
      .collect()
    assert(r.head.getAs[Long]("r_micro") ==
      math.round(-0.25 / 14.0 * 1e6), r.toSeq)
  }

  test("pacf: lag-1 equals r1; lag-2 matches the hand D-L step") {
    val n = 40
    val df = (0 until n).map(i => ("k", i.toLong, if (i % 2 == 0) 0L else 10L))
      .toDF("key", "t", "x")
    val r = graft.ops.TimeSeries.pacfDurbinLevinson(df, "key", "t", "x",
        maxLag = 2)
      .collect().map(row => row.getAs[Long]("lag") -> row).toMap
    // r1 = -0.975, r2 = 0.950 (the q366 alternating fixture)
    assert(r(1L).getAs[Long]("pacf_micro") == -975000L, r)
    // φ22 = (r2 − r1²) / (1 − r1²) with the engine's rounded r values
    val r1 = -975000L / 1e6; val r2 = 950000L / 1e6
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(r(2L).getAs[Long]("pacf_micro") == math.round(phi22 * 1e6), r)
  }

  test("holt-winters: constant series is a fixed point") {
    val df = (0 until 20).map(i => ("k", i.toLong, 500L)).toDF("key", "t", "x")
    val r = graft.ops.TimeSeries.holtWintersAdditive(df, "key", "t", "x",
      p = 7, na = 3L, da = 10L, nb = 1L, db = 10L, ng = 2L, dg = 10L)
      .collect().head
    assert(r.getAs[Long]("level_end") == 500L, r)
    assert(r.getAs[Long]("trend_end") == 0L)
    assert(r.getAs[Long]("forecast1") == 500L)
  }

  test("holt-winters: pure period-3 seasonal is tracked exactly") {
    // x cycles 10, 20, 30 — l stays 20, b stays 0, s stays (−10, 0, 10),
    // and the one-step forecast equals the true next value
    val df = (0 until 12).map(i => ("k", i.toLong, ((i % 3) + 1) * 10L))
      .toDF("key", "t", "x")
    val r = graft.ops.TimeSeries.holtWintersAdditive(df, "key", "t", "x",
      p = 3, na = 3L, da = 10L, nb = 1L, db = 10L, ng = 2L, dg = 10L)
      .collect().head
    assert(r.getAs[Long]("level_end") == 20L, r)
    assert(r.getAs[Long]("trend_end") == 0L)
    // n = 12 → next value is x_12 = 10 (slot 0)
    assert(r.getAs[Long]("forecast1") == 10L)
  }

  test("logrank: identical survival in both groups gives z ≈ 0") {
    // mirrored event times and censoring across sides
    val rows = for (i <- 1 to 30; s <- Seq(0, 1))
      yield (s, (i % 7 + 1).toLong, if (i % 3 == 0) 0L else 1L)
    val r = graft.ops.Survival.logRank(rows.toDF("side", "dur", "ev"),
      "side", "dur", "ev").collect()
    assert(r.head.getAs[Long]("n1") == 30L)
    assert(r.head.getAs[Long]("n0") == 30L)
    // O = E exactly under mirror symmetry
    assert(r.head.getAs[Long]("o1") * 1000000L ==
      r.head.getAs[Long]("e1_micro"), r.toSeq)
    assert(math.abs(r.head.getAs[Long]("z_milli")) <= 1L)
  }

  test("ipw: flat propensity reduces Hájek means to raw arm means") {
    // one CONSTANT feature → the model scores every unit identically →
    // equal weights within each arm → mu_arm = plain arm mean
    val units = ((1 to 8).map(i => (i.toLong, 500000L, 1L, 3L))
      ++ (9 to 20).map(i => (i.toLong, 500000L, 0L, 1L)))
      .toDF("id", "x", "t", "y")
    val r = graft.ops.Causal.ipwAteLogistic(units, Seq(col("x")),
      col("t") === 1L, col("y"), epochs = 2).collect().head
    assert(r.getAs[Long]("n1") == 8L)
    assert(r.getAs[Long]("n0") == 12L)
    assert(r.getAs[Long]("mu1_micro") == 3000000L, r)
    assert(r.getAs[Long]("mu0_micro") == 1000000L)
    assert(r.getAs[Long]("ate_micro") == 2000000L)
  }

  test("logrank: hand risk sets on a 4-subject fixture") {
    // side 1: events at t=1, t=3; side 0: event at t=2, censored at t=4
    // t=1: n1=2, n0=2, d=1 → E += 1·2/4 = 0.5, V += (2/4)(2/4)(3/3) = 0.25
    // t=2: n1=1, n0=2, d=1 → E += 1/3,  V += (1/3)(2/3)(1)·(2/2)? —
    //   V term: d(n1/n)(n0/n)(n−d)/(n−1) = (1/3)(2/3)(2)/2 = 2/9
    // t=3: n1=1, n0=1, d=1 → E += 1/2,  V += (1/2)(1/2)(1)/1 = 1/4
    // O1 = 2, E1 = 0.5 + 1/3 + 0.5 = 4/3, V = 0.25 + 2/9 + 0.25 = 13/18
    val df = Seq((1, 1L, 1L), (1, 3L, 1L), (0, 2L, 1L), (0, 4L, 0L))
      .toDF("side", "dur", "ev")
    val r = graft.ops.Survival.logRank(df, "side", "dur", "ev").collect()
    assert(r.head.getAs[Long]("o1") == 2L)
    assert(r.head.getAs[Long]("e1_micro") == 500000L + 333333L + 500000L)
    assert(r.head.getAs[Long]("v_micro") == 250000L + 222222L + 250000L)
    val z = (2.0 - 1333333.0 / 1e6) / math.sqrt(722222.0 / 1e6) * 1000.0
    assert(r.head.getAs[Long]("z_milli") == math.round(z), r.toSeq)
  }

  test("MDE sizing: hand moments on a two-arm fixture") {
    // arms {1,3} and {2,4}: each has sample variance 2, so
    // se² = 2/2 + 2/2 = 2 for both one-vs-rest cells
    val df = Seq(("g", 0, 1L), ("g", 0, 3L), ("g", 1, 2L), ("g", 1, 4L))
      .toDF("grp", "variant", "cents")
    val r = graft.ops.Eval.mdePower(df, "grp", "variant", "cents")
      .orderBy(col("variant")).collect()
    assert(r.length == 2, r.toSeq)
    val se = math.sqrt(2.0)
    val z = 1.959964 + 0.841621
    assert(r.forall(_.getAs[Long]("se_micro") == math.round(se * 1e6)), r.toSeq)
    assert(r.forall(_.getAs[Long]("mde_micro") == math.round(z * se * 1e6)), r.toSeq)
    // rest means: variant 0's rest is {2,4} (mean 3), variant 1's rest
    // is {1,3} (mean 2) — relative MDE scales accordingly
    assert(r(0).getAs[Long]("mde_rel_milli") ==
      math.round(z * se * math.abs(2.0 / 6.0) * 1000.0), r.toSeq)
    assert(r(1).getAs[Long]("mde_rel_milli") ==
      math.round(z * se * math.abs(2.0 / 4.0) * 1000.0), r.toSeq)
  }

  test("BH-FDR step-up closure: a rank failing its own line is still rejected") {
    // two-sided p ≈ (.0200, .0240, .0350, .9000) at α=.05, m=4: the
    // step-up lines i·α/m are .0125/.025/.0375/.05 — rank 1 FAILS its
    // own line but ranks 2 and 3 pass theirs, so k* = 3 and the closure
    // rejects ranks 1..3 (the defining BH behavior a naive per-rank
    // threshold gets wrong)
    val tests = Seq(("t1", 2326000L), ("t2", 2257000L), ("t3", 2108000L),
      ("t4", 126000L)).toDF("test_id", "z_micro")
    val out = graft.ops.Eval.bhFdr(tests, "z_micro", 50000L, Seq("test_id"))
      .orderBy(col("rnk")).collect()
    assert(out.map(_.getAs[String]("test_id")).toSeq ==
      Seq("t1", "t2", "t3", "t4"), out.toSeq)
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, true, false), out.toSeq)
    val ps = out.map(_.getAs[Long]("p_micro")).toSeq
    assert(ps == ps.sorted && ps.head > 15000L && ps.head < 25000L, ps)
  }

  test("BH-FDR: a panel of nulls rejects nothing; sign of z is irrelevant") {
    val tests = Seq(("a", 100000L), ("b", -50000L), ("c", 0L))
      .toDF("test_id", "z_micro")
    val out = graft.ops.Eval.bhFdr(tests, "z_micro", 50000L, Seq("test_id"))
      .collect()
    assert(out.length == 3 && out.forall(!_.getAs[Boolean]("reject")),
      out.toSeq)
    // z = 0 → two-sided p = 1 (the least(·, 1) clamp)
    assert(out.find(_.getAs[String]("test_id") == "c")
      .get.getAs[Long]("p_micro") == 1000000L, out.toSeq)
  }
}
