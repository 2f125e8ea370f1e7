package graft

import org.apache.spark.sql.functions._

/** Ground truth for the wave-35 evaluation operators on hand fixtures:
  * alpha sweep on a separable corpus, MASE of a perfectly seasonal
  * series, Hill numbers of a uniform distribution, and the moment-form
  * alignment against the brute pair definition.
  */
class EvalOps2Spec extends SparkTestBase {
  import spark.implicits._

  test("alphaSweepNb: separable corpus is perfect at every smoothing strength") {
    val docs = (0 until 28).map { i =>
      (i.toLong, if (i % 2 == 0) "good good" else "bad bad", i % 2 == 0)
    }.toDF("doc_id", "text", "gold")
    val got = graft.ext.LangModel.alphaSweepNb(docs, "doc_id", "text",
        col("gold"), Seq(100000L, 1000000L, 5000000L))
      .orderBy(col("alpha_micro")).collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("acc_milli") == 1000L))
    assert(got.map(_.getAs[Long]("n_docs")).distinct.length == 1)
  }

  test("seasonalNaiveEval: a period-7 series scores MASE 0; a drifting one doesn't") {
    // y(t) = t % 7: seasonal forecast exact, one-step naive errs
    val seasonal = (0L until 42L).map(t => ("a", t, t % 7)).toDF("k", "t", "y")
    val g1 = graft.ops.TimeSeries.seasonalNaiveEval(seasonal, "k", "t", "y")
      .collect()(0)
    assert(g1.getAs[Long]("mae_seasonal_milli") == 0L)
    assert(g1.getAs[Long]("mase_milli") == 0L)
    // y(t) = t: seasonal error 7, naive error 1 -> MASE = 7.0
    val drift = (0L until 42L).map(t => ("a", t, t)).toDF("k", "t", "y")
    val g2 = graft.ops.TimeSeries.seasonalNaiveEval(drift, "k", "t", "y")
      .collect()(0)
    assert(g2.getAs[Long]("mase_milli") == 7000L)
  }

  test("hillDiversity: uniform k-token slice has all Hill numbers = k") {
    val docs = Seq((1L, "a b c d a b c d", "u")).toDF("doc_id", "text", "source")
    val r = graft.ext.LangModel.hillDiversity(docs, "text", "source")
      .collect()(0)
    assert(r.getAs[Long]("hill0") == 4L)
    assert(math.abs(r.getAs[Long]("hill1_milli") - 4000L) <= 2L)
    assert(r.getAs[Long]("hill2_milli") == 4000L)
  }

  test("alignmentUniformity: moment form equals the brute pair definition") {
    val vecs = Seq(
      (0L, Array(0.1f, 0.2f), 0), (1L, Array(0.3f, -0.1f), 0),
      (2L, Array(-0.2f, 0.4f), 0), (3L, Array(0.0f, 0.0f), 1),
      (4L, Array(0.5f, 0.5f), 1))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val r = graft.ext.Ranking.alignmentUniformity(df, "vec_id", "embedding",
      "label", steps = Seq(1)).collect()(0)
    // brute: ordered same-label pairs of the micro vectors
    val micro = vecs.map { case (id, v, l) =>
      (id, v.map(x => math.round(x.toDouble * 1e6)), l)
    }
    val pairs = for {
      a <- micro; b <- micro
      if a._3 == b._3 && a._1 != b._1
    } yield a._2.zip(b._2).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = math.round(pairs.sum.toDouble / pairs.length / 1e6)
    assert(r.getAs[Long]("n_align_pairs") == pairs.length)
    assert(r.getAs[Long]("align_micro") == expect)
    // identical-vector labels would align at 0
    val same = Seq((0L, Array(0.1f, 0.2f), 0), (1L, Array(0.1f, 0.2f), 0))
      .toDF("vec_id", "embedding", "label")
    val r2 = graft.ext.Ranking.alignmentUniformity(same, "vec_id", "embedding",
      "label", steps = Seq(1)).collect()(0)
    assert(r2.getAs[Long]("align_micro") == 0L)
  }

  test("learningCurveNb: clean-signal corpus is perfect at every prefix; panel fixed") {
    val docs = (0 until 140).map { i =>
      (i.toLong, if (i % 2 == 0) "pos pos" else "neg neg", i % 2 == 0)
    }.toDF("doc_id", "text", "gold")
    val got = graft.ext.LangModel.learningCurveNb(docs, "doc_id", "text",
        col("gold"), m = 5)
      .orderBy(col("train_frac_pct")).collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[Long]("train_frac_pct")).toSeq ==
      Seq(20L, 40L, 60L, 80L, 100L))
    // training sizes strictly increase along the curve
    val sizes = got.map(_.getAs[Long]("n_train_docs"))
    assert(sizes.sliding(2).forall(p => p(0) < p(1)))
    assert(got.forall(_.getAs[Long]("acc_milli") == 1000L))
  }

  test("paddingWasteReport: exact waste on a hand bucket") {
    // two 5-token and one 8-token seqs in the 8-bucket:
    // padded 24, real 18 -> waste 250000
    val df = Seq((1L, 5L), (2L, 5L), (3L, 8L), (4L, 20L))
      .toDF("id", "ntok")
    val got = graft.ext.CorpusOps.paddingWasteReport(df, "id", col("ntok"),
        Seq(8L, 16L, 32L))
      .orderBy(col("bucket")).collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("bucket") == 8L)
    assert(got(0).getAs[Long]("waste_micro") == 250000L)
    assert(got(1).getAs[Long]("bucket") == 32L)
    assert(got(1).getAs[Long]("padded_tokens") == 32L)
  }

  test("cuped: perfectly correlated covariate removes all variance; theta exact") {
    // y = 2x exactly -> theta = 2, var ratio 0, adjusted means equal
    // the grand mean of y for both variants
    val users = (1 to 40).map { i =>
      (i.toLong, i.toLong * 100L, i.toLong * 200L)
    }.toDF("uid", "pre_c", "post_c")
    val got = graft.ops.Causal.cuped(users, col("uid") % 2,
      col("pre_c"), col("post_c")).orderBy(col("variant")).collect()
    assert(got.length == 2)
    assert(got.forall(_.getAs[Long]("theta_micro") == 2000000L))
    assert(got.forall(_.getAs[Long]("var_ratio_milli") == 0L))
    // grand mean of y = 2*100*(1..40 mean)=4100 cents -> 41000 milli
    assert(got.forall(r => math.abs(r.getAs[Long]("mean_adj_milli") - 41000L) <= 1L))
    // raw means differ by parity (odd vs even ids); adjusted ones don't
    assert(got(0).getAs[Long]("mean_y_milli") != got(1).getAs[Long]("mean_y_milli"))
  }

  test("diffInDiff: hand 2x2 with a known uplift") {
    // control: 10 -> 12 (+2); treat: 20 -> 27 (+7); DiD = +5 (milli: 5000)
    val rows = Seq(
      (0, false, 1000L), (0, true, 1200L),
      (1, false, 2000L), (1, true, 2700L)).toDF("v", "p", "c")
    val r = graft.ops.Causal.diffInDiff(rows, col("v"), col("p"), col("c"))
      .collect()(0)
    assert(r.getAs[Long]("did_milli") == 5000L)
    assert(r.getAs[Long]("control_pre_milli") == 10000L)
    assert(r.getAs[Long]("treat_post_milli") == 27000L)
  }

  test("slicedWasserstein: identical groups score 0; a shifted group scores the shift") {
    // group B = group A + constant offset c in every dim: every ±1
    // projection separates by |Σ ±c| and W1 per slice equals that gap
    val a = (1 to 10).map(i => (i.toLong, Array(0.1f, 0.2f), true))
    val same = (11 to 20).map(i => (i.toLong, Array(0.1f, 0.2f), false))
    val df0 = (a ++ same).toDF("vec_id", "embedding", "ga")
    val g0 = graft.ops.Drift.slicedWasserstein(df0, "vec_id", "embedding",
      col("ga"), nProj = 4).collect()
    assert(g0.forall(_.getAs[Long]("w1_milli") == 0L))

    val shifted = (11 to 20).map(i => (i.toLong, Array(0.2f, 0.3f), false))
    val df1 = (a ++ shifted).toDF("vec_id", "embedding", "ga")
    val g1 = graft.ops.Drift.slicedWasserstein(df1, "vec_id", "embedding",
      col("ga"), nProj = 4).collect()
    // projection signs for dims (0,1): per p, shift = |±0.1 ± 0.1|
    // which is 0 or 0.2 -> every slice reads 0 or ~200 milli
    assert(g1.forall(r => {
      val w = r.getAs[Long]("w1_milli"); w == 0L || math.abs(w - 200L) <= 1L
    }))
    assert(g1.exists(_.getAs[Long]("w1_milli") > 0L))
  }

  test("woeIvTable: a perfectly separating score gives opposite-sign extreme WoE") {
    import spark.implicits._
    // low scores all bad, high scores all good
    val df = ((1 to 20).map(i => (i.toLong, i.toLong, true)) ++
      (21 to 40).map(i => (i.toLong, i.toLong, false)))
      .toDF("id", "s", "bad")
    val got = graft.ops.Causal.woeIvTable(df, "id", col("s"), col("bad"),
        bins = 2)
      .orderBy(col("bucket")).collect()
    assert(got.length == 2)
    // bucket 0 = low scores = all bad -> strongly negative WoE
    assert(got(0).getAs[Long]("woe_milli") < -2000L)
    assert(got(1).getAs[Long]("woe_milli") > 2000L)
    assert(got.forall(_.getAs[Long]("iv_term_micro") > 0L))
  }

  test("blockingQuality: hand-computed RR and PC on a tiny block design") {
    import spark.implicits._
    // 6 records, 2 blocks of 3 -> candidates 2*3 = 6 of 15 -> RR = 0.6;
    // truth: 2 pairs, one co-blocked, one across blocks -> PC = 0.5
    val recs = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")).toDF("id", "key")
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val r = graft.ops.FuzzyLink.blockingQuality(recs, truth).collect()(0)
    assert(r.getAs[Long]("n_cand_pairs") == 6L)
    assert(r.getAs[Long]("n_true_blocked") == 1L)
    assert(r.getAs[Long]("rr_micro") == 600000L)
    assert(r.getAs[Long]("pc_milli") == 500L)
  }

  test("calibrationError: perfectly calibrated bins give 0; one bad bin drives MCE") {
    import spark.implicits._
    // bin 0 (p=50000): 1 of 20 positive (rate 50000) -> gap 0;
    // bin 9 (p=950000): all negative -> gap 950000
    val rows = (Seq.fill(19)((50000L, 0L)) :+ ((50000L, 1L))) ++
      Seq.fill(10)((950000L, 0L))
    val r = graft.ext.Calibrate.calibrationError(rows.toDF("p_micro", "y"),
      "p_micro", "y").collect()(0)
    assert(r.getAs[Long]("mce_micro") == 950000L)
    // ece = (20*0 + 10*950000)/30
    assert(r.getAs[Long]("ece_micro") == math.round(10.0 * 950000.0 / 30.0))
  }

  test("nelsonAalen: hand risk sets and running hazard") {
    import spark.implicits._
    // grp a: durations 1,1,2 all events: t=1 n=3 d=2 h=2/3; t=2 n=1 d=1 h=1
    val df = Seq(("a", 1L, 1L), ("a", 1L, 1L), ("a", 2L, 1L)).toDF("g", "t", "e")
    val got = graft.ops.Survival.nelsonAalen(df, "g", "t", "e")
      .orderBy(col("t")).collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("h_micro") == 666667L)
    assert(got(1).getAs[Long]("cumhaz_micro") == 1666667L)
  }

  test("linearCka: duplicated halves align at 1000, independent axes do not") {
    import spark.implicits._
    // 4-dim vectors whose second half EQUALS the first half -> CKA = 1
    val dup = (1 to 30).map { i =>
      val a = (i * 37 % 100) / 100.0f; val b = (i * 91 % 100) / 100.0f
      (i.toLong, Array(a, b, a, b))
    }.toDF("vec_id", "embedding")
    val r1 = graft.ext.Pca.linearCka(dup, "vec_id", "embedding", splitDim = 2)
      .collect()(0)
    assert(math.abs(r1.getAs[Long]("cka_milli") - 1000L) <= 1L)
  }

  test("importanceWeightedAccuracy: uniform target equals mean of group accuracies") {
    import spark.implicits._
    // group a: 100 rows at 90%; group b: 10 rows at 50% ->
    // raw = (90+5)/110 ~ 863; weighted = (900+500)/2 = 700
    val rows = (1 to 100).map(i => ("a", i <= 90)) ++
      (1 to 10).map(i => ("b", i <= 5))
    val r = graft.ops.Eval.importanceWeightedAccuracy(
      rows.toDF("g", "ok"), "g", col("ok")).collect()(0)
    assert(r.getAs[Long]("acc_raw_milli") == 864L)
    assert(r.getAs[Long]("acc_weighted_milli") == 700L)
  }

  test("harmonicCentrality: hand path graph") {
    import spark.implicits._
    // path 1-2-3-4, seed {1}: dists 1,2,3 -> H = 1e6 + 5e5 + 333333
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = graft.ext.LinkGraph.harmonicCentrality(edges, seeds, maxHops = 3)
      .collect()(0)
    assert(r.getAs[Long]("n_reached") == 3L)
    assert(r.getAs[Long]("harmonic_micro") == 1000000L + 500000L + 333333L)
  }
}
