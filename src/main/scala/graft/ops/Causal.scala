package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Experiment-analysis operators over an event log: CUPED variance
  * reduction and the difference-in-differences estimator — the two
  * workhorse adjustments an A/B readout applies before anyone trusts
  * a lift number. Metric values enter as exact integer cents
  * ([[graft.core.Exact]] discipline); covariances and the final
  * estimators are the only shared-shape doubles.
  *
  * Scale shape: one user-keyed aggregation collapses the event log to
  * per-user (pre, post) metric rows; everything after is single-row
  * moment arithmetic. No window, no pair join, no collect.
  */
object Causal {

  /** CUPED-adjusted A/B readout: per-user pre-period metric x and
    * post-period metric y (integer cents), pooled
    * θ = cov(x,y)/var(x) from exact integer sufficient statistics,
    * adjusted metric y* = y − θ·(x − x̄). Reports, per variant, the
    * raw and adjusted means plus the pooled θ and the variance ratio
    * var(y*)/var(y) — the "how much noise did the covariate remove"
    * number.
    *
    * @param variant  integer variant assignment per user row
    * @param preCents pre-period metric (integer cents)
    * @param postCents post-period metric (integer cents)
    * @return (variant, n_users, mean_y_milli, mean_adj_milli,
    *         theta_micro, var_ratio_milli)
    */
  def cuped(users: DataFrame, variant: Column, preCents: Column,
            postCents: Column): DataFrame = {
    val base = users.select(variant.cast("long").as("v"),
      preCents.cast("long").as("x"), postCents.cast("long").as("y"))
      .persist()
    try {
    val mom = base.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val cov = col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / nD
    val varX = col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / nD
    val varY = col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / nD
    val consts = mom.select(col("n"),
      (cov / varX).as("theta"),
      (col("sx").cast("double") / nD).as("xbar"),
      varY.as("var_y"), (varY - cov * cov / varX).as("var_adj"))
    // per-variant means in MOMENT form: mean(y*) = ȳ_v − θ(x̄_v − x̄).
    // Adjusting per row would sum doubles in partition order — the
    // non-reproducible plan the Exact discipline exists to avoid.
    val perV = base.groupBy(col("v").as("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sxv"), sum(col("y")).as("syv"))
    perV.crossJoin(broadcast(consts))
      .select(col("variant"), col("n_users"),
        round(col("syv").cast("double") / col("n_users").cast("double")
          * 10.0, 0).cast("long").as("mean_y_milli"),
        round((col("syv").cast("double") / col("n_users").cast("double")
          - col("theta") * (col("sxv").cast("double")
            / col("n_users").cast("double") - col("xbar")))
          * 10.0, 0).cast("long").as("mean_adj_milli"),
        round(col("theta") * 1000000.0, 0).cast("long").as("theta_micro"),
        round(col("var_adj") / col("var_y") * 1000.0, 0)
          .cast("long").as("var_ratio_milli"))
      .checkpointEager()
    } finally base.unpersist(false)
  }

  /** Difference-in-differences over the 2×2 (variant × period) design:
    * exact integer cell sums, the four cell means, and
    * DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre).
    *
    * @param rows (variant 0|1, is_post, cents) observation rows
    * @return one row: cell means (milli) + did_milli
    */
  def diffInDiff(rows: DataFrame, variant: Column, isPost: Column,
                 cents: Column): DataFrame = {
    val base = rows.select(variant.cast("long").as("v"),
      isPost.cast("boolean").as("p"), cents.cast("long").as("c"))
    val cells = base.groupBy(col("v"), col("p"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      .withColumn("mean_milli",
        round(col("s").cast("double") * 1000.0
          / (col("n").cast("double") * 100.0), 0).cast("long"))
    val wide = cells.groupBy(lit(1).as("one"))
      .pivot(concat(col("v"), when(col("p"), lit("_post"))
        .otherwise(lit("_pre"))), Seq("0_pre", "0_post", "1_pre", "1_post"))
      .agg(first(col("mean_milli")))
    wide.select(
      col("0_pre").as("control_pre_milli"), col("0_post").as("control_post_milli"),
      col("1_pre").as("treat_pre_milli"), col("1_post").as("treat_post_milli"),
      (col("1_post") - col("1_pre") - (col("0_post") - col("0_pre")))
        .as("did_milli"))
  }

  /** Weight-of-evidence / information-value table: bin a score by
    * quantiles (two-phase global rank — [[graft.ext.CorpusOps
    * .quantileBuckets]]), then per bin WoE = ln((g_b/G)/(b_b/B)) and
    * its IV contribution, Laplace-smoothed (+1 per cell) so empty
    * cells stay finite — the credit-scoring-style audit of how much a
    * single feature separates a binary label (pairs with the churn
    * labels of q322). Terms micro-rounded before the sum.
    *
    * @return (bucket, n, n_bad, woe_milli, iv_term_micro)
    */
  def woeIvTable(df: DataFrame, idCol: String, score: Column, label: Column,
                 bins: Int = 4): DataFrame = {
    val base = df.select(col(idCol).as("id"), score.cast("long").as("s"),
      label.cast("boolean").as("bad")).persist()
    try {
    val bucketed = graft.ext.CorpusOps.quantileBuckets(base, "id", col("s"), bins)
      .select(col("id"), col("bucket"))
      .join(base, "id")
    val cells = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_bad"))
      .withColumn("n_good", col("n") - col("n_bad"))
    val tot = cells.agg(sum(col("n_good")).as("gg"), sum(col("n_bad")).as("bb"),
      count(lit(1)).as("k"))
    cells.crossJoin(broadcast(tot))
      .withColumn("pg", (col("n_good") + 1L).cast("double")
        / (col("gg") + col("k")).cast("double"))
      .withColumn("pb", (col("n_bad") + 1L).cast("double")
        / (col("bb") + col("k")).cast("double"))
      .select(col("bucket"), col("n"), col("n_bad"),
        round(log(col("pg") / col("pb")) * 1000.0, 0).cast("long")
          .as("woe_milli"),
        round((col("pg") - col("pb")) * log(col("pg") / col("pb"))
          * 1000000.0, 0).cast("long").as("iv_term_micro"))
      .checkpointEager()
    } finally base.unpersist(false)
  }

  /** Post-stratification (g-computation) average treatment effect:
    * within each stratum of an observed covariate, the treated/control
    * mean difference; the ATE is the stratum-size-weighted average —
    * the standardization estimator confounded comparisons need when
    * the covariate drives both assignment and outcome. Exact integer
    * cell sums; each stratum difference and the closing weighted
    * average are shared-shape doubles from exact integers (per-stratum
    * terms micro-rounded before the integer sum — the order-stability
    * discipline).
    *
    * Strata missing either arm drop out (no counterfactual) — their
    * weight is excluded from the denominator, and the output reports
    * how much support survived.
    *
    * @return one row: (n_strata, n_used, n_rows, n_supported,
    *         ate_milli)
    */
  def postStratifiedAte(df: DataFrame, stratumCol: String, treated: Column,
                        cents: Column): DataFrame = {
    val cells = df.select(col(stratumCol).as("s"),
        treated.cast("boolean").as("t"), cents.cast("long").as("c"))
      .groupBy(col("s"), col("t"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
    val wide = cells.groupBy(col("s"))
      .agg(sum(col("n")).as("n_s"),
        sum(when(col("t"), col("n"))).as("n1"),
        sum(when(col("t"), col("sc"))).as("s1"),
        sum(when(!col("t"), col("n"))).as("n0"),
        sum(when(!col("t"), col("sc"))).as("s0"))
    val supported = wide.filter(col("n1").isNotNull && col("n0").isNotNull)
      .withColumn("diff_milli", round(
        (col("s1").cast("double") / col("n1").cast("double")
          - col("s0").cast("double") / col("n0").cast("double"))
        * 10.0, 0).cast("long")) // cents → milli currency units
      .withColumn("w_term", col("diff_milli") * col("n_s"))
    val tot = wide.agg(count(lit(1)).as("n_strata"), sum(col("n_s")).as("n_rows"))
    supported.agg(count(lit(1)).as("n_used"),
        sum(col("n_s")).as("n_supported"), sum(col("w_term")).as("wt"))
      .crossJoin(broadcast(tot))
      .select(col("n_strata"), col("n_used"), col("n_rows"),
        col("n_supported"),
        round(col("wt").cast("double") / col("n_supported").cast("double"), 0)
          .cast("long").as("ate_milli"))
  }

  /** Uplift (Qini) decile table: users ranked by a targeting score into
    * deciles (the engine's two-phase [[graft.ext.CorpusOps
    * .quantileBuckets]]); per decile the treated/control conversion
    * rates, their difference (uplift), and — walking deciles from the
    * highest score down — the cumulative Qini value
    * `cumC1 − cumC0·(cumN1/cumN0)`: the incremental-conversions curve
    * a targeting model is judged by. Exact integer cells; rates, the
    * difference, and the Qini term are shared-shape doubles over exact
    * integers; the closing window runs over the 10-row decile table.
    *
    * @return (bucket, n1, c1, n0, c0, uplift_micro, qini_milli) —
    *         bucket 9 = highest scores
    */
  def upliftDeciles(users: DataFrame, idCol: String, score: Column,
                    treated: Column, converted: Column): DataFrame = {
    val base = users.select(col(idCol).as("uid"), score.as("sc"),
      treated.cast("boolean").as("t"), converted.cast("boolean").as("cv"))
    val buckets = graft.ext.CorpusOps.quantileBuckets(
      base.select(col("uid").as(idCol), col("sc")), idCol, col("sc"), 10)
      .select(col("id").as("uid"), col("bucket"))
    val cells = base.join(buckets, "uid")
      .groupBy(col("bucket"))
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("t") && col("cv"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("n0"),
        sum(when(!col("t") && col("cv"), 1L).otherwise(0L)).as("c0"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cn1", sum(col("n1")).over(wDesc))
      .withColumn("cc1", sum(col("c1")).over(wDesc))
      .withColumn("cn0", sum(col("n0")).over(wDesc))
      .withColumn("cc0", sum(col("c0")).over(wDesc))
      .select(col("bucket"), col("n1"), col("c1"), col("n0"), col("c0"),
        // a decile with an EMPTY arm has undefined uplift — NULL, not a
        // division error (ANSI doubles throw; bit at tiny scale factors
        // where 10 buckets over a handful of users leave arms empty)
        when(col("n1") > 0 && col("n0") > 0,
          round((col("c1").cast("double") / col("n1").cast("double")
            - col("c0").cast("double") / col("n0").cast("double"))
            * 1000000.0, 0).cast("long")).as("uplift_micro"),
        when(col("cn0") > 0,
          round((col("cc1").cast("double") - col("cc0").cast("double")
            * (col("cn1").cast("double") / col("cn0").cast("double")))
            * 1000.0, 0).cast("long")).as("qini_milli"))
  }

  /** Iterative proportional fitting (raking) of a two-way count table
    * to target row/column margins — the survey-weighting step the
    * reference's domain (small-scale fishery surveys) runs before any
    * estimate generalizes: cell weights start at the observed counts
    * (micro units) and alternately scale to match the row then column
    * targets, `iters` full rounds, every scale factor applied through
    * one shared double and micro-rounded so both engines walk
    * identical integers.
    *
    * Bounded state: the weight table is |rows|×|cols| cells and the
    * margins are broadcast; each half-step is one keyed join — no
    * corpus-side work after the initial count aggregation.
    *
    * @param targets (rowKey, colKey) → (rowTargetMicro, colTargetMicro)
    *                as two DataFrames (r, target_micro) and
    *                (c, target_micro)
    * @return (r, c, n, w_micro) — raked weight per cell
    */
  def rake2Way(counts: DataFrame, rowTargets: DataFrame,
               colTargets: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, "iteration budget out of range")
    val init = counts.select(col("r"), col("c"), col("n"),
      (col("n") * 1000000L).as("w"))
    val rt = broadcast(rowTargets.select(col("r"), col("target_micro").as("rt")))
    val ct = broadcast(colTargets.select(col("c"), col("target_micro").as("ct")))
    // checkpoint per iteration: each half-iteration references `cur`
    // TWICE (the marginal-sum aggregate and the join back), so an
    // unchecked fold re-evaluates the base subtree 2^(2·iters) times —
    // at iters=3 that is 64 plans over the upstream count aggregation
    // (probe-measured as the whole cost of q360). The weight table is
    // O(strata²) tiny, so cutting lineage per iteration costs one
    // trivial job each and keeps every iteration's plan O(1).
    // NOTE for the reliable-checkpoint deployment (Exec.CheckpointDirKey
    // set): each iteration leaves one checkpoint directory behind, and
    // the ContextCleaner only reclaims them after the iteration frame is
    // GC'd AND spark.cleaner.referenceTracking.cleanCheckpoints=true
    // (default false). Long-running sessions raking many tables should
    // enable that conf; the local default (localCheckpoint blocks, freed
    // by the Bench/periodic-GC unpersist sweep) needs nothing.
    val raked = (1 to iters).foldLeft(init) { (cur0, _) =>
      val cur = graft.ext.Exec.checkpointEager(cur0)
      val rSums = cur.groupBy(col("r")).agg(sum(col("w")).as("rs"))
      val afterR = cur.join(broadcast(rSums), "r").join(rt, "r")
        .withColumn("w", round(col("w").cast("double")
          * (col("rt").cast("double") / col("rs").cast("double")), 0)
          .cast("long"))
        .select(col("r"), col("c"), col("n"), col("w"))
      val cSums = afterR.groupBy(col("c")).agg(sum(col("w")).as("cs"))
      afterR.join(broadcast(cSums), "c").join(ct, "c")
        .withColumn("w", round(col("w").cast("double")
          * (col("ct").cast("double") / col("cs").cast("double")), 0)
          .cast("long"))
        .select(col("r"), col("c"), col("n"), col("w"))
    }
    raked.select(col("r"), col("c"), col("n"), col("w").as("w_micro"))
  }

  /** Inverse-propensity-weighted (Hájek) ATE with a MODEL-based
    * propensity: the treatment probability comes from the in-engine
    * logistic trainer ([[graft.ext.LinearModel.logisticGd]]) over
    * micro-int unit features, scored back per unit through the
    * identical fixed-point sigmoid — the estimator a causal pipeline
    * uses when strata are too fine for [[postStratifiedAte]].
    *
    * Weights are milli ints `round(1e9 / p_micro)` (treated) /
    * `round(1e9 / (1e6 − p_micro))` (control) with the propensity
    * clipped to `[clipMicro, 1e6 − clipMicro]` first (standard overlap
    * trimming; also bounds w ≤ 1e6/clip so w·y integer sums stay far
    * inside signed-64). Hájek arm means `Σw·y / Σw` are the closing
    * shared-shape double.
    *
    * Scale shape: training is one partial-aggregated scan per epoch
    * with a k+1-scalar broadcast model; scoring + both arm sums are
    * ONE more aggregate over the unit table. Nothing iterates on the
    * driver, nothing shuffles the units by key.
    *
    * @param features micro-int feature columns (bias added inside)
    * @param outcome  integer outcome per unit (0/1 or small counts)
    * @return one row: (n, n1, n0, mu1_micro, mu0_micro, ate_micro)
    */
  def ipwAteLogistic(units: DataFrame, features: Seq[Column],
      treated: Column, outcome: Column, epochs: Int = 3,
      clipMicro: Long = 50000L): DataFrame = {
    require(clipMicro > 0 && clipMicro < 500000L, "clip in (0, 0.5) micro")
    val k = features.size
    val feats = units.select(
      (features.zipWithIndex.map { case (f, i) => f.as(s"x$i") } :+
        when(treated, 1L).otherwise(0L).as("t") :+
        outcome.cast("long").as("yo")): _*)
      .checkpointEager()
    val wFinal = graft.ext.LinearModel.logisticGd(feats,
        (0 until k).map(i => col(s"x$i")), col("t") === 1L, epochs)
      .filter(col("epoch") === epochs.toLong)
      .select((0 to k).map(i => col(s"w$i")): _*)
    // identical fixed-point score/sigmoid shapes as the trainer
    val dot = (0 until k).map(i => col(s"w${i + 1}").cast("double") *
      col(s"x$i").cast("double")).reduceOption(_ + _).getOrElse(lit(0.0))
    val score = col("w0") + round(dot / 1000000.0, 0).cast("long")
    val p = round(lit(1000000.0)
      / (lit(1.0) + exp(-score.cast("double") / 1000000.0)), 0).cast("long")
    val scored = feats.crossJoin(broadcast(wFinal))
      .withColumn("pc", least(greatest(p, lit(clipMicro)),
        lit(1000000L - clipMicro)))
      .withColumn("w", when(col("t") === 1L,
          round(lit(1000000000.0) / col("pc").cast("double"), 0).cast("long"))
        .otherwise(round(lit(1000000000.0)
          / (lit(1000000L) - col("pc")).cast("double"), 0).cast("long")))
    def armSum(t: Int, e: Column, n: String) =
      sum(when(col("t") === t.toLong, e).otherwise(0L)).as(n)
    scored.agg(count(lit(1)).as("n"),
        armSum(1, lit(1L), "n1"), armSum(0, lit(1L), "n0"),
        armSum(1, col("w"), "sw1"), armSum(0, col("w"), "sw0"),
        armSum(1, col("w") * col("yo"), "swy1"),
        armSum(0, col("w") * col("yo"), "swy0"))
      .select(col("n"), col("n1"), col("n0"),
        round(col("swy1").cast("double") * 1000000.0
          / col("sw1").cast("double"), 0).cast("long").as("mu1_micro"),
        round(col("swy0").cast("double") * 1000000.0
          / col("sw0").cast("double"), 0).cast("long").as("mu0_micro"))
      .withColumn("ate_micro", col("mu1_micro") - col("mu0_micro"))
  }
}
