package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics computed with exact integer arithmetic so the
  * cross-engine oracle reproduces them bit-for-bit: tie-aware ROC AUC via
  * the Mann–Whitney pair count (no per-row ranks), and reliability
  * (calibration) bins.
  *
  * Mirrors the reference's validation scoring (flag rates per submission
  * in R/validation.R) lifted to the classifier-evaluation shape an LLM
  * data pipeline needs for quality-filter models.
  *
  * Scale posture: both operators first collapse the corpus to per-score
  * (or per-bin) counts with an ordinary hash aggregation — the only
  * shuffles that touch all rows. The windows that follow run over the
  * aggregated score table, whose cardinality is bounded by the score
  * DOMAIN (micro scores ⊂ [-1e6, 1e6], so ≤ 2e6+1 rows regardless of
  * corpus size) — the same bounded-small-table argument as the HLL
  * register fold, not a global window over data.
  */
object Eval {

  /** One-vs-rest ROC AUC per label over an integer score column.
    *
    * Tie-aware Mann–Whitney formulation on grouped counts: for each
    * distinct score `s` (ascending) and label `L`, with `cnt` = rows of
    * `L` at `s`, `tot` = all rows at `s`, `negBefore` = non-`L` rows at
    * strictly lower scores, the doubled win count is
    * `wins2 = Σ cnt · (2·negBefore + (tot − cnt))` — ties count half,
    * kept integral by the doubling. `AUC = wins2 / (2·P·N)`, reported in
    * micro-units through the shared double shape.
    *
    * All labels are evaluated in one pass: per-label cumulatives come
    * from a label-partitioned window, the all-rows cumulative from one
    * window over the bounded per-score table, and `negBefore` is their
    * difference.
    */
  def aucOneVsRest(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val scored = df.select(col(scoreCol).as("s"), col(labelCol).as("lbl"))
    val perScore = scored.groupBy(col("s")).agg(count(lit(1)).as("tot"))
    val byLabel = scored.groupBy(col("s"), col("lbl")).agg(count(lit(1)).as("cnt"))

    val allBefore = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = perScore.select(col("s"), col("tot"),
      coalesce(sum(col("tot")).over(allBefore), lit(0L)).as("all_before"))

    val lblBefore = Window.partitionBy(col("lbl")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cells = byLabel
      .withColumn("lbl_before", coalesce(sum(col("cnt")).over(lblBefore), lit(0L)))
      .join(totals, "s")
      .withColumn("neg_before", col("all_before") - col("lbl_before"))
      .withColumn("wins2",
        col("cnt") * (lit(2L) * col("neg_before") + (col("tot") - col("cnt"))))

    val perLabel = cells.groupBy(col("lbl").as("label"))
      .agg(sum(col("cnt")).as("n_pos"), sum(col("wins2")).as("wins2"))
    val overAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perLabel
      .withColumn("n_neg", sum(col("n_pos")).over(overAll) - col("n_pos"))
      .select(col("label"), col("n_pos"), col("n_neg"),
        // n_neg = 0 (only one label present) is 0/0: guard to null
        // instead of letting the NaN cast to a misleading 0
        when(col("n_neg") > 0,
          round(col("wins2").cast("double") * 1000000.0 /
            (lit(2.0) * col("n_pos") * col("n_neg"))).cast("long"))
          .as("auc_micro"))
  }

  /** Per-group simple linear regression (OLS) from exact integer
    * moments: slope, intercept, and R² of `y ~ x` per group, where x
    * and y are long-integer columns. The five moments accumulate as
    * decimal(38,0) — exact, order-independent under distributed partial
    * aggregation (the q123 correlation discipline) — and the three
    * outputs are shared-shape double expressions rounded to 4 decimals
    * (`+ 0.0` collapses negative zero: slopes go negative).
    *
    * One hash aggregation over the data; everything after runs on the
    * one-row-per-group moment table. Degenerate groups (constant x)
    * yield null slope/intercept/R²; constant y yields R² = null.
    */
  def olsByGroup(df: DataFrame, grpCol: String, xCol: String, yCol: String): DataFrame = {
    import graft.core.Exact.r4
    val m = df.select(col(grpCol).as("grp"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val varx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vary = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    m.select(col("grp"), col("n"),
      when(varx =!= 0.0, r4(cov / varx)).as("slope"),
      when(varx =!= 0.0,
        r4((col("sy").cast("double") - cov / varx * col("sx").cast("double")) / nD))
        .as("intercept"),
      when(varx =!= 0.0 && vary =!= 0.0, r4(cov * cov / (varx * vary))).as("r2"))
  }

  /** Reliability-diagram bins for a micro-unit probability column
    * (`probMicro` ∈ [0, 1e6]): equal-width bins, per-bin support, mean
    * predicted probability, and empirical positive rate — predicted vs
    * empirical is the calibration gap. Integer bin index (`p·bins div
    * 1e6`, clamped so p = 1.0 lands in the last bin), exact long sums,
    * micro rounding through the shared double shape.
    */
  def calibrationBins(df: DataFrame, probMicroCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    // the column name is spliced into SQL text (integer div has no
    // Column-DSL form) — validate it like Expectations.audit does
    require(probMicroCol.matches("[A-Za-z0-9_]+"),
      s"probMicroCol must be a bare identifier, got '$probMicroCol'")
    df.select(
        // clamp BOTH edges: an out-of-range p (< 0 or > 1e6) from a
        // sloppy upstream map must not mint phantom bins
        least(greatest(expr(s"$probMicroCol * $bins div 1000000"), lit(0L)),
          lit(bins - 1L)).as("bin"),
        col(probMicroCol).as("p"), col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"), sum(col("p")).as("sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sp").cast("double") / col("n")).cast("long").as("mean_pred_micro"),
        round(col("n_pos").cast("double") * 1000000.0 / col("n")).cast("long")
          .as("emp_rate_micro"))
  }

  /** Pearson chi-squared independence cells for two categorical
    * columns — the "did the label mix drift across segments?" test
    * behind A/B checks and stratification audits. Emits one row per
    * observed (row, col) cell with the observed count, expected count,
    * and the cell's chi-squared contribution; the caller sums
    * `contrib_micro` (an exact INTEGER sum of already-rounded
    * micro-units — deterministic in any engine, unlike a double sum
    * whose partial order varies) for the statistic.
    *
    * Exactness: with T = total, R = row total, C = col total, O =
    * observed, the contribution is `(O·T − R·C)² / (T·R·C)` — numerator
    * and denominator are exact 64-bit integers (T ≤ ~3e6 with
    * type²-cardinality cells keeps O·T ≤ ~9e12 and T·R·C well under
    * 2^63 for the intended label/segment cardinalities), one
    * shared-shape double division, micro-rounded.
    *
    * Scale shape: one groupBy over the fact table (partial-combining);
    * everything after operates on the type²-cardinality cells table —
    * windows over it are bounded by construction.
    */
  def chiSquareCells(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val wr = Window.partitionBy(col("r"))
    val wc = Window.partitionBy(col("c"))
    val wt = Window.partitionBy()
    cells
      .withColumn("rt", sum(col("o")).over(wr))
      .withColumn("ct", sum(col("o")).over(wc))
      .withColumn("t", sum(col("o")).over(wt))
      .withColumn("e_micro",
        round(col("rt").cast("double") * col("ct").cast("double") * 1000000.0
          / col("t").cast("double"), 0).cast("long"))
      .withColumn("d", col("o") * col("t") - col("rt") * col("ct"))
      .withColumn("contrib_micro",
        round(col("d").cast("double") * col("d").cast("double") * 1000000.0
          / (col("t") * col("rt") * col("ct")).cast("double"), 0).cast("long"))
      .select(col("r"), col("c"), col("o"), col("e_micro"), col("contrib_micro"))
  }

  /** Welch's unequal-variance t statistic per group between two
    * variants (the A/B-test workhorse) — from exact integer sufficient
    * statistics only: per (group, variant) one partial-combining
    * groupBy collects (n, Σx, Σx²) in integer cents; the statistic
    * `t = (m₀ − m₁) / √(v₀/n₀ + v₁/n₁)` (sample variances
    * `v = (n·Σx² − (Σx)²) / (n·(n−1))`) is then ONE shared-shape double
    * expression over those six integers, micro-rounded — the
    * [[chiSquareCells]] discipline, so both engines agree exactly.
    * Groups missing a variant, or with n < 2 on either side, or with
    * two exactly-constant samples (zero pooled standard error) are
    * dropped.
    *
    * @param variantCol must take exactly the values 0 and 1
    * @param centsCol   integer fixed-point metric
    * @return (grp, n0, n1, mean_diff_micro, t_micro)
    */
  /** Theil–Sen robust slope per group — the median of all pairwise
    * slopes `(y₂−y₁)/(x₂−x₁)` over x-distinct point pairs: up to ~29%
    * of wild outliers cannot move it (the breakdown point OLS lacks;
    * contrast [[olsByGroup]]). Each pair slope is ONE shared-shape
    * double micro-rounded (the difference can be negative, so the
    * `round(CAST AS DOUBLE)` form, never integer div); the median is
    * then the EXACT lower-middle element by rank — deterministic in
    * any engine, no interpolation.
    *
    * Scale shape: the pair table is quadratic in each group's POINT
    * count, so feed it pre-aggregated series (daily rollups: 2 years →
    * ~260k pairs/group); the rank is a per-group window over that
    * bounded pair table. Groups need ≥ 2 distinct x.
    *
    * @return (grp, n_pairs, slope_micro)
    */
  def theilSen(df: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val pairs = base.as("a")
      .join(base.as("b"),
        col("a.grp") === col("b.grp") && col("a.x") < col("b.x"))
      .select(col("a.grp").as("grp"), col("a.x").as("x1"),
        col("b.x").as("x2"),
        round((col("b.y") - col("a.y")).cast("double") * 1000000.0
          / (col("b.x") - col("a.x")).cast("double"), 0).cast("long")
          .as("slope_micro"))
    val w = Window.partitionBy(col("grp"))
    val byS = Window.partitionBy(col("grp"))
      .orderBy(col("slope_micro"), col("x1"), col("x2"))
    pairs
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(byS).cast("long"))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("grp"), col("cnt").as("n_pairs"), col("slope_micro"))
  }

  /** Spearman rank correlation per group — the monotonic-association
    * complement to [[olsByGroup]]'s linear fit, exact under ties:
    * midranks kept in DOUBLED integer units (the [[mannWhitneyU]]
    * discipline — `rank2 = 2·prev + m + 1` per tied value-cell), so
    * every rank and rank moment is an exact integer; ρ is Pearson on
    * the rank2 values, closed with ONE shared-double combination
    * `(n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)(n·Syy − Sy²))` (the linearCka
    * shape — the centered products grow as n³ and would wrap signed-64
    * near n ≈ 1.3M rows per group; the moments themselves stay exact
    * well past that).
    *
    * Scale shape: ranks come from prefix-sum windows over the
    * per-(group, value) CELL tables (bounded by distinct values per
    * group), never a per-row rank window.
    *
    * @return (grp, n, rho_micro) — groups with zero variance on either
    *         axis yield null rho
    */
  def spearmanByGroup(df: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    def rank2(v: String): DataFrame = {
      val w = Window.partitionBy(col("grp")).orderBy(col(v))
      base.groupBy(col("grp"), col(v)).agg(count(lit(1)).as("m"))
        .withColumn("cum", sum(col("m")).over(w))
        .select(col("grp"), col(v),
          (lit(2L) * (col("cum") - col("m")) + col("m") + 1L).as(s"r_$v"))
    }
    val ranked = base.join(rank2("x"), Seq("grp", "x"))
      .join(rank2("y"), Seq("grp", "y"))
    val mom = ranked.groupBy(col("grp")).agg(count(lit(1)).as("n"),
      sum(col("r_x")).as("sx"), sum(col("r_y")).as("sy"),
      sum(col("r_x") * col("r_x")).as("sxx"),
      sum(col("r_x") * col("r_y")).as("sxy"),
      sum(col("r_y") * col("r_y")).as("syy"))
    val nD = col("n").cast("double")
    def cen(sab: Column, sa: Column, sb: Column) =
      nD * sab.cast("double") - sa.cast("double") * sb.cast("double")
    mom.select(col("grp"), col("n"),
      when(cen(col("sxx"), col("sx"), col("sx")) > 0.0
          && cen(col("syy"), col("sy"), col("sy")) > 0.0,
        round(cen(col("sxy"), col("sx"), col("sy"))
          / sqrt(cen(col("sxx"), col("sx"), col("sx"))
            * cen(col("syy"), col("sy"), col("sy")))
          * 1000000.0, 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("rho_micro"))
  }

  /** Wald SPRT over an ordered Bernoulli stream per variant — the A/B
    * early-stopping monitor: after each observation the cumulative
    * log-likelihood ratio `Λ_n = a·k_n + b·(n−k_n)` (k = conversions
    * so far; `a = ln(p1/p0) > 0`, `b = ln((1−p1)/(1−p0)) < 0`,
    * micro-ints) is tested against `A = ln((1−β)/α)` (accept H1) and
    * `B = ln(β/(1−α))` (accept H0); the decision is the FIRST
    * crossing.
    *
    * Scale shape: no per-variant global scan. Λ only rises AT a
    * conversion and falls linearly between them, so every crossing is
    * computable from the CONVERSION-ROW table alone: observation ranks
    * come from [[Ranks.twoPhaseRank]] (full stream and conversion
    * subset), run boundaries from an equi-join on (variant, k+1) — no
    * window touches the raw stream. Upper candidates are conversion
    * rows with Λ ≥ A; lower candidates close each run at
    * `r + ceil((Λ_run − B)/(−b))` when that lands inside the run.
    *
    * @return (variant, n_obs, n_conv, decision, decide_at, llr_micro)
    *         — decision ∈ {h1, h0, continue}; decide_at null when
    *         continuing; llr_micro = Λ at decide_at (or at n_obs)
    */
  def sprtDecision(df: DataFrame, variantCol: String,
      orderCols: Seq[String], conv: Column, p0Micro: Long, p1Micro: Long,
      alphaMilli: Long, betaMilli: Long): DataFrame = {
    require(0 < p0Micro && p0Micro < p1Micro && p1Micro < 1000000L,
      "need 0 < p0 < p1 < 1")
    val a = math.round(math.log(p1Micro.toDouble / p0Micro.toDouble) * 1e6)
    val b = math.round(math.log(
      (1e6 - p1Micro) / (1e6 - p0Micro)) * 1e6) // negative
    val bigA = math.round(math.log(
      (1000.0 - betaMilli) / alphaMilli) * 1e6)
    val bigB = math.round(math.log(
      betaMilli / (1000.0 - alphaMilli)) * 1e6)
    val base = df.select((col(variantCol).as("variant") +:
      orderCols.map(col)) :+ conv.as("cv"): _*)
    val ranked = Ranks.twoPhaseRank(base, "variant", orderCols, "r")
    val convRanked = Ranks.twoPhaseRank(
      ranked.filter(col("cv")), "variant", orderCols, "k")
      .select(col("variant"), col("k"), col("r"))
    val totals = ranked.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("cv"), 1L).otherwise(0L)).as("n_conv"))
    // virtual run start before the first conversion: (k=0, r=0)
    val runs = convRanked.unionByName(
        totals.select(col("variant"), lit(0L).as("k"), lit(0L).as("r")))
      .join(totals.select(col("variant"), col("n_obs")), "variant")
      .withColumn("llr_at", lit(a) * col("k") + lit(b) * (col("r") - col("k")))
    val nextR = runs.select(col("variant"), (col("k") - 1L).as("k"),
      col("r").as("r_next"))
    val withNext = runs.join(nextR, Seq("variant", "k"), "left")
      .withColumn("run_end", coalesce(col("r_next") - 1L, col("n_obs")))
    val upper = withNext.filter(col("k") > 0L && col("llr_at") >= bigA)
      .select(col("variant"), col("r").as("pos"), lit("h1").as("side"),
        col("llr_at").as("llr"))
    // lower: Λ(r + m) = llr_at + b·m ≤ B at m = ceil((llr_at − B)/(−b))
    val m = greatest(lit(1L),
      expr(s"cast((llr_at + ${-bigB}L + ${-b - 1}L) div ${-b}L as bigint)"))
    val lower = withNext
      .withColumn("pos", col("r") + m)
      .filter(col("pos") <= col("run_end"))
      .select(col("variant"), col("pos"), lit("h0").as("side"),
        (col("llr_at") + lit(b) * m).as("llr"))
    val cands = upper.unionByName(lower)
    val first = cands.groupBy(col("variant"))
      .agg(min_by(struct(col("side"), col("pos"), col("llr")),
        struct(col("pos"), col("side"))).as("f"))
    totals.join(first, Seq("variant"), "left")
      .select(col("variant"), col("n_obs"), col("n_conv"),
        coalesce(col("f.side"), lit("continue")).as("decision"),
        col("f.pos").as("decide_at"),
        coalesce(col("f.llr"),
          lit(a) * col("n_conv") + lit(b) * (col("n_obs") - col("n_conv")))
          .as("llr_micro"))
  }

  /** Winsorized and trimmed means per group at a symmetric tail
    * fraction — the robust location estimates a metric pipeline
    * publishes next to the raw mean when outliers are routine. With
    * `k = floor(q·n)` rows clipped per tail: trimmed = mean of the
    * middle ranks; winsorized = middle sum + k·(lower boundary value)
    * + k·(upper boundary value), all exact integers until the one
    * shared division. Ranks come from [[Ranks.twoPhaseRank]] (never a
    * per-group global window); ties order by the unique tie-break but
    * any tie permutation leaves every sum unchanged.
    *
    * @param qMilli tail fraction in milli (50 = 5% per tail)
    * @return (grp, n, k_tail, mean_milli, trimmed_milli, winsor_milli)
    */
  def robustMeans(df: DataFrame, grpCol: String, centsCol: String,
      tieBreakCol: String, qMilli: Long = 50L): DataFrame = {
    require(qMilli >= 1 && qMilli < 500, "tail fraction out of range")
    val base = df.select(col(grpCol).as("grp"),
      col(centsCol).cast("long").as("v"),
      col(tieBreakCol).cast("long").as("tb"))
    val ranked = Ranks.twoPhaseRank(base, "grp", Seq("v", "tb"), "r")
    val nTab = ranked.groupBy(col("grp")).agg(count(lit(1)).as("n"),
      sum(col("v")).as("sv"))
      .withColumn("k", expr(s"(n * $qMilli) div 1000"))
    val j = ranked.join(nTab, "grp")
    val mids = j.filter(col("r") > col("k") && col("r") <= col("n") - col("k"))
      .groupBy(col("grp")).agg(sum(col("v")).as("mid_sum"),
        count(lit(1)).as("mid_n"))
    val lo = j.filter(col("r") === col("k") + 1L)
      .select(col("grp"), col("v").as("v_lo"))
    val hi = j.filter(col("r") === col("n") - col("k"))
      .select(col("grp"), col("v").as("v_hi"))
    nTab.join(mids, "grp").join(lo, "grp").join(hi, "grp")
      .select(col("grp"), col("n"), col("k").as("k_tail"),
        round(col("sv").cast("double") * 1000.0
          / col("n").cast("double"), 0).cast("long").as("mean_milli"),
        round(col("mid_sum").cast("double") * 1000.0
          / col("mid_n").cast("double"), 0).cast("long").as("trimmed_milli"),
        round((col("mid_sum") + col("k") * col("v_lo")
          + col("k") * col("v_hi")).cast("double") * 1000.0
          / col("n").cast("double"), 0).cast("long").as("winsor_milli"))
  }

  /** Empirical-Bayes shrinkage of per-key Bernoulli rates toward the
    * pooled mean — the "small accounts get the prior, big accounts get
    * their data" estimator every per-user/per-domain rate table needs
    * before ranking on it. Method-of-moments beta prior: pooled mean
    * `m = Σk/Σn`, between-key weighted rate variance `s²` (per-key
    * terms `n·(k/n − m)²` micro-rounded BEFORE the sum — a raw double
    * sum would be partition-order-dependent), prior strength
    * `ν = max(1, m(1−m)/s² − 1)`; shrunken rate
    * `(k + m·ν)/(n + ν)`. All three scalars are shared-shape doubles
    * from exact integer moments.
    *
    * @return (key, n, k, raw_micro, shrunk_micro) one row per key
    */
  def ebShrunkRates(df: DataFrame, keyCol: String, conv: Column): DataFrame = {
    val per = df.select(col(keyCol).as("key"), conv.as("cv"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cv"), 1L).otherwise(0L)).as("k"))
    val pooled = per.agg(sum(col("n")).as("tn"), sum(col("k")).as("tk"))
    val mExpr = col("tk").cast("double") / col("tn").cast("double")
    val withM = per.crossJoin(broadcast(pooled))
      .withColumn("m", mExpr)
      .withColumn("t_micro", round(col("n").cast("double")
        * (col("k").cast("double") / col("n").cast("double") - col("m"))
        * (col("k").cast("double") / col("n").cast("double") - col("m"))
        * 1000000.0, 0).cast("long"))
    val s2 = withM.agg(sum(col("t_micro")).as("ts"))
    withM.crossJoin(broadcast(s2))
      .withColumn("s2", col("ts").cast("double") / 1000000.0
        / col("tn").cast("double"))
      .withColumn("nu", greatest(lit(1.0),
        col("m") * (lit(1.0) - col("m")) / col("s2") - 1.0))
      .select(col("key"), col("n"), col("k"),
        round(col("k").cast("double") * 1000000.0
          / col("n").cast("double"), 0).cast("long").as("raw_micro"),
        round((col("k").cast("double") + col("m") * col("nu"))
          / (col("n").cast("double") + col("nu")) * 1000000.0, 0)
          .cast("long").as("shrunk_micro"))
  }

  /** Kendall τ-b per group — the concordance reading of monotonic
    * association (and, with x = time, the Mann–Kendall trend
    * statistic): `τ_b = (C − D) / √((n₀−n₁)(n₀−n₂))` with C−D the
    * exact integer sum of `sign((x_j−x_i)(y_j−y_i))` over unordered
    * pairs and n₁/n₂ the x-/y-tie pair counts.
    *
    * Scale shape: the pair table is quadratic in each group's point
    * count BY DESIGN (the [[theilSen]] contract) — feed it
    * pre-aggregated series (monthly rollups), never raw facts.
    * `tieBreakCol` must be a total order within each group (for a
    * time series, the time axis itself).
    *
    * @return (grp, n, cd, tau_micro) — cd = C − D exact; groups where
    *         either axis is all ties yield null tau
    */
  def kendallTauB(df: DataFrame, grpCol: String, xCol: String,
      yCol: String, tieBreakCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
      col(tieBreakCol).cast("long").as("tb"))
    val pairs = base.as("a")
      .join(base.as("b"),
        col("a.grp") === col("b.grp") && col("a.tb") < col("b.tb"))
      .select(col("a.grp").as("grp"),
        (signum((col("b.x") - col("a.x")).cast("double"))
          * signum((col("b.y") - col("a.y")).cast("double")))
          .cast("long").as("s"))
    val cd = pairs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n0"), sum(col("s")).as("cd"))
    def tiePairs(v: String) = base.groupBy(col("grp"), col(v))
      .agg(count(lit(1)).as("m"))
      .groupBy(col("grp"))
      .agg((sum(col("m") * (col("m") - 1L)) / 2L).cast("long").as(s"t_$v"))
    val nRows = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    nRows.join(cd, "grp").join(tiePairs("x"), "grp").join(tiePairs("y"), "grp")
      .select(col("grp"), col("n"), col("cd"),
        when(col("n0") - col("t_x") > 0L && col("n0") - col("t_y") > 0L,
          round(col("cd").cast("double")
            / sqrt((col("n0") - col("t_x")).cast("double")
              * (col("n0") - col("t_y")).cast("double")) * 1000000.0, 0)
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("tau_micro"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) per group between two variants
    * — the nonparametric complement to [[welchT]], exact under ties:
    * ranks are midranks kept in DOUBLED integer units (`rank2 =
    * 2·midrank = 2·prev + m + 1` per tied value-cell, where `prev` is
    * the count of strictly-smaller observations and `m` the tie size),
    * so `U2 = 2·U = Σ m₁·rank2 − n₁(n₁+1)` is an exact integer in any
    * engine. The normal-approximation z uses the tie-corrected
    * variance `σ² = (n₀n₁/12)·((N+1) − Σ(t³−t)/(N(N−1)))` — one
    * shared-shape double from five exact integers, micro-rounded.
    *
    * Scale shape: ONE fact-table groupBy to (grp, value) tie-cells —
    * ranks come from a prefix-sum window over the CELL table (bounded
    * by distinct values), never a per-row rank; groups that are all
    * ties (zero variance) or single-variant are dropped.
    *
    * @return (grp, n0, n1, u2, z_micro) — u2 = 2·U of variant 1
    */
  def mannWhitneyU(df: DataFrame, grpCol: String, variantCol: String,
      centsCol: String): DataFrame = {
    val cells = df
      .groupBy(col(grpCol).as("grp"), col(centsCol).cast("long").as("x"))
      .agg(count(lit(1)).as("m"),
        sum(when(col(variantCol).cast("int") === 1, 1L).otherwise(0L))
          .as("m1"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("prev", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("rank2", lit(2L) * col("prev") + col("m") + lit(1L))
    ranked.groupBy(col("grp"))
      .agg(sum(col("m")).as("nn"), sum(col("m1")).as("n1"),
        sum(col("m1") * col("rank2")).as("r1_2"),
        sum(col("m") * col("m") * col("m") - col("m")).as("tsum"))
      .withColumn("n0", col("nn") - col("n1"))
      .filter(col("n0") > 0 && col("n1") > 0 &&
        col("tsum") < col("nn") * col("nn") * col("nn") - col("nn"))
      .withColumn("u2", col("r1_2") - col("n1") * (col("n1") + lit(1L)))
      .withColumn("z_micro",
        round((col("u2") - col("n0") * col("n1")).cast("double") * 1000000.0
          / (lit(2.0) * sqrt(
            col("n0").cast("double") * col("n1").cast("double") / 12.0
              * ((col("nn") + lit(1L)).cast("double")
                - col("tsum").cast("double")
                  / (col("nn").cast("double")
                    * (col("nn") - lit(1L)).cast("double"))))), 0)
          .cast("long"))
      .select(col("grp"), col("n0"), col("n1"), col("u2"), col("z_micro"))
  }

  /** Deterministic m-of-n bootstrap confidence interval for a per-group
    * mean — the uncertainty band a data-quality dashboard needs without
    * any RNG state: resample draws are indexed by
    * `polyHash(grp:b:j) mod n` (engine-portable, replayable by any SQL
    * engine), so the whole procedure is a pure function of the data.
    *
    *  - rows are ranked once per group by (value, tiebreak) — draw
    *    index i selects the i-th ranked row;
    *  - `reps` resamples of `min(m, n)` draws each; a resample mean is
    *    an EXACT integer micro (`sum·1e6 div m_eff` — no double
    *    accumulation);
    *  - the CI is exact order statistics over the `reps` means
    *    (ranks ceil(α·reps) and ceil((1−α)·reps), ties by rep id).
    *
    * Scale shape: draws are `groups × reps × m` rows joined back on
    * (grp, rank) — linear, bounded by the sampling budget, never by
    * group size; the per-group rank window is the only group-sized
    * sort. m-of-n (m ≪ n) is the documented lever at web scale.
    *
    * @return (grp, n, m_eff, reps, mean_micro, lo_micro, hi_micro)
    */
  def bootstrapMeanCi(df: DataFrame, grpCol: String, centsCol: String,
      tieCol: String, reps: Int, m: Int, alphaMilli: Int = 25): DataFrame = {
    require(reps >= 2 && m >= 1, "need reps >= 2 and m >= 1")
    require(alphaMilli > 0 && alphaMilli < 500, "alpha in (0, 0.5) per mille")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(grpCol).as("grp"),
      col(centsCol).cast("long").as("x"), col(tieCol).as("tb"))
    val ranked = base.withColumn("i",
      row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("x"), col("tb"))).cast("long") - 1L)
    val stats = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .withColumn("m_eff", least(lit(m.toLong), col("n")))
    val draws = stats.select(col("grp"), col("n"), col("m_eff"))
      .withColumn("b", explode(sequence(lit(1), lit(reps))))
      .withColumn("j", explode(sequence(lit(0L), col("m_eff") - 1L)))
      .withColumn("i", pmod(graft.functions.PolyHash.polyHash(
        concat_ws(":", col("grp"), col("b"), col("j"))), col("n")))
    val means = draws
      .join(ranked.select(col("grp"), col("i"), col("x")), Seq("grp", "i"))
      .groupBy(col("grp"), col("b"), col("m_eff"))
      .agg(sum(col("x")).as("sb"))
      .withColumn("mean_b", expr("sb * 1000000 div m_eff"))
    val loRank = (alphaMilli * reps + 999) / 1000
    val hiRank = ((1000 - alphaMilli) * reps + 999) / 1000
    val byMean = Window.partitionBy(col("grp"))
      .orderBy(col("mean_b"), col("b"))
    val ci = means
      .withColumn("rn", row_number().over(byMean))
      .filter(col("rn") === loRank || col("rn") === hiRank)
      .groupBy(col("grp"))
      .agg(min(when(col("rn") === loRank, col("mean_b"))).as("lo_micro"),
        min(when(col("rn") === hiRank, col("mean_b"))).as("hi_micro"))
    stats.join(ci, "grp")
      .select(col("grp"), col("n"), col("m_eff"), lit(reps.toLong).as("reps"),
        expr("sx * 1000000 div n").as("mean_micro"),
        col("lo_micro"), col("hi_micro"))
  }

  /** Deterministic randomization test for a variant effect on a
    * per-group mean — the nonparametric "is this A/B difference real"
    * complement to [[bootstrapMeanCi]], with the same no-RNG
    * discipline: permuted labels come from `polyHash(grp:p:key) mod 2`
    * (unconditional Bernoulli reassignment), so any engine replays the
    * full null distribution. The statistic is |mean1 − mean0| in
    * micro through the q207 shared double shape; the p-value is the
    * add-one-smoothed exceedance rate in exact integer milli.
    *
    * Scale shape: `perms` copies of each row feed ONE
    * partial-combining groupBy down to groups × perms × 2 cells — no
    * sort, no join on the fact table; volume is perms·|facts| rows
    * through a map-side-combined hash aggregate.
    *
    * @return (grp, n0, n1, obs_diff_micro, n_perms, n_ge, p_milli)
    */
  def randomizationTestMicro(df: DataFrame, grpCol: String, variantCol: String,
      keyCol: String, centsCol: String, perms: Int): DataFrame = {
    require(perms >= 1, "need perms >= 1")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(grpCol).as("grp"),
      col(variantCol).cast("int").as("v"),
      col(keyCol).cast("string").as("k"), col(centsCol).cast("long").as("x"))
    def sideAggs(vCol: Column) = Seq(
      sum(when(vCol === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(vCol === 1, col("x")).otherwise(0L)).as("s1"),
      sum(when(vCol === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(vCol === 0, col("x")).otherwise(0L)).as("s0"))
    def diffMicro: Column =
      abs(round((col("s1").cast("double") / col("n1").cast("double")
        - col("s0").cast("double") / col("n0").cast("double")) * 1000000.0, 0)
        .cast("long"))
    val obs = base.groupBy(col("grp"))
      .agg(sideAggs(col("v")).head, sideAggs(col("v")).tail: _*)
      .filter(col("n0") > 0 && col("n1") > 0)
      .select(col("grp"), col("n0"), col("n1"), diffMicro.as("obs"))
    val perm = base
      .withColumn("p", explode(sequence(lit(1), lit(perms))))
      .withColumn("vp", pmod(graft.functions.PolyHash.polyHash(
        concat_ws(":", col("grp"), col("p"), col("k"))), lit(2L)).cast("int"))
    val pd = perm.groupBy(col("grp"), col("p"))
      .agg(sideAggs(col("vp")).head, sideAggs(col("vp")).tail: _*)
      .filter(col("n0") > 0 && col("n1") > 0)
      .select(col("grp"), diffMicro.as("d"))
    obs.join(pd, "grp")
      .groupBy(col("grp"), col("n0"), col("n1"), col("obs"))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(col("d") >= col("obs"), 1L).otherwise(0L)).as("n_ge"))
      .select(col("grp"), col("n0"), col("n1"),
        col("obs").as("obs_diff_micro"), col("n_perms"), col("n_ge"),
        expr("(1 + n_ge) * 1000 div (n_perms + 1)").as("p_milli"))
  }

  /** K-variant one-vs-rest Mann–Whitney U: [[mannWhitneyU]]'s exact
    * doubled-midrank machinery run for EVERY variant against the rest
    * (the `aucOneVsRest` shape — closes the "sides fixed at {0,1}"
    * debt). The tie-cell table and its prefix-sum ranks are computed
    * ONCE per group; each variant then reuses them through one
    * (grp, value)-keyed join — cost is cells + cells×variants rows,
    * never per-row ranks, never a per-variant rescan of the facts.
    *
    * @return (grp, variant, n0, n1, u2, z_micro) — u2 = 2·U of the
    *         variant side vs the rest
    */
  def mannWhitneyOneVsRest(df: DataFrame, grpCol: String, variantCol: String,
      centsCol: String): DataFrame = {
    val totals = df
      .groupBy(col(grpCol).as("grp"), col(centsCol).cast("long").as("x"))
      .agg(count(lit(1)).as("m"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = totals
      .withColumn("prev", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("rank2", lit(2L) * col("prev") + col("m") + lit(1L))
    val grpStats = ranked.groupBy(col("grp"))
      .agg(sum(col("m")).as("nn"),
        sum(col("m") * col("m") * col("m") - col("m")).as("tsum"))
    val vcells = df
      .groupBy(col(grpCol).as("grp"),
        col(variantCol).cast("long").as("variant"),
        col(centsCol).cast("long").as("x"))
      .agg(count(lit(1)).as("mv"))
    vcells.join(ranked.select(col("grp"), col("x"), col("rank2")), Seq("grp", "x"))
      .groupBy(col("grp"), col("variant"))
      .agg(sum(col("mv")).as("n1"), sum(col("mv") * col("rank2")).as("r1_2"))
      .join(grpStats, "grp")
      .withColumn("n0", col("nn") - col("n1"))
      .filter(col("n0") > 0 && col("n1") > 0 &&
        col("tsum") < col("nn") * col("nn") * col("nn") - col("nn"))
      .withColumn("u2", col("r1_2") - col("n1") * (col("n1") + lit(1L)))
      .withColumn("z_micro",
        round((col("u2") - col("n0") * col("n1")).cast("double") * 1000000.0
          / (lit(2.0) * sqrt(
            col("n0").cast("double") * col("n1").cast("double") / 12.0
              * ((col("nn") + lit(1L)).cast("double")
                - col("tsum").cast("double")
                  / (col("nn").cast("double")
                    * (col("nn") - lit(1L)).cast("double"))))), 0)
          .cast("long"))
      .select(col("grp"), col("variant"), col("n0"), col("n1"),
        col("u2"), col("z_micro"))
  }

  /** K-variant one-vs-rest Welch's t: per-variant moment sums plus one
    * group-total pass; the rest-side moments are DIFFERENCES of exact
    * integer sums (total − variant), so no second fact scan per
    * variant. mean_diff is variant-minus-rest.
    *
    * @return (grp, variant, n0, n1, mean_diff_micro, t_micro)
    */
  def welchOneVsRest(df: DataFrame, grpCol: String, variantCol: String,
      centsCol: String): DataFrame = {
    val x = col(centsCol).cast("long")
    val per = df.groupBy(col(grpCol).as("grp"),
        col(variantCol).cast("long").as("variant"))
      .agg(count(lit(1)).as("n1"), sum(x).as("s1"), sum(x * x).as("ss1"))
    val tot = df.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("nt"), sum(x).as("st"), sum(x * x).as("sst"))
    def m(n: String, s: String) = col(s).cast("double") / col(n).cast("double")
    def va(n: String, s: String, ss: String) =
      (col(n).cast("double") * col(ss).cast("double")
        - col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n) - 1).cast("double"))
    val j = per.join(tot, "grp")
      .withColumn("n0", col("nt") - col("n1"))
      .withColumn("s0", col("st") - col("s1"))
      .withColumn("ss0", col("sst") - col("ss1"))
      .filter(col("n0") >= 2 && col("n1") >= 2)
    val se2 = va("n1", "s1", "ss1") / col("n1").cast("double") +
      va("n0", "s0", "ss0") / col("n0").cast("double")
    j.filter(se2 > 0.0)
      .select(col("grp"), col("variant"), col("n0"), col("n1"),
        round((m("n1", "s1") - m("n0", "s0")) * 1000000.0, 0).cast("long")
          .as("mean_diff_micro"),
        round((m("n1", "s1") - m("n0", "s0")) * 1000000.0 / sqrt(se2), 0)
          .cast("long").as("t_micro"))
  }

  def welchT(df: DataFrame, grpCol: String, variantCol: String,
      centsCol: String): DataFrame = {
    val x = col(centsCol).cast("long")
    def is(v: Int) = col(variantCol).cast("int") === v
    // ONE partial-combining pass over the facts: conditional sums per
    // variant instead of a per-(grp,variant) table joined to itself
    val j = df.groupBy(col(grpCol).as("grp"))
      .agg(sum(when(is(0), 1L).otherwise(0L)).as("n0"),
        sum(when(is(0), x).otherwise(0L)).as("s0"),
        sum(when(is(0), x * x).otherwise(0L)).as("ss0"),
        sum(when(is(1), 1L).otherwise(0L)).as("n1"),
        sum(when(is(1), x).otherwise(0L)).as("s1"),
        sum(when(is(1), x * x).otherwise(0L)).as("ss1"))
      .filter(col("n0") >= 2 && col("n1") >= 2)
    def m(n: String, s: String) = col(s).cast("double") / col(n).cast("double")
    def va(n: String, s: String, ss: String) =
      (col(n).cast("double") * col(ss).cast("double")
        - col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n) - 1).cast("double"))
    val se2 = va("n0", "s0", "ss0") / col("n0").cast("double") +
      va("n1", "s1", "ss1") / col("n1").cast("double")
    j.filter(se2 > 0.0)
      .select(col("grp"), col("n0"), col("n1"),
        round((m("n0", "s0") - m("n1", "s1")) * 1000000.0, 0).cast("long")
          .as("mean_diff_micro"),
        round((m("n0", "s0") - m("n1", "s1")) * 1000000.0 / sqrt(se2), 0)
          .cast("long").as("t_micro"))
  }

  /** Cohen's kappa inter-annotator agreement per group — the labeled-
    * data QA gate (two annotators, or an annotator vs a model, on the
    * same items): chance-corrected agreement from the 2×2 confusion
    * counts. Everything up to the final division is exact integers:
    *
    *   po = (n00 + n11) / N        pe = (a1·b1 + a0·b0) / N²
    *   kappa = (N·(n00+n11) − (a1·b1 + a0·b0)) / (N² − (a1·b1 + a0·b0))
    *
    * reported in micro-units via one rounded double division each (the
    * shared cross-engine shape). Groups where pe = 1 (both annotators
    * constant) have an undefined kappa and report null.
    *
    * One hash aggregation per group — no window, no join; grows with
    * the number of GROUPS, not items.
    *
    * @return (grp, n, n00, n01, n10, n11, po_micro, pe_micro, kappa_micro)
    */
  def cohenKappa(df: DataFrame, grpCol: String, aPred: Column,
                 bPred: Column): DataFrame = {
    val g = df.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(!aPred && !bPred, 1L).otherwise(0L)).as("n00"),
        sum(when(!aPred && bPred, 1L).otherwise(0L)).as("n01"),
        sum(when(aPred && !bPred, 1L).otherwise(0L)).as("n10"),
        sum(when(aPred && bPred, 1L).otherwise(0L)).as("n11"))
    val agree = col("n00") + col("n11")
    val chance = (col("n10") + col("n11")) * (col("n01") + col("n11")) +
      (col("n00") + col("n01")) * (col("n00") + col("n10"))
    g.select(col("grp"), col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
      round(agree.cast("double") / col("n").cast("double") * 1000000, 0)
        .cast("long").as("po_micro"),
      round(chance.cast("double") / (col("n") * col("n")).cast("double") * 1000000, 0)
        .cast("long").as("pe_micro"),
      when(col("n") * col("n") === chance, lit(null).cast("long"))
        .otherwise(round((col("n") * agree - chance).cast("double")
          / (col("n") * col("n") - chance).cast("double") * 1000000, 0)
          .cast("long")).as("kappa_micro"))
  }

  /** Fleiss' kappa per group: chance-corrected agreement for ≥ 2 raters
    * over a fixed category set — the multi-annotator generalization of
    * [[cohenKappa]] (label-quality audits with rater panels).
    *
    * Input is one row per (group, item, rating); every item must carry
    * the same rater count n (the classic Fleiss precondition — emitted
    * as `n_raters` so a violated contract is visible, not silent).
    * With n_ij the count of raters placing item i in category j:
    * `P_i = (Σ_j n_ij² − n)/(n(n−1))`, `P̄o = mean_i P_i`,
    * `p_j = Σ_i n_ij/(N·n)`, `P̄e = Σ_j p_j²`,
    * `κ = (P̄o − P̄e)/(1 − P̄e)`.
    *
    * All inputs to the final ratios are exact 64-bit counts (S2, Σc_j²),
    * so the double arithmetic replays identically in any engine. One
    * shuffle on (grp, item, cat), then group-sized tables.
    *
    * @return (grp, n_items, n_raters, po_micro, pe_micro, kappa_micro)
    */
  def fleissKappa(df: DataFrame, grpCol: String, itemCol: String,
                  catCol: String): DataFrame = {
    val nij = df.groupBy(col(grpCol).as("grp"), col(itemCol).as("item"),
        col(catCol).as("cat"))
      .agg(count(lit(1)).as("nij"))
    val perItem = nij.groupBy(col("grp"), col("item"))
      .agg(sum(col("nij")).as("n_i"), sum(col("nij") * col("nij")).as("s2_i"))
    val g1 = perItem.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_items"), max(col("n_i")).as("n_raters"),
        sum(col("s2_i")).as("s2"))
    val g2 = nij.groupBy(col("grp"), col("cat"))
      .agg(sum(col("nij")).as("c_j"))
      .groupBy(col("grp"))
      .agg(sum(col("c_j") * col("c_j")).as("pe_num"))
    val nn = col("n_items") * col("n_raters")
    val po = (col("s2") - nn).cast("double") /
      (nn * (col("n_raters") - 1)).cast("double")
    val pe = col("pe_num").cast("double") / (nn * nn).cast("double")
    g1.join(g2, "grp")
      .select(col("grp"), col("n_items"), col("n_raters"),
        round(po * 1000000, 0).cast("long").as("po_micro"),
        round(pe * 1000000, 0).cast("long").as("pe_micro"),
        when(pe === 1.0, lit(null).cast("long"))
          .otherwise(round((po - pe) / (lit(1.0) - pe) * 1000000, 0)
            .cast("long")).as("kappa_micro"))
  }

  /** Krippendorff's alpha (nominal metric, complete data) per group:
    * `α = 1 − D_o/D_e` with observed disagreement
    * `D_o = (N·n² − Σ_ij n_ij²) / (N·n·(n−1))` and expected
    * `D_e = (n_tot² − Σ_j c_j²) / (n_tot·(n_tot−1))`, `n_tot = N·n` —
    * the agreement coefficient whose expected-disagreement baseline
    * uses the finite-sample (without-replacement) correction, which is
    * why it differs from [[fleissKappa]] on small panels. Same input
    * contract and shuffle shape as fleissKappa.
    *
    * @return (grp, n_items, n_raters, do_micro, de_micro, alpha_micro)
    */
  def krippendorffAlphaNominal(df: DataFrame, grpCol: String, itemCol: String,
                               catCol: String): DataFrame = {
    val nij = df.groupBy(col(grpCol).as("grp"), col(itemCol).as("item"),
        col(catCol).as("cat"))
      .agg(count(lit(1)).as("nij"))
    val perItem = nij.groupBy(col("grp"), col("item"))
      .agg(sum(col("nij")).as("n_i"), sum(col("nij") * col("nij")).as("s2_i"))
    val g1 = perItem.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_items"), max(col("n_i")).as("n_raters"),
        sum(col("s2_i")).as("s2"))
    val g2 = nij.groupBy(col("grp"), col("cat"))
      .agg(sum(col("nij")).as("c_j"))
      .groupBy(col("grp"))
      .agg(sum(col("c_j") * col("c_j")).as("c2"))
    val nTot = col("n_items") * col("n_raters")
    val dObs = (col("n_items") * col("n_raters") * col("n_raters") - col("s2"))
      .cast("double") /
      (col("n_items") * col("n_raters") * (col("n_raters") - 1)).cast("double")
    val dExp = (nTot * nTot - col("c2")).cast("double") /
      (nTot * (nTot - 1)).cast("double")
    g1.join(g2, "grp")
      .select(col("grp"), col("n_items"), col("n_raters"),
        round(dObs * 1000000, 0).cast("long").as("do_micro"),
        round(dExp * 1000000, 0).cast("long").as("de_micro"),
        when(dExp === 0.0, lit(null).cast("long"))
          .otherwise(round((lit(1.0) - dObs / dExp) * 1000000, 0)
            .cast("long")).as("alpha_micro"))
  }

  /** Dawid–Skene latent-truth estimation (binary labels): where the
    * kappa family MEASURES rater agreement, this ESTIMATES each rater's
    * error profile and each item's true label jointly by EM — the
    * label-aggregation step a crowd-labeled training set actually needs
    * (majority vote weights a careless rater equally with a careful
    * one; DS learns the weights from the disagreement structure).
    *
    * `iters` fixed EM rounds over micro-integer state, every step in
    * the shared cross-engine shape so a SQL engine replays the whole
    * trajectory bit-for-bit:
    *  - posteriors `mu` live as micro longs; all M-step sums
    *    (`Σ mu·y`, `Σ mu`, …) are EXACT integer aggregates;
    *  - per-rater rates `pi1 = P(say 1 | true 1)`, `pi0 = P(say 1 |
    *    true 0)` and the prior are one rounded double division each,
    *    clamped to [1, 999999] micro (a rate of exactly 0/1 would zero
    *    every posterior product it touches — standard DS smoothing);
    *  - the E-step likelihood is a fold over the item's factor list
    *    SORTED BY RATER ID — `acc · (t/10⁶)` left to right — so the
    *    double multiplication ORDER is pinned (a plain product
    *    aggregate would be partition-order-dependent and a log-sum
    *    would be addition-order-dependent).
    *
    * Scale shape: M-steps are per-rater hash aggregates (rows = panel
    * size); the rater table broadcast-joins back; the E-step is one
    * groupBy(item) with a bounded (panel-sized) collect_list per item;
    * posteriors checkpoint per round (bounded `iters`), so the lineage
    * never deepens past one round.
    *
    * @param df one row per (item, rater, label); `yCol` boolean-like
    * @return one row per rater: (rater, pi1_micro, pi0_micro) + the
    *         shared (prior_micro, n_items, n_pos) — n_pos = items whose
    *         final posterior ≥ 0.5
    */
  def dawidSkene(df: DataFrame, itemCol: String, raterCol: String,
                 yCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1, "at least one EM round")
    val labels = graft.ext.Exec.checkpointEager(
      df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(yCol).cast("boolean").cast("int").cast("long").as("y")))
    def clampMicro(c: Column): Column =
      least(greatest(round(c, 0).cast("long"), lit(1L)), lit(999999L))
    // init: majority-vote posterior, micro-rounded
    var mu = labels.groupBy(col("item"))
      .agg(round(sum(col("y")).cast("double") * 1000000.0
        / count(lit(1)).cast("double"), 0).cast("long").as("mu"))
    var raters: DataFrame = null
    var priorMicro: DataFrame = null
    for (_ <- 1 to iters) {
      val withMu = labels.join(mu, "item")
      raters = withMu.groupBy(col("rater"))
        .agg(sum(col("mu") * col("y")).as("num1"), sum(col("mu")).as("den1"),
          sum((lit(1000000L) - col("mu")) * col("y")).as("num0"),
          sum(lit(1000000L) - col("mu")).as("den0"))
        .select(col("rater"),
          when(col("den1") > 0L, clampMicro(col("num1").cast("double")
              * 1000000.0 / col("den1").cast("double")))
            .otherwise(500000L).as("pi1"),
          when(col("den0") > 0L, clampMicro(col("num0").cast("double")
              * 1000000.0 / col("den0").cast("double")))
            .otherwise(500000L).as("pi0"))
      priorMicro = mu.agg(clampMicro(sum(col("mu")).cast("double")
        / count(lit(1)).cast("double")).as("p"))
      // E-step: factor lists sorted by rater id, folded left to right
      val facts = withMu.join(broadcast(raters), "rater")
        .select(col("item"),
          struct(col("rater"),
            (col("y") * col("pi1") + (lit(1L) - col("y")) * (lit(1000000L) - col("pi1")))
              .as("t1"),
            (col("y") * col("pi0") + (lit(1L) - col("y")) * (lit(1000000L) - col("pi0")))
              .as("t0")).as("f"))
        .groupBy(col("item")).agg(sort_array(collect_list(col("f"))).as("fs"))
      def fold(field: String): Column = aggregate(
        transform(col("fs"), x => x.getField(field).cast("double")),
        lit(1.0), (acc, x) => acc * (x / lit(1000000.0)))
      mu = graft.ext.Exec.checkpointEager(facts.crossJoin(broadcast(priorMicro))
        .select(col("item"),
          (col("p").cast("double") / 1000000.0 * fold("t1")).as("a"),
          ((lit(1000000L) - col("p")).cast("double") / 1000000.0 * fold("t0"))
            .as("b"))
        .select(col("item"),
          when(col("a") + col("b") > 0.0,
            round(col("a") * 1000000.0 / (col("a") + col("b")), 0).cast("long"))
            .otherwise(500000L).as("mu")))
    }
    val post = mu.agg(count(lit(1)).as("n_items"),
      sum(when(col("mu") >= 500000L, 1L).otherwise(0L)).as("n_pos"))
    raters.crossJoin(broadcast(priorMicro)).crossJoin(broadcast(post))
      .select(col("rater"), col("pi1").as("pi1_micro"),
        col("pi0").as("pi0_micro"), col("p").as("prior_micro"),
        col("n_items"), col("n_pos"))
  }

  /** ROC threshold sweep: confusion counts and rates for a classifier
    * score at every threshold of an integer grid — the operating-point
    * selection table ([[aucOneVsRest]] integrates it; this emits the
    * curve itself plus Youden's J so the best cutoff is a max over
    * rows). One pass: global positives/negatives once, then each grid
    * row aggregates `score >= t` counts — a broadcast grid × one
    * corpus-side aggregation, no per-threshold rescans.
    *
    * @param grid inclusive integer thresholds (score predicted
    *             positive when `score >= t`)
    * @return (t, n_pos, n_neg, tp, fp, tpr_milli, fpr_milli,
    *         youden_milli)
    */
  def rocSweep(df: DataFrame, scoreCol: String, labelCol: String,
               grid: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(scoreCol).cast("long").as("s"),
      col(labelCol).cast("boolean").as("y"))
    val g = grid.toDF("t")
    val counts = rows.crossJoin(broadcast(g))
      .groupBy(col("t"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("y") && col("s") >= col("t"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("y") && col("s") >= col("t"), 1L).otherwise(0L)).as("fp"))
    counts
      .withColumn("tpr_milli",
        round((col("tp") * 1000L).cast("double") / col("n_pos").cast("double"), 0)
          .cast("long"))
      .withColumn("fpr_milli",
        round((col("fp") * 1000L).cast("double") / col("n_neg").cast("double"), 0)
          .cast("long"))
      .withColumn("youden_milli", col("tpr_milli") - col("fpr_milli"))
  }

  /** Importance-weighted accuracy under covariate shift: when the
    * evaluation panel's group mix differs from the deployment target
    * mix, each group's correctness is reweighted by
    * `w_g = target_share_g / panel_share_g` (here: uniform target) —
    * the estimator that answers "what would this accuracy be on the
    * mix we actually serve". Exact integer counts; the weights and the
    * two closing ratios are the only shared doubles.
    *
    * @param correct boolean per-row correctness flag
    * @return one row: (n, n_groups, acc_raw_milli, acc_weighted_milli)
    */
  def importanceWeightedAccuracy(df: DataFrame, grpCol: String,
                                 correct: Column): DataFrame = {
    val per = df.select(col(grpCol).as("g"), correct.as("ok"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("c_g"))
    val tot = per.agg(sum(col("n_g")).as("nn"), count(lit(1)).as("k"))
    per.crossJoin(broadcast(tot))
      // uniform target: w_g = (N / k) / n_g — per-group correct mass
      // w_g·c_g over w_g·n_g telescopes to mean-of-group-accuracies
      .withColumn("w", col("nn").cast("double")
        / (col("k").cast("double") * col("n_g").cast("double")))
      .groupBy(col("nn"), col("k"))
      .agg(sum(col("c_g")).as("cc"),
        sum(round(col("w") * col("c_g").cast("double") * 1000000.0, 0)
          .cast("long")).as("wc_sum"),
        sum(round(col("w") * col("n_g").cast("double") * 1000000.0, 0)
          .cast("long")).as("wn_sum"))
      .select(col("nn").as("n"), col("k").as("n_groups"),
        round(col("cc").cast("double") * 1000.0 / col("nn").cast("double"), 0)
          .cast("long").as("acc_raw_milli"),
        round(col("wc_sum").cast("double") * 1000.0
          / col("wn_sum").cast("double"), 0).cast("long")
          .as("acc_weighted_milli"))
  }

  /** Delta-method standard error for a ratio-of-sums metric
    * (revenue-per-session, clicks-per-user) per experiment variant —
    * the estimator behind every "ratio metric" readout in large-scale
    * experimentation (Deng et al., KDD'18 shape): with per-unit
    * numerator x and denominator y, θ = Σx/Σy and
    * `Var(θ) ≈ (s_x² − 2θ·s_xy + θ²·s_y²) / (n·ȳ²)` from the per-unit
    * sample moments.
    *
    * Exactness discipline: ONE groupBy collapses the units to six
    * integer sums (n, Σx, Σy, Σx², Σy², Σxy); every fractional step is
    * a shared-shape double expression over those integers (each sum is
    * cast to double BEFORE any product, so nothing re-wraps signed-64
    * at corpus scale — the linearCka lesson), rounded to micro at the
    * end. sqrt is IEEE-correctly-rounded on both engines.
    *
    * Scale shape: one partial-aggregating pass over the unit table to
    * |variants| rows; everything after runs on that tiny table.
    *
    * @param num per-unit numerator (integer units, e.g. cents)
    * @param den per-unit denominator (integer count)
    * @return (variant, n, sx, sy, ratio_micro, se_micro)
    */
  def ratioMetricDelta(units: DataFrame, variantCol: String,
      num: Column, den: Column): DataFrame = {
    val base = units.select(col(variantCol).as("variant"),
      num.cast("long").as("x"), den.cast("long").as("y"))
    def d(c: String) = col(c).cast("double")
    // second moments stay INTEGER sums (order-independent across
    // engines); bound: |x| ≤ 1e6-ish per unit keeps Σx² < 2^63 up to
    // ~1e6 units per variant — per-unit metrics, not raw event values
    val agg = base.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("n") > 1 && col("sy") > 0)
    val r = d("sx") / d("sy")
    val nD = d("n")
    val vx = (d("sxx") - d("sx") * d("sx") / nD) / (nD - 1.0d)
    val vy = (d("syy") - d("sy") * d("sy") / nD) / (nD - 1.0d)
    val cxy = (d("sxy") - d("sx") * d("sy") / nD) / (nD - 1.0d)
    val muY = d("sy") / nD
    val varTheta = (vx - lit(2.0d) * r * cxy + r * r * vy) / (nD * muY * muY)
    agg.select(col("variant"), col("n"), col("sx"), col("sy"),
      round(r * 1000000.0d, 0).cast("long").as("ratio_micro"),
      round(sqrt(greatest(varTheta, lit(0.0d))) * 1000000.0d, 0)
        .cast("long").as("se_micro"))
  }

  /** Leave-one-group-out (delete-a-fold) jackknife standard error for
    * a global ratio-of-sums — the variance estimate that survives
    * arbitrary within-fold correlation (fold = clerk, day, shard),
    * standard for cluster-correlated pipeline metrics.
    *
    * θ_i = (Σx − sx_i)/(Σy − sy_i) comes from TOTALS MINUS THE FOLD —
    * one groupBy plus one broadcast of the two totals, never a
    * leave-one-out re-scan. Each θ_i deviation is MILLI-rounded to an
    * integer FIRST, so the fold-table sum of squared deviations is an
    * exact integer sum (order-independent across engines; milli, not
    * micro, so dev² of cents-scale ratios stays far inside signed-64);
    * only the final sqrt is a double.
    *
    * @return one row: (n_folds, theta_micro, jk_se_milli)
    */
  def jackknifeRatio(df: DataFrame, foldCol: String,
      num: Column, den: Column): DataFrame = {
    val folds = df.select(col(foldCol).as("f"),
        num.cast("long").as("x"), den.cast("long").as("y"))
      .groupBy(col("f"))
      .agg(sum(col("x")).as("sx_i"), sum(col("y")).as("sy_i"))
    val tot = folds.agg(sum(col("sx_i")).as("sx"), sum(col("sy_i")).as("sy"),
      count(lit(1)).as("g"))
    // center each θ_i on the FULL-sample θ (both milli integers) before
    // squaring: LOO deviations are tiny, so dev² sums never approach
    // signed-64 even when θ itself is ~1e10 milli (cents-scale ratios)
    val thetas = folds.crossJoin(broadcast(tot))
      .filter(col("sy") - col("sy_i") > 0)
      .select(col("g"), col("sx"), col("sy"),
        (round((col("sx") - col("sx_i")).cast("double") * 1000.0d
          / (col("sy") - col("sy_i")).cast("double"), 0).cast("long")
          - round(col("sx").cast("double") * 1000.0d
            / col("sy").cast("double"), 0).cast("long")).as("dev"))
    thetas.groupBy(col("g"), col("sx"), col("sy"))
      .agg(count(lit(1)).as("g_eff"), sum(col("dev")).as("sd"),
        sum(col("dev") * col("dev")).as("sdd"))
      // Σ(θ_i − θ̄)² = Σdev² − (Σdev)²/G (same centering identity, any
      // origin); jackknife var = (G−1)/G · Σ(θ_i − θ̄)²
      .select(col("g_eff").as("n_folds"),
        round(col("sx").cast("double") * 1000000.0d
          / col("sy").cast("double"), 0).cast("long").as("theta_micro"),
        round(sqrt(greatest(
          (col("g_eff") - 1L).cast("double") / col("g_eff").cast("double")
            * (col("sdd").cast("double")
              - col("sd").cast("double") * col("sd").cast("double")
                / col("g_eff").cast("double")), lit(0.0d))), 0)
          .cast("long").as("jk_se_milli"))
  }

  /** Minimum-detectable-effect (MDE) sizing per one-vs-rest cell — the
    * pre-experiment companion to [[welchOneVsRest]]/[[bhFdr]]: with the
    * ARMS' realized sizes and variances, the smallest true mean shift a
    * two-sided level-α test would detect with power 1−β is
    * `(z_{1−α/2} + z_{1−β}) · sqrt(s1²/n1 + s0²/n0)`. Read it before
    * trusting a null result: an observed diff far below the MDE says
    * "underpowered", not "no effect".
    *
    * The z multipliers are SPEC CONSTANTS (1.959964 / 0.841621 for
    * α = .05, power = .8), not a computed inverse CDF — both engines
    * add the same two double literals, so the only float work is the
    * shared sqrt over moments that are exact integer differences (same
    * discipline as [[welchOneVsRest]]). `mde_rel_milli` scales by the
    * rest-arm mean (NULL when that mean is 0 — no meaningful ratio).
    *
    * @return (grp, variant, n0, n1, se_micro, mde_micro, mde_rel_milli)
    */
  def mdePower(df: DataFrame, grpCol: String, variantCol: String,
               centsCol: String, zAlpha: Double = 1.959964,
               zBeta: Double = 0.841621): DataFrame = {
    val x = col(centsCol).cast("long")
    val per = df.groupBy(col(grpCol).as("grp"),
        col(variantCol).cast("long").as("variant"))
      .agg(count(lit(1)).as("n1"), sum(x).as("s1"), sum(x * x).as("ss1"))
    val tot = df.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("nt"), sum(x).as("st"), sum(x * x).as("sst"))
    def va(n: String, s: String, ss: String) =
      (col(n).cast("double") * col(ss).cast("double")
        - col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n) - 1).cast("double"))
    val j = per.join(tot, "grp")
      .withColumn("n0", col("nt") - col("n1"))
      .withColumn("s0", col("st") - col("s1"))
      .withColumn("ss0", col("sst") - col("ss1"))
      .filter(col("n0") >= 2 && col("n1") >= 2)
    val se2 = va("n1", "s1", "ss1") / col("n1").cast("double") +
      va("n0", "s0", "ss0") / col("n0").cast("double")
    val z = lit(zAlpha) + lit(zBeta)
    j.filter(se2 > 0.0)
      .withColumn("se_micro", round(sqrt(se2) * 1000000.0, 0).cast("long"))
      .withColumn("mde_micro", round(z * sqrt(se2) * 1000000.0, 0).cast("long"))
      .select(col("grp"), col("variant"), col("n0"), col("n1"),
        col("se_micro"), col("mde_micro"),
        when(col("s0") =!= 0L,
          round(z * sqrt(se2) * abs(col("n0").cast("double")
            / col("s0").cast("double")) * 1000.0, 0).cast("long"))
          .as("mde_rel_milli"))
  }

  /** Benjamini–Hochberg FDR step-up over a panel of test statistics —
    * the multiple-testing control every metric panel needs before its
    * per-cell t/z tests are read as discoveries (running k one-vs-rest
    * tests at α each inflates the family-wise false-positive rate; BH
    * bounds the expected FALSE-DISCOVERY fraction at α instead).
    *
    * Two-sided p-values come from |z| through the Abramowitz–Stegun
    * 26.2.17 normal-CDF polynomial — a fixed-coefficient Horner form
    * both engines replay in the identical operation order, micro-rounded
    * before any comparison, so the step-up thresholding is an exact
    * integer test (`p_micro·m ≤ rank·α_micro`) and the reject set is
    * bit-deterministic cross-engine. Rejection: k* = max rank passing
    * the line, reject ranks 1..k* (the step-up closure).
    *
    * The panel is a bounded tests table (groups × variants — type²
    * cardinality), so the partition-less rank window and the two
    * broadcast scalars are safe by construction; nothing here touches
    * the fact table that produced the statistics.
    *
    * @param tests     one row per hypothesis, carrying `zMicroCol`
    * @param zMicroCol micro-scaled z/t statistic column name
    * @param alphaMicro FDR level in micro units (50000 = 0.05)
    * @param idCols    hypothesis identity columns (tie-break order)
    * @return tests' id columns + (z carried) + p_micro, rnk, reject —
    *         ordered by nothing (callers sort)
    */
  def bhFdr(tests: DataFrame, zMicroCol: String, alphaMicro: Long,
            idCols: Seq[String]): DataFrame = {
    val z = abs(col(zMicroCol)).cast("double") / 1000000.0
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
    val pdf = exp(z * z / lit(-2.0)) / lit(2.5066282746310002)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) + t *
      (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val base = tests.withColumn("p_micro",
      round(least(pdf * poly * lit(2.0), lit(1.0)) * 1000000.0, 0)
        .cast("long"))
    val w = Window.orderBy((col("p_micro") +: idCols.map(col)): _*)
    val ranked = base.withColumn("rnk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("m"))))
    val kstar = ranked.agg(coalesce(max(when(
        col("p_micro") * col("m") <= col("rnk") * lit(alphaMicro),
        col("rnk"))), lit(0L)).as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select(idCols.map(col) ++ Seq(col(zMicroCol), col("p_micro"),
        col("rnk"), (col("rnk") <= col("kstar")).as("reject")): _*)
  }
}
