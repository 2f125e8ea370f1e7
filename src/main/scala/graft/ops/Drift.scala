package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between a reference slice and a current
  * slice — the monitoring pass a production pipeline runs on every
  * ingest batch against the training-time distribution.
  *
  * PSI (population stability index) per fixed-width bucket:
  * `(p − q) · ln(p/q)` with `p = c_ref/N_ref`, `q = c_cur/N_cur`; empty
  * cells clamp their COUNT to 1 (the standard epsilon floor, made
  * integer so the log arguments stay exact: `ln(p/q) =
  * ln(c_ref·N_cur) − ln(c_cur·N_ref)`, both products integers, so both
  * engines see identical doubles). Every per-bucket contribution is
  * non-negative; micro-unit rounding makes the total an
  * order-independent integer sum. PSI > 0.2 is the conventional
  * retrain/alert threshold.
  *
  * Scale shape: two linear groupBys down to O(buckets) rows; the join
  * and total-windows run on the bucket table, never the data.
  */
object Drift {

  /** Two-sample Kolmogorov–Smirnov statistic, exactly: the max CDF gap
    * over the union of observed values, computed as the integer
    * cross-product `|cum1·n2 − cum2·n1|` (no per-step division, so the
    * argmax is exact; the final micro-unit ratio is ONE shared-shape
    * double op). Heavier-tailed than PSI's fixed buckets — the
    * bucket-free drift test.
    *
    * Scale shape: both inputs collapse to per-VALUE counts first (two
    * linear groupBys), so the cumulative window runs over the tiny
    * distinct-value table, never the data; the single-partition window
    * there is O(distinct values).
    *
    * @return one row: (n_ref, n_cur, d_num, d_micro) where
    *         `d = d_num / (n_ref·n_cur)` and `d_micro = round(d·1e6)`
    */
  def ksStatistic(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def byValue(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v")).agg(count(lit(1)).as(n))
    val joined = byValue(ref, "c1").join(byValue(cur, "c2"), Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
    joined
      .withColumn("cum1", sum(col("c1")).over(cum))
      .withColumn("cum2", sum(col("c2")).over(cum))
      .withColumn("n1", sum(col("c1")).over(whole))
      .withColumn("n2", sum(col("c2")).over(whole))
      .withColumn("diff", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .agg(max(col("n1")).as("n_ref"), max(col("n2")).as("n_cur"),
        max(col("diff")).as("d_num"))
      .select(col("n_ref"), col("n_cur"), col("d_num"),
        round(col("d_num").cast("double") / (col("n_ref") * col("n_cur")) * 1000000, 0)
          .cast("long").as("d_micro"))
  }

  def psiContributions(ref: DataFrame, cur: DataFrame,
                       valueCol: String, width: Long): DataFrame = {
    require(width > 0, "bin width must be positive")
    def binned(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .groupBy((floor(col(valueCol) / width).cast("long") * width).as("bin_lo"))
      .agg(count(lit(1)).as(n))
    val joined = binned(ref, "n_ref")
      .join(binned(cur, "n_cur"), Seq("bin_lo"), "full_outer")
      .select(col("bin_lo"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val w = Window.partitionBy() // bucket table only — O(buckets) rows
    joined
      .withColumn("t_ref", sum(col("n_ref")).over(w))
      .withColumn("t_cur", sum(col("n_cur")).over(w))
      .withColumn("c1", greatest(col("n_ref"), lit(1L)))
      .withColumn("c2", greatest(col("n_cur"), lit(1L)))
      .withColumn("contrib_micro",
        round((col("c1").cast("double") / col("t_ref")
            - col("c2").cast("double") / col("t_cur"))
          * (log((col("c1") * col("t_cur")).cast("double"))
            - log((col("c2") * col("t_ref")).cast("double"))) * 1000000, 0)
          .cast("long"))
      .select(col("bin_lo"), col("n_ref"), col("n_cur"), col("contrib_micro"))
  }

  /** Benford first-digit profile of a POSITIVE integer measure — the
    * fabricated-data / unit-mixing smoke test (hand-entered amounts
    * and synthetic pads drift from the log distribution). Observed
    * share vs the Benford expectation `log10(1 + 1/d)` per leading
    * digit, all in micro-units: counts are exact longs; the share and
    * the expectation are each ONE shared-shape double expression
    * (`ln(d+1) − ln(d)` over `ln 10` — same literal shapes in the
    * oracle), so deviations are engine-exact.
    *
    * One partial-combining groupBy over the measure; everything after
    * lives on the ≤ 9-row digit table.
    */
  def benfordProfile(df: DataFrame, valCol: String): DataFrame = {
    val byDigit = df
      .filter(col(valCol).isNotNull && col(valCol) > 0)
      .select(substring(col(valCol).cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy() // digit table only — <= 9 rows
    byDigit
      .withColumn("total", sum(col("n")).over(w))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") * 1000000.0 / col("total").cast("double"), 0)
          .cast("long").as("share_micro"),
        round((log((col("digit") + 1).cast("double")) - log(col("digit").cast("double")))
          / log(lit(10.0).cast("double")) * 1000000.0, 0)
          .cast("long").as("benford_micro"))
      .withColumn("dev_micro", col("share_micro") - col("benford_micro"))
  }

  /** Pairwise 1-D Wasserstein (earth-mover) distance between every
    * group's distribution of an integer measure — the distribution-
    * shift metric that, unlike KS (max gap) or PSI (binned), weights
    * BOTH how much mass moved and how FAR: `W₁ = ∫|F_a − F_b|`, exact
    * on a discrete domain as `Σ_i |cum_a·n_b − cum_b·n_a|·gap_i /
    * (n_a·n_b)` — all integer until the single final division.
    *
    * Scale shape: one (grp, value) count pass over the corpus; the
    * grid (distinct values of a bounded measure) and the groups×grid
    * zero-filled CDF table are dimension-sized, and the pair join is
    * quadratic only in groups.
    *
    * @return (grp_a, grp_b, n_a, n_b, w1_milli), grp_a < grp_b
    */
  def wasserstein1dByGroup(df: DataFrame, grpCol: String,
                           valCol: String): DataFrame = {
    val vals = df.select(col(grpCol).as("grp"), col(valCol).cast("long").as("v"))
    val counts = vals.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("n"))
    val grid = vals.select(col("v")).distinct()
      // value-domain table (bounded): the lead window runs on it alone
      .withColumn("gap", coalesce(
        lead(col("v"), 1).over(Window.partitionBy().orderBy(col("v"))) - col("v"),
        lit(0L)))
    val grps = vals.groupBy(col("grp")).agg(count(lit(1)).as("n_tot"))
    val cdf = grps.crossJoin(broadcast(grid))
      .join(counts, Seq("grp", "v"), "left")
      .withColumn("cum", sum(coalesce(col("n"), lit(0L)))
        .over(Window.partitionBy(col("grp")).orderBy(col("v"))))
      .select(col("grp"), col("v"), col("gap"), col("n_tot"), col("cum"))
    val a = cdf.select(col("grp").as("grp_a"), col("v"), col("gap"),
      col("n_tot").as("n_a"), col("cum").as("cum_a"))
    val b = cdf.select(col("grp").as("grp_b"), col("v").as("vb"),
      col("n_tot").as("n_b"), col("cum").as("cum_b"))
    a.join(b, col("grp_a") < col("grp_b") && col("v") === col("vb"))
      .groupBy(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"))
      .agg(sum(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
        * col("gap")).as("s"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        round(col("s").cast("double") * 1000.0
          / (col("n_a") * col("n_b")).cast("double"), 0)
          .cast("long").as("w1_milli"))
  }

  /** Sliced 1-D Wasserstein between two embedding groups: project the
    * micro-int vectors onto `nProj` deterministic ±1 hash directions
    * (sign = parity of a (proj, dim) hash — the rand()-free direction
    * set), then run the exact discrete W₁ of [[wasserstein1dByGroup]]
    * per projection. The scalable reading of high-dimensional
    * distribution shift: exact in each slice, direction count is the
    * resolution knob.
    *
    * The per-projection CDF window partitions on the projection id; at
    * corpus scale each slice is a candidate for the two-phase
    * range-partitioned rank (ops/Ranks) — the slice count bounds the
    * parallelism either way.
    *
    * @param grpA boolean: true = group A, false = group B
    * @return (proj, n_a, n_b, w1_milli) one row per direction
    */
  def slicedWasserstein(emb: DataFrame, idCol: String, vecCol: String,
                        grpA: Column, nProj: Int = 8): DataFrame = {
    require(nProj >= 1 && nProj <= 64, "direction count out of range")
    val spark = emb.sparkSession
    import spark.implicits._
    val micro = emb.select(col(idCol).as("id"), grpA.as("ga"),
      posexplode(transform(col(vecCol),
        x => round(x.cast("double") * 1000000.0, 0).cast("long")))
        .as(Seq("d", "xm")))
    // direction table spans the ACTUAL embedding width (a hardcoded cap
    // would silently drop tail dimensions from the inner join on d);
    // one column-pruned aggregate, dims-bounded
    // nullable read: an empty input (or all-null vector column) makes
    // the max NULL — fold that into the require instead of NPE-ing
    val dimRow = emb.agg(max(size(col(vecCol)))).head()
    val dim = if (dimRow.isNullAt(0)) 0 else dimRow.getInt(0)
    require(dim >= 1, "empty embedding column")
    // the cross-term (d+1)(p+7) keeps the sign hash NONLINEAR mod 2 —
    // a linear form like p·31 + d·17 collapses every direction onto one
    // parity vector (caught by the shifted-group spec)
    val dirs = (0 until nProj).flatMap { pr =>
      (0 until dim).map { d =>
        val h = ((pr + 1L) * 2654435761L + (d + 1L) * (pr + 7L) * 40503L) %
          1000003L % 2L
        (pr.toLong, d.toLong, if (h == 0L) 1L else -1L)
      }
    }.toDF("p", "d", "sgn")
    val proj = micro.join(broadcast(dirs), "d")
      .groupBy(col("id"), col("ga"), col("p"))
      .agg(sum(col("sgn") * col("xm")).as("x"))
    val counts = proj.groupBy(col("p"), col("ga"), col("x"))
      .agg(count(lit(1)).as("n"))
    val grid = proj.select(col("p"), col("x")).distinct()
      .withColumn("gap", coalesce(
        lead(col("x"), 1).over(Window.partitionBy(col("p")).orderBy(col("x")))
          - col("x"), lit(0L)))
    val grps = proj.groupBy(col("p"), col("ga")).agg(count(lit(1)).as("n_tot"))
    val cdf = grps.join(grid, "p")
      .join(counts, Seq("p", "ga", "x"), "left")
      .withColumn("cum", sum(coalesce(col("n"), lit(0L)))
        .over(Window.partitionBy(col("p"), col("ga")).orderBy(col("x"))))
      .select(col("p"), col("ga"), col("x"), col("gap"), col("n_tot"), col("cum"))
    val a = cdf.filter(col("ga")).select(col("p"), col("x"), col("gap"),
      col("n_tot").as("n_a"), col("cum").as("cum_a"))
    val b = cdf.filter(!col("ga")).select(col("p").as("pb"), col("x").as("xb"),
      col("n_tot").as("n_b"), col("cum").as("cum_b"))
    a.join(b, col("p") === col("pb") && col("x") === col("xb"))
      .groupBy(col("p").as("proj"), col("n_a"), col("n_b"))
      .agg(sum(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
        * col("gap")).as("s"))
      .select(col("proj"), col("n_a"), col("n_b"),
        round(col("s").cast("double") * 1000.0
          / (col("n_a") * col("n_b")).cast("double")
          / 1000000.0, 0).cast("long").as("w1_milli"))
  }
}
