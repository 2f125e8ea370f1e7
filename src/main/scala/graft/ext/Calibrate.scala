package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probability-calibration operators over binned forecasts: the
  * isotonic (PAVA) calibration map and Murphy's Brier-score
  * decomposition. Both extend the reliability-bin report
  * ([[graft.ops.Eval.calibrationBins]], q161) from describing the bins
  * to fitting/scoring them — the post-hoc calibration step a quality
  * classifier goes through before its scores gate a corpus.
  *
  * Scale shape: one aggregation pass collapses the corpus to ≤`bins`
  * rows; everything after (the PAVA minimax triple over segments, the
  * decomposition sums) runs on that bins-sized table, so the O(B³)
  * isotonic form and the partition-less windows are bounded by the
  * bin count, never the data.
  */
object Calibrate {

  /** Isotonic calibration via the exact minimax characterization: the
    * PAVA fit at bin k equals max_{i≤k} min_{j≥k} avg(y over bins
    * i..j). Averages are micro-rounded BEFORE the minimax so both
    * engines order identical integers (deviates from real-valued PAVA
    * only when two segment averages collide within 1e-6).
    */
  def isotonicBins(scored: DataFrame, pCol: String, yCol: String,
                   bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(pCol.matches("[A-Za-z0-9_]+"),
      s"pCol must be a bare identifier, got '$pCol'")
    val b = scored
      .select(least(greatest(expr(s"$pCol * $bins div 1000000"), lit(0L)),
          lit(bins - 1L)).as("bin"),
        col(yCol).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    // bounded window: ≤ bins rows by construction
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = b.select(col("bin"), col("n"), col("n_pos"),
      sum(col("n")).over(w).as("cn"), sum(col("n_pos")).over(w).as("cy"))
    val lo = pre.select(col("bin").as("i"),
      (col("cn") - col("n")).as("cn0"), (col("cy") - col("n_pos")).as("cy0"))
    val hi = pre.select(col("bin").as("j"), col("cn"), col("cy"))
    val segs = lo.crossJoin(hi).filter(col("i") <= col("j"))
      .select(col("i"), col("j"),
        round((col("cy") - col("cy0")).cast("double") * 1000000.0
          / (col("cn") - col("cn0")).cast("double"), 0).cast("long").as("avg_micro"))
    val ks = b.select(col("bin").as("k"))
    val innerMin = ks.join(segs, col("i") <= col("k") && col("k") <= col("j"))
      .groupBy(col("k"), col("i")).agg(min(col("avg_micro")).as("m"))
    val iso = innerMin.groupBy(col("k")).agg(max(col("m")).as("iso_rate_micro"))
    b.join(iso, col("bin") === col("k"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") * 1000000.0 / col("n").cast("double"), 0)
          .cast("long").as("emp_rate_micro"),
        col("iso_rate_micro"))
  }

  /** Murphy decomposition of the Brier score for bin-center forecasts:
    * reliability − resolution + uncertainty = Brier, exact in reals
    * because every forecast in a bin IS the bin center (2b+1)/(2·bins).
    * Per-bin terms are micro-rounded integers; the identity therefore
    * holds to a few micro (spec-asserted).
    */
  def brierDecomposition(scored: DataFrame, pCol: String, yCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(pCol.matches("[A-Za-z0-9_]+"),
      s"pCol must be a bare identifier, got '$pCol'")
    val den = 2.0 * bins
    val b = scored
      .select(least(greatest(expr(s"$pCol * $bins div 1000000"), lit(0L)),
          lit(bins - 1L)).as("bin"),
        col(yCol).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("yb"))
      .withColumn("c", (col("bin") * 2 + 1).cast("double") / den)
    val tot = b.agg(sum(col("n")).as("nn"), sum(col("yb")).as("yy"))
    val terms = b.crossJoin(broadcast(tot)).select(
      col("n"), col("yb"),
      round((col("n") * col("c") * col("c")
        - col("yb") * col("c") * 2.0
        + col("yb").cast("double") * col("yb").cast("double")
          / col("n").cast("double")) * 1000000.0, 0).cast("long").as("t_rel"),
      round(col("n").cast("double")
        * (col("yb").cast("double") / col("n").cast("double")
          - col("yy").cast("double") / col("nn").cast("double"))
        * (col("yb").cast("double") / col("n").cast("double")
          - col("yy").cast("double") / col("nn").cast("double"))
        * 1000000.0, 0).cast("long").as("t_res"),
      round((col("yb") * (lit(1.0) - col("c")) * (lit(1.0) - col("c"))
        + (col("n") - col("yb")) * col("c") * col("c")) * 1000000.0, 0)
        .cast("long").as("t_brier"))
    terms.crossJoin(broadcast(tot)).groupBy(col("nn"), col("yy"))
      .agg(sum(col("t_rel")).as("sr"), sum(col("t_res")).as("ss"),
        sum(col("t_brier")).as("sb"))
      .select(col("nn").as("n"), col("yy").as("n_pos"),
        round(col("sb").cast("double") / col("nn").cast("double"), 0)
          .cast("long").as("brier_micro"),
        round(col("sr").cast("double") / col("nn").cast("double"), 0)
          .cast("long").as("rel_micro"),
        round(col("ss").cast("double") / col("nn").cast("double"), 0)
          .cast("long").as("res_micro"),
        round(col("yy").cast("double") / col("nn").cast("double")
          * (lit(1.0) - col("yy").cast("double") / col("nn").cast("double"))
          * 1000000.0, 0).cast("long").as("unc_micro"))
  }

  /** Expected / maximum calibration error over the q161 bins:
    * ECE = Σ n_b·|p̄_b − ō_b| / N and MCE = max_b |p̄_b − ō_b| — the
    * two headline numbers a calibration report leads with (the bins
    * themselves are q161; the isotonic FIX is [[isotonicBins]]).
    * Per-bin gaps micro-rounded before the weighted sum.
    *
    * @return one row: (n, ece_micro, mce_micro)
    */
  def calibrationError(scored: DataFrame, pCol: String, yCol: String,
                       bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(pCol.matches("[A-Za-z0-9_]+"),
      s"pCol must be a bare identifier, got '$pCol'")
    val b = scored
      .select(least(greatest(expr(s"$pCol * $bins div 1000000"), lit(0L)),
          lit(bins - 1L)).as("bin"),
        col(pCol).as("p"), col(yCol).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"), sum(col("y")).as("sy"))
      .withColumn("gap_micro",
        abs(round(col("sp").cast("double") / col("n").cast("double"), 0)
            .cast("long")
          - round(col("sy").cast("double") * 1000000.0
            / col("n").cast("double"), 0).cast("long")))
    b.agg(sum(col("n")).as("nn"),
        sum(col("n") * col("gap_micro")).as("wsum"),
        max(col("gap_micro")).as("mce_micro"))
      .select(col("nn").as("n"),
        round(col("wsum").cast("double") / col("nn").cast("double"), 0)
          .cast("long").as("ece_micro"),
        col("mce_micro"))
  }
}
