package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted quantiles per group over integer values and integer
  * weights — the reference's unweighted medians (R/export.R monthly
  * medians) generalized to effort-weighted summaries (median price per
  * kg weighted by catch, median quality weighted by token count).
  *
  * The lower weighted q-quantile (q = num/den) is the smallest value v
  * with `den·cum(v) ≥ num·W` — the crossing test stays in exact integer
  * arithmetic (no fractional target), so both engines agree on every
  * tie and the value returned is always an actual data value.
  *
  * Shape: one groupBy(grp, value) pre-aggregation (map-side combined —
  * the only pass over the data), then cumulative/total windows over the
  * per-(group, distinct-value) table partitioned BY GROUP — the same
  * grouped-window scale posture as the exact percentile aggregations
  * (A3), with the same caveat: a single group with ~all distinct values
  * concentrates in one task; the bounded-memory escape hatch for that
  * regime is [[graft.functions.Percentiles.percentileSketch]] (rank
  * error instead of exactness).
  */
object WeightedStats {

  /** Per-group exact weighted quantiles.
    *
    * @param quantiles (num, den, alias) triples, e.g. (1, 2,
    *                  "wmedian"); each yields a column `alias` with the
    *                  lower weighted quantile at num/den
    */
  def weightedQuantiles(df: DataFrame, grpCol: String, valueCol: String,
                        weightCol: String,
                        quantiles: Seq[(Int, Int, String)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, d, _) =>
      require(n > 0 && d > 0 && n <= d, s"quantile $n/$d out of (0,1]") }
    val byVal = df.select(col(grpCol).as("grp"), col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0) // zero/negative weight carries no mass
      .groupBy(col("grp"), col("v")).agg(sum(col("w")).as("w"))
    val cumWin = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totWin = Window.partitionBy(col("grp"))
    val c = byVal
      .withColumn("cum", sum(col("w")).over(cumWin))
      .withColumn("tot", sum(col("w")).over(totWin))
    val aggs = min(col("tot")).as("total_weight") +:
      quantiles.map { case (num, den, alias) =>
        min(when(col("cum") * den >= col("tot") * num, col("v"))).as(alias)
      }
    c.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
  }

  /** Bounded-memory variant of [[weightedQuantiles]] — one
    * [[graft.functions.WeightedQuantileSketch]] aggregate per
    * requested quantile, O(2/eps) state per group regardless of the
    * group's distinct-value count (the one-hot-group regime where the
    * exact path's grouped window concentrates in a single task).
    * Approximate: returned values sit within eps·W rank error of the
    * exact crossing. Requires a graft session (or
    * [[graft.functions.GraftFunctions.ensureRegistered]]).
    */
  def weightedQuantilesSketch(df: DataFrame, grpCol: String, valueCol: String,
                              weightCol: String,
                              quantiles: Seq[(Int, Int, String)],
                              eps: Double = 0.005): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val v = col(valueCol).cast("long")
    val w = col(weightCol).cast("long")
    val aggs = sum(when(w > 0, w).otherwise(0L)).as("total_weight") +:
      quantiles.map { case (num, den, alias) =>
        call_function("weighted_quantile_sketch", v, w,
          lit(num), lit(den), lit(eps)).as(alias)
      }
    df.groupBy(col(grpCol).as("grp")).agg(aggs.head, aggs.tail: _*)
  }
}
