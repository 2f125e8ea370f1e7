package graft.ops

import org.apache.spark.sql.DataFrame
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
}
