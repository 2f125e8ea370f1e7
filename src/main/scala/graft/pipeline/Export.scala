package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Reshape

/** Export summaries — `export_lurio_landings()` (reference
  * R/export.R:474-781): per-trip indicator rollup, monthly median
  * metrics completed over the month grid and unpivoted long, top-5 +
  * "Other" species composition with shares, and the nested catch_df
  * document (R11/R12).
  */
object Export {

  /** Trip indicators (R/export.R:531-566): deterministic firsts, summed
    * catch, distinct-taxa string agg, cpue/rpue/price_kg with the
    * Inf→NA guard (division by zero is already null in Spark; explicit
    * nan guard kept for 0/0).
    */
  def tripIndicators(validated: DataFrame): DataFrame = {
    def deInf(c: org.apache.spark.sql.Column) = when(isnan(c), lit(null).cast("double")).otherwise(c)
    validated.groupBy(col("submission_id"))
      .agg(
        min_by(struct(col("landing_date"), col("district"), col("landing_site"),
          col("gear"), col("n_fishers"), col("trip_duration"), col("catch_price")),
          col("n_catch")).as("f"),
        sum(col("catch_kg")).as("catch_kg"),
        array_join(sort_array(collect_set(col("catch_taxon"))), "-").as("taxa"))
      .select(col("submission_id"),
        col("f.landing_date").as("landing_date"),
        col("f.district").as("district"),
        col("f.landing_site").as("landing_site"),
        col("f.gear").as("gear"),
        col("f.n_fishers").as("n_fishers"),
        col("f.trip_duration").as("trip_duration"),
        col("f.catch_price").as("catch_price"),
        col("catch_kg"), col("taxa"))
      .withColumn("cpue", deInf(col("catch_kg") / col("n_fishers") / col("trip_duration")))
      .withColumn("rpue", deInf(col("catch_price") / col("n_fishers") / col("trip_duration")))
      .withColumn("price_kg", deInf(col("catch_price") / col("catch_kg")))
  }

  /** Monthly medians per district, completed over the month grid and
    * unpivoted to (metric, value) rows (R/export.R:570-597).
    */
  def monthlyMetrics(trips: DataFrame): DataFrame = {
    val agg = trips
      .groupBy(col("district"), trunc(col("landing_date"), "month").as("month"))
      .agg(
        count(lit(1)).cast("double").as("n_trips"),
        expr("percentile(cpue, 0.5)").as("med_cpue"),
        expr("percentile(rpue, 0.5)").as("med_rpue"),
        expr("percentile(price_kg, 0.5)").as("med_price_kg"))
    val bounds = trips.agg(
      trunc(min(col("landing_date")), "month").as("mn"),
      trunc(max(col("landing_date")), "month").as("mx"))
    val complete = Reshape.completeMonths(agg, Seq("district"), "month", bounds)
    Reshape.unpivot(complete, Seq("district", "month"),
      Seq("n_trips", "med_cpue", "med_rpue", "med_price_kg"))
  }

  /** Top-5 species + "Other" per site with catch share
    * (R/export.R:644-667).
    */
  def speciesComposition(validated: DataFrame, topN: Int = 5): DataFrame = {
    val sums = validated.filter(col("catch_taxon").isNotNull)
      .groupBy(col("landing_site"), col("catch_taxon"))
      .agg(sum(col("catch_kg")).as("kg"))
    val w = Window.partitionBy(col("landing_site"))
      .orderBy(col("kg").desc, col("catch_taxon").asc)
    val wt = Window.partitionBy(col("landing_site"))
    sums.withColumn("rn", row_number().over(w))
      .withColumn("taxon",
        when(col("rn") <= topN, col("catch_taxon")).otherwise(lit("Other")))
      .groupBy(col("landing_site"), col("taxon"))
      .agg(sum(col("kg")).as("kg"))
      .withColumn("pct", round(col("kg") / sum(col("kg")).over(wt) * 100.0, 2))
  }

  /** Nested per-trip catch document (catch_df → MongoDB,
    * R/export.R:417-437): collect_list of structs, JSON-serialized.
    */
  def nestedCatchDocs(validated: DataFrame): DataFrame =
    validated.groupBy(col("submission_id"))
      .agg(to_json(sort_array(collect_list(struct(
        col("n_catch"), col("catch_taxon"), col("length"),
        col("individuals"), col("catch_kg"))))).as("catch_df"))
}
