package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fishery indicator metrics — `calculate_fishery_metrics()` (reference
  * R/preprocessing-surveys.R:751-920): a normalized long table of
  * site×month metrics built from six branch aggregations and one
  * union-by-name:
  *
  *  - site means (avg fishers / avg catch per trip), unpivoted long (R4)
  *  - predominant gear: mode by trip count per site×month (A12) with a
  *    deterministic (count desc, gear asc) tie-break
  *  - pct_main_gear: mode count / total trips (A11/A13)
  *  - cpue/rpue means per site×month×gear
  *  - top-2 species by catch share with rank (W1/O3)
  *
  * R `na.rm = TRUE` sums map to Spark sums wrapped in coalesce(., 0)
  * where the reference's all-NA → 0 behavior matters (§7.4).
  */
object Metrics {

  def fisheryMetrics(validated: DataFrame): DataFrame = {
    val catchData = validated
      .filter(col("catch_outcome") === "1")
      .withColumn("year_month", trunc(col("landing_date"), "month"))
      .withColumnRenamed("district", "landing_site")
      .withColumnRenamed("catch_taxon", "species")

    val trip = catchData
      .groupBy(col("submission_id"), col("landing_date"), col("landing_site"),
        col("gear"), col("n_fishers"), col("year_month"))
      .agg(
        coalesce(sum(col("catch_kg")), lit(0.0)).as("trip_total_catch_kg"),
        coalesce(sum(col("catch_price")), lit(0.0)).as("trip_total_revenue"))

    val longCols = Seq("metric_type", "metric_value", "gear_type", "species", "rank")

    val siteLevel = trip
      .groupBy(col("landing_site"), col("year_month"))
      .agg(avg(col("n_fishers")).as("avg_fishers_per_trip"),
        avg(col("trip_total_catch_kg")).as("avg_catch_per_trip"))
      .selectExpr("landing_site", "year_month",
        "stack(2, 'avg_fishers_per_trip', avg_fishers_per_trip, " +
          "'avg_catch_per_trip', avg_catch_per_trip) as (metric_type, metric_value)")

    val gearCounts = trip
      .groupBy(col("landing_site"), col("year_month"), col("gear"))
      .agg(count(lit(1)).as("gear_count"))
      .withColumn("total_trips",
        sum(col("gear_count")).over(Window.partitionBy(col("landing_site"), col("year_month"))))
    val wMode = Window.partitionBy(col("landing_site"), col("year_month"))
      .orderBy(col("gear_count").desc, col("gear").asc)
    val mainGear = gearCounts
      .withColumn("rn", row_number().over(wMode)).filter(col("rn") === 1)
      .withColumn("pct_main_gear", col("gear_count") / col("total_trips") * 100.0)

    val predominant = mainGear.select(col("landing_site"), col("year_month"),
      lit("predominant_gear").as("metric_type"),
      lit(null).cast("double").as("metric_value"),
      col("gear").as("gear_type"))
    val pctMain = mainGear.select(col("landing_site"), col("year_month"),
      lit("pct_main_gear").as("metric_type"),
      col("pct_main_gear").as("metric_value"))

    val cpue = trip
      .withColumn("cpue", col("trip_total_catch_kg") / col("n_fishers"))
      .groupBy(col("landing_site"), col("year_month"), col("gear"))
      .agg(avg(col("cpue")).as("metric_value"))
      .select(col("landing_site"), col("year_month"),
        lit("cpue").as("metric_type"), col("metric_value"), col("gear").as("gear_type"))
    val rpue = trip
      .withColumn("rpue", col("trip_total_revenue") / col("n_fishers"))
      .groupBy(col("landing_site"), col("year_month"), col("gear"))
      .agg(avg(col("rpue")).as("metric_value"))
      .select(col("landing_site"), col("year_month"),
        lit("rpue").as("metric_type"), col("metric_value"), col("gear").as("gear_type"))

    val wRank = Window.partitionBy(col("landing_site"), col("year_month"))
      .orderBy(col("species_pct").desc, col("species").asc)
    val speciesPct = catchData
      .groupBy(col("landing_site"), col("year_month"), col("species"))
      .agg(coalesce(sum(col("catch_kg")), lit(0.0)).as("sp_catch"))
      .withColumn("site_catch",
        sum(col("sp_catch")).over(Window.partitionBy(col("landing_site"), col("year_month"))))
      .withColumn("species_pct", col("sp_catch") / col("site_catch") * 100.0)
      .withColumn("rank", row_number().over(wRank).cast("int"))
      .filter(col("rank") <= 2)
      .select(col("landing_site"), col("year_month"),
        lit("species_pct").as("metric_type"), col("species_pct").as("metric_value"),
        col("species"), col("rank"))

    Seq(siteLevel, predominant, pctMain, cpue, rpue, speciesPct)
      .map(_.select(col("*")))
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .orderBy(col("landing_site"), col("year_month"), col("metric_type"))
  }
}
