package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Versioned

/** API export — `export_api_raw()` (reference R/api.R:62-140): trip ids,
  * fisher-count row sums, per-trip totals kept on every row (W4), column
  * relocation, distinct, and the versioned lz4 parquet write.
  *
  * The reference computes trip_id rowwise; here it is one codegen'd
  * concat. The rowSums over fisher columns null-treats like R
  * `rowSums(na.rm=T)` via coalesce-to-0 (§7.4).
  */
object ApiExport {

  def toApiTrips(preprocessed: DataFrame, surveyId: String): DataFrame = {
    val fisherCols = Seq("no_men_fishers", "no_women_fishers", "no_child_fishers")
    val nFishers = fisherCols.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
    val wTrip = Window.partitionBy(col("trip_id"))
    preprocessed
      .withColumn("trip_id", concat(lit("TRIP_"), col("submission_id")))
      .withColumn("survey_id", lit(surveyId))
      .withColumn("n_catch", col("n_catch").cast("int"))
      .withColumn("n_fishers", nFishers)
      .select(
        col("survey_id"), col("trip_id"), col("landing_date"),
        col("gaul_1_code"), col("gaul_1_name"), col("gaul_2_code"), col("gaul_2_name"),
        col("n_fishers"), col("trip_duration").as("trip_duration_hrs"),
        col("gear"), col("vessel_type"), col("habitat").as("catch_habitat"),
        col("catch_outcome"), col("n_catch"),
        col("alpha3_code").as("catch_taxon"), col("scientific_name"),
        col("length").as("length_cm"), col("catch_kg"),
        col("catch_price").as("tot_catch_price"))
      .withColumn("catch_price", lit(null).cast("double"))
      .withColumn("tot_catch_kg", sum(col("catch_kg")).over(wTrip))
      .distinct()
  }

  /** S5 — versioned lz4 parquet sink (arrow::write_parquet lz4,
    * R/api.R:133-138).
    */
  def writeApi(df: DataFrame, dir: String, prefix: String, tag: String): String =
    Versioned.writeLz4(df, dir, prefix, tag)
}
