package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RobustBounds

/** The validation stage — flags 1–13 of `validate_surveys_*` (reference
  * R/validation.R:127-201, :361-400) plus the robust catch-bound flags
  * (get_catch_bounds_taxon, R/validation-functions.R:110-140),
  * re-expressed as codegen'd case_whens, one shuffle per rollup, and a
  * broadcast join of the per-group bounds.
  *
  * Null semantics follow §7.4: every `cpue > max`-style comparison is
  * null-safe (R's `!x == Inf` guard maps to isNotNull — Spark division
  * by zero already yields null, which is what the reference ultimately
  * wants).
  */
object Validation {

  val MaxBucketWeightKg = 45.0
  val MaxNBuckets = 30.0
  val MaxNIndividuals = 1000.0
  val PriceKgMax = 1500.0
  val CpueMax = 100.0
  val RpueMax = 2500.0
  val MznToUsd = 0.016

  private def flagWhen(cond: Column, code: String): Column =
    when(cond, lit(code)).otherwise(lit(null).cast("string"))

  /** Flags 1–7 on catch rows (catch_df schema: FIXTURES.md §3). */
  def catchFlags(catchDf: DataFrame): DataFrame =
    catchDf.select(
      col("submission_id"), col("submission_date"),
      flagWhen(col("catch_outcome") === "1" && col("catch_taxon").isNull, "1")
        .as("alert_form_incomplete"),
      flagWhen(col("catch_taxon").isNotNull &&
        (col("catch_kg") <= 0 || col("catch_kg").isNull) &&
        (col("individuals").isNull || col("individuals") <= 0), "2")
        .as("alert_catch_info_incomplete"),
      flagWhen(col("length").isNotNull && col("min_length").isNotNull &&
        col("length") < col("min_length"), "3").as("alert_min_length"),
      flagWhen(col("length").isNotNull && col("max_length_75").isNotNull &&
        col("length") > col("max_length_75"), "4").as("alert_max_length"),
      flagWhen(col("weight_bucket").isNotNull &&
        col("weight_bucket") > MaxBucketWeightKg, "5").as("alert_bucket_weight"),
      flagWhen(col("n_buckets").isNotNull && col("n_buckets") > MaxNBuckets, "6")
        .as("alert_n_buckets"),
      flagWhen(col("individuals").isNotNull && col("individuals") > MaxNIndividuals, "7")
        .as("alert_n_individuals"))

  /** Flags 12–13 on submission rows. */
  def generalFlags(surveys: DataFrame): DataFrame =
    surveys.select(
      col("submission_id"), col("submission_date"),
      flagWhen(col("trip_duration") <= 0 || col("trip_duration") >= 60, "12")
        .as("alert_duration"),
      flagWhen(col("submission_date") < col("landing_date"), "13").as("alert_date"))
      .distinct()

  /** The reference's NA-dropping comma concat (paste + str_remove_all of
    * NA pieces, R/validation.R:211-227): join non-null codes with ", ",
    * empty → null.
    */
  def concatFlags(cols: Seq[Column]): Column = {
    val joined = concat_ws(",", cols: _*) // concat_ws skips nulls
    when(joined === "", lit(null).cast("string")).otherwise(joined)
  }

  /** Per-submission alert rollup: full join of catch × general flags,
    * concat per row, then the conditional string-agg (all null → null,
    * A10).
    */
  def flagsPerSubmission(catchF: DataFrame, generalF: DataFrame): DataFrame = {
    val joined = catchF.join(generalF, Seq("submission_id", "submission_date"), "full")
      .distinct()
      .withColumn("alert_flag", concatFlags(Seq(
        col("alert_min_length"), col("alert_max_length"),
        col("alert_bucket_weight"), col("alert_n_buckets"),
        col("alert_n_individuals"), col("alert_form_incomplete"),
        col("alert_catch_info_incomplete"), col("alert_date"),
        col("alert_duration"))))
    joined.groupBy(col("submission_id"))
      .agg(
        min(col("submission_date")).as("submission_date"),
        sort_array(collect_set(col("alert_flag"))).as("fl"))
      .withColumn("alert_flag",
        when(size(col("fl")) === 0, lit(null).cast("string"))
          .otherwise(array_join(col("fl"), ", ")))
      .drop("fl")
  }

  /** Composite trip indicators (R/validation.R:330-360): per-submission
    * rollup with deterministic firsts, then cpue/rpue/price_kg. Divisions
    * by zero yield null (Spark), which downstream null-safe flags treat
    * as the reference treats Inf-guarded values.
    */
  def indicators(catchDf: DataFrame): DataFrame =
    catchDf.groupBy(col("submission_id"))
      .agg(
        min_by(struct(col("catch_outcome"), col("n_fishers"), col("trip_duration"),
          col("catch_price")), col("n_catch")).as("f"),
        sum(col("catch_kg")).as("catch_kg"))
      .select(
        col("submission_id"),
        col("f.catch_outcome").as("catch_outcome"),
        col("f.n_fishers").as("n_fishers"),
        (col("f.catch_price") / col("catch_kg")).as("price_kg"),
        (col("catch_kg") / col("f.n_fishers") / col("f.trip_duration")).as("cpue"),
        (col("f.catch_price") / col("f.n_fishers") / col("f.trip_duration")).as("rpue"))
      .withColumn("price_kg_usd", col("price_kg") * MznToUsd)
      .withColumn("rpue_usd", col("rpue") * MznToUsd)

  /** Flags 8–11 on composite indicators (null-safe per §7.4). */
  def compositeFlags(ind: DataFrame): DataFrame =
    ind.select(
      col("submission_id"),
      concatFlags(Seq(
        flagWhen(col("price_kg").isNotNull && col("price_kg") > PriceKgMax, "8"),
        flagWhen(col("cpue").isNotNull && col("cpue") > CpueMax, "9"),
        flagWhen(col("rpue").isNotNull && col("rpue") > RpueMax, "10"),
        flagWhen(col("n_fishers") === 0 && col("catch_outcome") === "1", "11")))
        .as("alert_flag_composite"))

  /** Robust per-group catch bounds (get_catch_bounds_taxon): LocScaleB on
    * catch_kg per gear × taxon, upper bound on the raw scale.
    */
  def catchBounds(catchDf: DataFrame, k: Double): DataFrame = {
    val f = RobustBounds.locScaleB(k)
    catchDf
      .filter(col("catch_taxon") =!= "other")
      .groupBy(col("gear"), col("catch_taxon"))
      .agg(f(col("catch_kg")).as("b"))
      .select(col("gear"), col("catch_taxon"), col("b.upper").as("upper_bound"))
  }

  /** Flag + null out catches above the robust bound (validate_catch_taxa,
    * R/validation-functions.R:150-205): bounds broadcast back onto rows.
    */
  def validateCatchTaxa(catchDf: DataFrame, k: Double): DataFrame =
    catchDf.join(broadcast(catchBounds(catchDf, k)), Seq("gear", "catch_taxon"), "left")
      .withColumn("alert_catch",
        flagWhen(col("catch_kg").isNotNull && col("upper_bound").isNotNull &&
          col("catch_kg") > col("upper_bound"), "14"))
      .withColumn("catch_kg",
        when(col("alert_catch").isNotNull, lit(null).cast("double"))
          .otherwise(col("catch_kg")))
      .drop("upper_bound")

  /** catch_outcome == "0" zeroing (R/validation.R:291-303): null-safe
    * if_else — a null outcome keeps the original value, like R's NA
    * falling through case_when.
    */
  def zeroNoCatch(df: DataFrame): DataFrame =
    df.withColumn("catch_kg",
        when(col("catch_outcome") === "0", 0.0).otherwise(col("catch_kg")))
      .withColumn("catch_price",
        when(col("catch_outcome") === "0", 0.0).otherwise(col("catch_price")))
}
