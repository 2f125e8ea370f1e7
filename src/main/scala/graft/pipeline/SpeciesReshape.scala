package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survey reshaping — the reference's signature workload re-expressed on
  * nested types instead of positional column names.
  *
  * The reference receives repeat groups encoded in column names
  * (`species_group.K.species_group/species_TL`, length bins as
  * `no_individuals_5_10` columns) and reshapes with pivot_longer
  * name-splitting + per-row expansion (`reshape_species_groups`,
  * reference R/survey-reshaping.R:25-86; `expand_length_frequency`
  * :182-239; midpoints R/preprocessing-surveys.R:200-213). Here the
  * ingest schema models the same data as
  * `ArrayType(StructType)` — `species_groups: array<struct<species,
  * counting_method, n_buckets, weight_bucket, catch_estimate,
  * length_bins: array<struct<length_class, n>>>>` — so the reshape is:
  *
  *  - `posexplode_outer(species_groups)` ≙ de-interleave (R6): pos+1 is
  *    the reference's `n_catch` counter; outer keeps empty submissions.
  *  - `explode_outer(length_bins)` ≙ expand_length_frequency (R10): a
  *    catch with no length rows keeps one row with null length.
  *  - midpoint decode ≙ the case_when at preprocessing-surveys.R:200-213.
  *
  * Both explodes are Generate nodes — per-row expansion inside codegen,
  * no shuffle at any data size.
  */
object SpeciesReshape {

  /** "5_10" → 7.5 etc.; "over60"-style single values pass through as
    * numeric (the reference's TRUE ~ as.numeric branch).
    */
  def lengthMidpoint(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bins = Seq(
      "5_10" -> 7.5, "10_15" -> 12.5, "15_20" -> 17.5, "20_25" -> 22.5,
      "25_30" -> 27.5, "30_35" -> 32.5, "35_40" -> 37.5, "40_45" -> 42.5,
      "45_50" -> 47.5, "50_55" -> 52.5, "55_60" -> 57.5)
    bins.foldLeft(when(lit(false), lit(null).cast("double"))) {
      case (acc, (k, v)) => acc.when(c === k, lit(v))
    }.otherwise(c.cast("double"))
  }

  /** Wide nested submissions → long catch rows (one row per species-group
    * per length bin; empty groups and binless catches survive as
    * null-filled rows). `carry` names extra submission-level columns to
    * keep alongside the exploded rows (e.g. district/month for the
    * chained incremental cycle) — carrying them through the Generate
    * nodes avoids a join-back rescan of the raw object.
    */
  def toLongCatches(raw: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val carryCols = carry.map(col)
    raw
      .select(col("submission_id") +: carryCols :+
        posexplode_outer(col("species_groups")).as(Seq("pos", "sg")): _*)
      .select(
        Seq(col("submission_id")) ++ carryCols ++ Seq(
          (col("pos") + 1).cast("long").as("n_catch"),
          col("sg.species").as("selected_species"),
          col("sg.counting_method").as("count_method"),
          col("sg.n_buckets").cast("double").as("n_buckets"),
          col("sg.weight_bucket").cast("double").as("weight_bucket"),
          col("sg.catch_estimate").cast("double").as("catch_estimate"),
          explode_outer(col("sg.length_bins")).as("bin")): _*)
      .select(
        Seq(col("submission_id")) ++ carryCols ++ Seq(
          col("n_catch"), col("selected_species"),
          col("count_method"), col("n_buckets"), col("weight_bucket"),
          col("catch_estimate"),
          lengthMidpoint(col("bin.length_class")).as("length"),
          col("bin.n").cast("double").as("individuals")): _*)
  }
}
