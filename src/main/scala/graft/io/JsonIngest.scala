package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Survey-submission JSON ingest (S1/S2) — the reference pulls paginated
  * KoboToolbox JSON and flattens each submission row-by-row into
  * positional column names (`flatten_row`, reference
  * R/ingestion.R:149-218). Spark-first: schema-on-read keeps the repeat
  * groups as `ArrayType(StructType)` (the §1.3 mapping) and downstream
  * reshaping explodes them — no name mangling, no per-row driver code.
  */
object JsonIngest {

  /** Submission schema: scalars + one repeat group, mirroring
    * FIXTURES.md §1 shapes.
    */
  val submissionSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("today", StringType),
    StructField("landing_date", StringType),
    StructField("survey_activity", StringType),
    StructField("catch_outcome", StringType),
    StructField("location", StringType), // "lat lon alt acc"
    StructField("species_group", ArrayType(StructType(Seq(
      StructField("species", StringType),
      StructField("counting_method", StringType),
      StructField("n_buckets", DoubleType),      // tolerant: absent → null
      StructField("weight_bucket", DoubleType),
      StructField("catch_estimate", DoubleType),
      StructField("length_bins", ArrayType(StructType(Seq(
        StructField("length_class", StringType),
        StructField("n", DoubleType)))))))))))

  def readSubmissions(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(submissionSchema).option("multiLine", true).json(path)
      .withColumnRenamed("_id", "submission_id")

  /** Ingest-time uniqueness assert (S1: reference aborts when submission
    * ids repeat, R/ingestion.R:45-50). One aggregate job; throws like the
    * reference's rlang::abort.
    */
  def assertUniqueIds(df: DataFrame, idCol: String = "submission_id"): DataFrame = {
    val r = df.agg(count(lit(1)).as("n"), countDistinct(col(idCol)).as("d")).head()
    require(r.getLong(0) == r.getLong(1),
      s"duplicate $idCol values: ${r.getLong(0)} rows, ${r.getLong(1)} distinct")
    df
  }

  /** GPS "lat lon alt acc" separation (R7 at ingest,
    * R/preprocessing-surveys.R:98-102).
    */
  def splitCoordinates(df: DataFrame, c: String = "location"): DataFrame =
    df.withColumn("lat", get(split(col(c), " "), lit(0)).cast("double"))
      .withColumn("lon", get(split(col(c), " "), lit(1)).cast("double"))
      .withColumn("alt", get(split(col(c), " "), lit(2)).cast("double"))
      .withColumn("acc", get(split(col(c), " "), lit(3)).cast("double"))
}
