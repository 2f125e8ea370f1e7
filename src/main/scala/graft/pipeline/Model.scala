package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed models for the STABLE post-preprocess schemas (FIXTURES.md §3,
  * §6, §7) — the point in the pipeline where the reference's
  * schema-by-regex dynamism ends and compile-time field checks start
  * paying for themselves (SURVEY.md §1.3: `Dataset[T]` for stable
  * schemas, `DataFrame` for the raw stage).
  */
object Model {

  /** One catch row of the preprocessed landings table. */
  case class CatchRow(
      submission_id: String,
      landing_date: Date,
      district: String,
      gear: String,
      catch_taxon: Option[String],
      n_catch: Option[Long],
      length: Option[Double],
      individuals: Option[Double],
      catch_kg: Option[Double],
      catch_price: Option[Double],
      n_fishers: Option[Double],
      trip_duration: Option[Double],
      catch_outcome: Option[String])

  /** Per-submission validation flags (FIXTURES.md §7). */
  case class FlagRow(
      submission_id: String,
      submission_date: Timestamp,
      alert_flag: Option[String])

  /** GPS trip (FIXTURES.md §6). */
  case class GpsTrip(imei: String, started: Timestamp, ended: Timestamp)

  /** Typed per-trip rollup — the Dataset twin of the DataFrame rollups:
    * groupByKey + mapGroups with compile-time field access. Used where a
    * caller wants the type-safety contract; the DataFrame path stays the
    * default (codegen'd aggregates beat mapGroups).
    */
  case class TripSummary(submission_id: String, district: String,
                         catch_kg: Double, n_rows: Int)

  def tripSummaries(spark: SparkSession, rows: Dataset[CatchRow]): Dataset[TripSummary] = {
    import spark.implicits._
    rows.groupByKey(_.submission_id).mapGroups { (id, it) =>
      val xs = it.toSeq
      TripSummary(id, xs.head.district,
        xs.flatMap(_.catch_kg).sum, xs.size)
    }
  }

  def asCatchRows(spark: SparkSession, df: DataFrame): Dataset[CatchRow] = {
    import spark.implicits._
    df.as[CatchRow]
  }
}
