package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.GatedMerge

/** GPS trip ↔ landing-survey merge — `merge_trips()` (reference
  * R/merge-trips.R:20-80): derive landing_date from the trip's `ended`
  * timestamp, then the gated 1:1 full join on (landing_date, imei): only
  * device-days with exactly one survey AND exactly one GPS trip merge;
  * ambiguous days pass through with the other side null.
  */
object MergeTrips {

  /** trips: (imei, started, ended, ...); surveys must carry
    * (landing_date: date, imei).
    */
  def mergeTrips(surveys: DataFrame, trips: DataFrame): DataFrame = {
    val t = trips
      .withColumn("landing_date", to_date(col("ended")))
      .withColumn("trip_duration_hrs",
        (unix_micros(col("ended")) - unix_micros(col("started"))) / 3600000000.0)
    GatedMerge.gatedOneToOne(surveys, t, Seq("landing_date", "imei"))
  }
}
