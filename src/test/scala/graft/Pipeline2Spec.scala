package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{ApiExport, Metrics, StatusSync}

/** Fishery metrics, API export, and validation-status sync semantics on
  * hand fixtures (golden corners from the reference).
  */
class Pipeline2Spec extends SparkTestBase {
  import spark.implicits._

  private val validated = Seq(
    // site A, Jan: 2 trips, gear mix net/net/line -> predominant net
    ("t1", "2024-01-05", "A", "net", 2.0, "RAB", 10.0, 100.0, "1"),
    ("t1", "2024-01-05", "A", "net", 2.0, "OCZ", 5.0, 50.0, "1"),
    ("t2", "2024-01-07", "A", "line", 1.0, "RAB", 3.0, 30.0, "1"),
    ("t3", "2024-01-09", "A", "net", 2.0, "SAR", 2.0, 20.0, "1"),
    // site B, Feb: single trip; catch_outcome 0 rows are excluded
    ("t4", "2024-02-02", "B", "net", 4.0, "RAB", 8.0, 80.0, "1"),
    ("t5", "2024-02-03", "B", "net", 4.0, "RAB", 9.0, 90.0, "0"))
    .toDF("submission_id", "landing_date", "district", "gear", "n_fishers",
      "catch_taxon", "catch_kg", "catch_price", "catch_outcome")
    .withColumn("landing_date", to_date($"landing_date"))

  test("fishery metrics: predominant gear, shares, top-2 species rank") {
    val m = Metrics.fisheryMetrics(validated).cache()
    val predA = m.filter($"landing_site" === "A" && $"metric_type" === "predominant_gear")
      .select("gear_type").as[String].head()
    assert(predA === "net") // 2 of 3 trips
    val pct = m.filter($"landing_site" === "A" && $"metric_type" === "pct_main_gear")
      .select("metric_value").as[Double].head()
    assert(math.abs(pct - 200.0 / 3.0) < 1e-9)
    val sp = m.filter($"landing_site" === "A" && $"metric_type" === "species_pct")
      .select($"species", $"rank", $"metric_value").collect()
    assert(sp.length === 2) // top-2 only
    assert(sp.find(_.getInt(1) == 1).get.getString(0) === "RAB") // 13/20 kg
    // outcome-0 rows excluded entirely
    assert(m.filter($"landing_site" === "B" && $"metric_type" === "avg_catch_per_trip")
      .select("metric_value").as[Double].head() === 8.0)
  }

  test("api export: trip ids, per-trip totals on rows, distinct") {
    val pre = Seq(
      ("s1", "2024-01-05", "1", "11", "D1", "22", "D2", 1.0, 1.0, 0.0, 5.0, "net",
        "canoe", "1", "1", "RAB", "Siganus", 12.5, 10.0, 100.0),
      ("s1", "2024-01-05", "1", "11", "D1", "22", "D2", 1.0, 1.0, 0.0, 5.0, "net",
        "canoe", "1", "2", "OCZ", "Octopus", 30.0, 5.0, 100.0))
      .toDF("submission_id", "landing_date", "catch_outcome", "gaul_1_code", "gaul_1_name",
        "gaul_2_code", "gaul_2_name", "no_men_fishers", "no_women_fishers", "no_child_fishers",
        "trip_duration", "gear", "vessel_type", "habitat", "n_catch", "alpha3_code",
        "scientific_name", "length", "catch_kg", "catch_price")
      .withColumn("landing_date", to_date($"landing_date"))
    val api = ApiExport.toApiTrips(pre, "asset123").cache()
    assert(api.select("trip_id").distinct().as[String].collect().toSeq === Seq("TRIP_s1"))
    assert(api.select("n_fishers").as[Double].collect().forall(_ === 2.0))
    assert(api.select("tot_catch_kg").as[Double].collect().forall(_ === 15.0))
    assert(api.count() === 2)
  }

  test("status sync: manual approvals never overwritten; clean skips approved") {
    val flags = Seq(
      ("s1", Some("3, 5"), "alice"), ("s2", None, "bob"),
      ("s3", Some("9"), "carol"), ("s4", None, "dave"))
      .toDF("submission_id", "alert_flag", "submitted_by")
    val status = Seq(
      ("s3", StatusSync.Approved, "human_reviewer"), // manual: never flip
      ("s4", StatusSync.Approved, StatusSync.SystemUser)) // already approved
      .toDF("submission_id", "validation_status", "validated_by")
    val (toFlag, toApprove) = StatusSync.planUpdates(flags, status)
    assert(toFlag.as[String].collect().toSet === Set("s1")) // s3 protected
    assert(toApprove.as[String].collect().toSet === Set("s2")) // s4 skipped

    val rec = StatusSync.reconcile(flags, status)
      .select($"submission_id", $"validation_status").as[(String, String)]
      .collect().toMap
    assert(rec("s1") === StatusSync.NotApproved)
    assert(rec("s2") === StatusSync.Approved)
    assert(rec("s3") === StatusSync.Approved) // human decision preserved

    val pushed = StatusSync.pushStatuses(spark, toFlag, StatusSync.NotApproved, 0) { _ => true }
    assert(pushed.select("ok").as[Boolean].collect().forall(identity))
  }
}
