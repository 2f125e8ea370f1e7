package graft

import java.sql.{Date, Timestamp}

import graft.pipeline.Model
import graft.pipeline.Model.{CatchRow, FlagRow}

/** Typed Dataset models: encoder round-trip and the typed rollup. */
class ModelSpec extends SparkTestBase {
  import spark.implicits._

  private def row(id: String, district: String, kg: Option[Double]) =
    CatchRow(id, Date.valueOf("2024-01-05"), district, "net", Some("RAB"),
      Some(1L), Some(12.5), Some(3.0), kg, Some(100.0), Some(2.0), Some(5.0), Some("1"))

  test("CatchRow encoder round-trips including None fields") {
    val ds = Seq(row("a", "north", Some(1.5)), row("b", "south", None)).toDS()
    val back = ds.collect()
    assert(back.length === 2)
    assert(back.find(_.submission_id == "b").get.catch_kg === None)
  }

  test("typed trip summaries aggregate per submission") {
    val ds = Seq(row("a", "north", Some(1.5)), row("a", "north", Some(2.5)),
      row("b", "south", None)).toDS()
    val sums = Model.tripSummaries(spark, ds).collect()
      .map(t => t.submission_id -> ((t.catch_kg, t.n_rows))).toMap
    assert(sums("a") === ((4.0, 2)))
    assert(sums("b") === ((0.0, 1)))
  }

  test("FlagRow dataset filters on optional alert flags") {
    val flags = Seq(
      FlagRow("a", Timestamp.valueOf("2024-01-05 00:00:00"), Some("3,5")),
      FlagRow("b", Timestamp.valueOf("2024-01-05 00:00:00"), None)).toDS()
    assert(flags.filter(_.alert_flag.isEmpty).map(_.submission_id).collect().toSeq === Seq("b"))
  }
}
