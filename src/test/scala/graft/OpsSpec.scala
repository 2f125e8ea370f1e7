package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.{GatedMerge, NameStandardizer, Reshape}

/** Semantics of the packaged operators on hand-built fixtures
  * (SURVEY.md §5.2 golden corners: gated merge J11, greedy name
  * clustering §7.3, month-grid complete R9, unpivot∘pivot).
  */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("gated 1:1 merge joins only unique-unique key groups (J11)") {
    // day A: 1 left + 1 right -> join; day B: 2 left + 1 right -> pass
    // through; day C: left only -> left row with null right.
    val left = Seq(("A", 1), ("B", 2), ("B", 3), ("C", 4)).toDF("day", "lval")
    val right = Seq(("A", 10), ("B", 20), ("D", 30)).toDF("day", "rval")
    val got = GatedMerge.gatedOneToOne(left, right, Seq("day"))
      .orderBy($"day", $"lval".asc_nulls_first)
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got === Seq(
      ("A", Some(1), Some(10)),   // unique both sides -> joined
      ("B", None, Some(20)),      // right unique but left dup -> unjoined
      ("B", Some(2), None),
      ("B", Some(3), None),
      ("C", Some(4), None),       // left-only
      ("D", None, Some(30))))     // right-only
  }

  test("greedy name standardizer maps typos to the most frequent spelling") {
    val names = Seq("MARIA", "MARIA", "MARIA", "MARIIA", "MRIA", "JOSE", "JOSE", "JOS")
      .toDF("name")
    val got = NameStandardizer.standardize(spark, names, "name", maxDist = 2)
      .select($"name", $"name_canonical").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "MARIA" -> "MARIA", "MARIIA" -> "MARIA", "MRIA" -> "MARIA",
      "JOSE" -> "JOSE", "JOS" -> "JOSE"))
  }

  test("completeMonths fills the full key x month grid with nulls (R9)") {
    val agg = Seq(
      ("x", java.sql.Date.valueOf("2020-01-01"), 5L),
      ("y", java.sql.Date.valueOf("2020-03-01"), 7L)).toDF("k", "month", "n")
    val bounds = Seq((java.sql.Date.valueOf("2020-01-01"),
      java.sql.Date.valueOf("2020-03-01"))).toDF("mn", "mx")
    val got = Reshape.completeMonths(agg, Seq("k"), "month", bounds)
    assert(got.count() === 6) // 2 keys x 3 months
    assert(got.filter($"n".isNull).count() === 4)
  }

  test("unpivot then pivot_wider roundtrips (R1/R2)") {
    val df = Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("id", "m1", "m2")
    val long = Reshape.unpivot(df, Seq("id"), Seq("m1", "m2"))
    assert(long.count() === 4)
    val wide = long.groupBy($"id").pivot("metric", Seq("m1", "m2"))
      .agg(first($"value")).orderBy($"id")
    assert(wide.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
      === Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)))
  }

  test("cleanNames: snake_case, camelCase split, collisions uniquified") {
    val df = Seq((1, 2, 3, 4, 5)).toDF(
      "NOME DO AMOSTRADOR", "group_trip/PDS_IMEI", "landingSite", "ID", "id")
    assert(Reshape.cleanNames(df).columns.toSeq ===
      Seq("nome_do_amostrador", "group_trip_pds_imei", "landing_site", "id", "id_2"))
  }

  test("separatePiece returns null past the end (align_start)") {
    val df = Seq("1-URGENT", "plain").toDF("s")
    val got = df.select(
      Reshape.separatePiece($"s", "-", 0).as("a"),
      Reshape.separatePiece($"s", "-", 1).as("b")).collect()
    assert(got(0) === Row("1", "URGENT"))
    assert(got(1) === Row("plain", null))
  }

  test("expectations audit: NULL predicate counts as violation, one row per rule") {
    val df = Seq[(java.lang.Integer, String)]((5, "A"), (60, "N"), (null, "R"), (7, "X"))
      .toDF("qty", "flag")
    val rows = graft.ops.Expectations.audit(df, Seq(
        "qty_in_range" -> col("qty").between(1, 50),   // 60 fails, NULL fails
        "flag_known" -> col("flag").isin("A", "N", "R")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows("qty_in_range") === ((2L, 4L))) // 60 out of range + NULL tri-state
    assert(rows("flag_known") === ((1L, 4L)))   // "X"
    intercept[IllegalArgumentException] {
      graft.ops.Expectations.audit(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }
}
