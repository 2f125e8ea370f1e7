package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline._

/** Golden-pipeline tests (SURVEY.md §5.2): hand-built raw fixtures through
  * reshape → length-weight → validation → export, asserting the semantic
  * corners: midpoint mapping, OCZ /5.5 rule, bucket fallback, flags,
  * catch_outcome zeroing, monthly complete grid.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val binT = new StructType()
    .add("length_class", StringType).add("n", DoubleType)
  private val sgT = new StructType()
    .add("species", StringType).add("counting_method", StringType)
    .add("n_buckets", DoubleType).add("weight_bucket", DoubleType)
    .add("catch_estimate", DoubleType)
    .add("length_bins", ArrayType(binT))
  private val rawT = new StructType()
    .add("submission_id", StringType).add("species_groups", ArrayType(sgT))

  private def sg(species: String, bins: Seq[(String, Double)],
                 buckets: Option[(Double, Double)] = None): Row =
    Row(species, "count", buckets.map(_._1).orNull, buckets.map(_._2).orNull,
      null, if (bins.isEmpty) null else bins.map { case (k, v) => Row(k, v) })

  private val raw = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      // two catches, one with two length bins + an over-60 literal value
      Row("s1", Seq(
        sg("rabbitfish", Seq("5_10" -> 3.0, "10_15" -> 2.0)),
        sg("octopus", Seq("62" -> 1.0)))),
      // bucket-only catch (no bins -> one null-length row, bucket weight)
      Row("s2", Seq(sg("sardine", Nil, buckets = Some((2.0, 10.0))))),
      // empty submission (no species groups at all)
      Row("s3", null))), rawT)

  private val lw = Seq(
    ("RAB", 0.01, 3.0), ("OCZ", 0.02, 2.5)).toDF("catch_taxon", "a_6", "b_6")

  private val taxa = Seq(
    ("rabbitfish", "RAB"), ("octopus", "OCZ"), ("sardine", "SAR"))
    .toDF("selected_species", "catch_taxon")

  lazy val long = SpeciesReshape.toLongCatches(raw)
  lazy val calced = CatchCalc.calculateCatch(long.join(taxa, Seq("selected_species"), "left"), lw)

  test("reshape: positional de-interleave + outer bin expansion (R6/R10)") {
    val rows = long.orderBy($"submission_id", $"n_catch", $"length".asc_nulls_first).collect()
    // s1: 2 bins + 1 octopus bin = 3 rows; s2: 1 null-length row; s3: 1 empty row
    assert(rows.length === 5)
    val s3 = rows.find(_.getString(0) == "s3").get
    assert(s3.isNullAt(s3.fieldIndex("n_catch"))) // empty branch survives
    // midpoints: 5_10 -> 7.5, 10_15 -> 12.5; "62" -> 62.0 numeric passthrough
    val s1Lens = rows.filter(_.getString(0) == "s1")
      .map(r => Option(r.get(r.fieldIndex("length")))).flatten.toSet
    assert(s1Lens === Set(7.5, 12.5, 62.0))
  }

  test("length-weight: general law, OCZ /5.5, bucket fallback (J3 + math)") {
    val byKey = calced.collect()
      .map(r => (r.getString(r.fieldIndex("submission_id")),
        Option(r.get(r.fieldIndex("length"))),
        Option(r.get(r.fieldIndex("catch_kg"))))).toSeq
    // rabbitfish 7.5cm x3: 0.01*7.5^3*3/1000
    val w75 = byKey.collect { case ("s1", Some(7.5), kg) => kg }.head.get
    assert(math.abs(w75.asInstanceOf[Double] - 0.01 * math.pow(7.5, 3.0) * 3 / 1000) < 1e-12)
    // octopus 62cm: mantle length 62/5.5
    val oct = byKey.collect { case ("s1", Some(62.0), kg) => kg }.head.get
    assert(math.abs(oct.asInstanceOf[Double] - 0.02 * math.pow(62.0 / 5.5, 2.5) * 1 / 1000) < 1e-12)
    // sardine: no LW row -> bucket fallback 2x10
    val sar = byKey.collect { case ("s2", None, kg) => kg }.head.get
    assert(sar === 20.0)
  }

  test("validation: flags fire and concat correctly; zeroing on outcome 0") {
    val catchDf = Seq(
      // flag 3 (below min) + flag 5 (bucket weight > 45)
      ("v1", "2024-01-02", "2024-01-01", "1", "RAB", 5.0, 10.0, 60.0, 1.0, 50.0, 2.0, 1.2),
      // clean row
      ("v2", "2024-01-02", "2024-01-01", "1", "RAB", 20.0, 10.0, 60.0, 5.0, null.asInstanceOf[Double], null.asInstanceOf[Double], 3.4))
      .toDF("submission_id", "submission_date", "landing_date", "catch_outcome",
        "catch_taxon", "length", "min_length", "max_length_75", "individuals",
        "weight_bucket", "n_buckets", "catch_kg")
      .withColumn("submission_date", to_timestamp($"submission_date"))
      .withColumn("landing_date", to_timestamp($"landing_date"))
    val surveys = Seq(
      ("v1", "2024-01-02", 2.0), ("v2", "2024-01-02", 70.0))
      .toDF("submission_id", "submission_date", "trip_duration")
      .withColumn("submission_date", to_timestamp($"submission_date"))
      .withColumn("landing_date", to_timestamp(lit("2024-01-01")))
    val flags = Validation.flagsPerSubmission(
      Validation.catchFlags(catchDf), Validation.generalFlags(surveys))
      .collect().map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(flags("v1") === Some("3,5"))
    assert(flags("v2") === Some("12")) // duration 70 >= 60

    val zeroed = Validation.zeroNoCatch(
      Seq(("a", "0", 5.0, 100.0), ("b", "1", 5.0, 100.0))
        .toDF("id", "catch_outcome", "catch_kg", "catch_price"))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(zeroed("a") === ((0.0, 0.0)) && zeroed("b") === ((5.0, 100.0)))
  }

  test("export: monthly metrics complete the month grid (R9)") {
    val trips = Seq(
      ("t1", "2024-01-15", "north", 1.0, 2.0, 3.0),
      ("t2", "2024-03-10", "north", 2.0, 3.0, 4.0),
      ("t3", "2024-01-20", "south", 5.0, 6.0, 7.0))
      .toDF("submission_id", "landing_date", "district", "cpue", "rpue", "price_kg")
      .withColumn("landing_date", to_date($"landing_date"))
    val m = Export.monthlyMetrics(trips)
    // 2 districts x 3 months x 4 metrics
    assert(m.count() === 24)
    // south Feb+Mar rows exist with null values
    assert(m.filter($"district" === "south" && $"value".isNull).count() === 8)
  }

  test("export: top-N + Other composition shares sum to 100 (O4)") {
    val validated = Seq(
      ("x", "site1", "AAA", 10.0), ("x", "site1", "BBB", 5.0),
      ("x", "site1", "CCC", 3.0), ("x", "site1", "DDD", 2.0))
      .toDF("submission_id", "landing_site", "catch_taxon", "catch_kg")
    val comp = Export.speciesComposition(validated, topN = 2).collect()
    val other = comp.find(_.getString(1) == "Other").get
    assert(other.getDouble(2) === 5.0) // CCC+DDD
    assert(math.abs(comp.map(_.getDouble(3)).sum - 100.0) < 1e-9)
  }
}
