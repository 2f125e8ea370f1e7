package graft

import org.apache.spark.sql.functions._
import graft.ops.WideReshape
import graft.pipeline.SpeciesReshape

/** Wide positional-name reshaping (reference R/survey-reshaping.R:25-86):
  * golden corners on a hand-built wide frame, plus the bridge to the
  * array-typed reshape — the same data expressed wide and nested must
  * produce the same long rows.
  */
class WideReshapeSpec extends SparkTestBase {
  import spark.implicits._

  private val sp = "species_group"

  test("wide species_group.K columns reshape to long with n_catch = K + 1") {
    val wide = Seq(
      // sub 1: two groups; pos-1 missing the buckets field entirely
      (1L, Some("RAG"), Some("3"), Some("OCZ"), Some("x")),
      // sub 2: only pos 0
      (2L, Some("TUN"), None, None, None),
      // sub 3: fully empty -> dropped
      (3L, None, None, None, None),
      // sub 4: gap — pos 0 empty, pos 1 present -> n_catch 2 only
      (4L, None, None, Some("CRB"), Some("y")))
      .toDF("submission_id",
        s"$sp.0.$sp/selected_species", s"$sp.0.$sp/n_buckets",
        s"$sp.1.$sp/selected_species", s"$sp.1.$sp/note")
    val got = WideReshape.reshapeSpeciesGroups(wide)
      .orderBy($"submission_id", $"n_catch")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
        Option(r.getString(3)), Option(r.getString(4))))
      .toSeq
    // fields in first-seen order: selected_species, n_buckets, note;
    // n_buckets null-fills at pos 1, note null-fills at pos 0
    assert(got === Seq(
      (1L, 1L, Some("RAG"), Some("3"), None),
      (1L, 2L, Some("OCZ"), None, Some("x")),
      (2L, 1L, Some("TUN"), None, None),
      (4L, 2L, Some("CRB"), None, Some("y"))))
  }

  test("wide reshape agrees with the array-typed reshape on the same data") {
    // the same two submissions, wide vs nested; the nested path
    // (toLongCatches) explodes length bins too, so compare on the
    // group-level projection with bins folded back to one row per group
    val wide = Seq(
      (10L, Some("RAG"), Some("4"), Some("2"), Some("OCZ"), None: Option[String], None: Option[String]),
      (11L, Some("TUN"), None, Some("6"), None, None, None))
      .toDF("submission_id",
        s"$sp.0.$sp/species", s"$sp.0.$sp/no_fish_by_length_group/no_individuals_5_10",
        s"$sp.0.$sp/no_fish_by_length_group/no_individuals_10_15",
        s"$sp.1.$sp/species", s"$sp.1.$sp/no_fish_by_length_group/no_individuals_5_10",
        s"$sp.1.$sp/no_fish_by_length_group/no_individuals_10_15")
    val fromWide = WideReshape.reshapeSpeciesGroups(wide)
      .select($"submission_id", $"n_catch", $"species",
        col("no_fish_by_length_group/no_individuals_5_10").cast("double").as("n_5_10"),
        col("no_fish_by_length_group/no_individuals_10_15").cast("double").as("n_10_15"))
      .orderBy($"submission_id", $"n_catch").collect().toSeq

    val nested = Seq(
      (10L, Seq(("RAG", Seq(("5_10", 4L), ("10_15", 2L))), ("OCZ", Seq.empty[(String, Long)]))),
      (11L, Seq(("TUN", Seq(("10_15", 6L))))))
      .toDF("submission_id", "raw")
      .select($"submission_id", expr(
        "transform(raw, g -> named_struct(" +
          "'species', g._1, 'counting_method', CAST(NULL AS STRING), " +
          "'n_buckets', CAST(NULL AS DOUBLE), 'weight_bucket', CAST(NULL AS DOUBLE), " +
          "'catch_estimate', CAST(NULL AS DOUBLE), " +
          "'length_bins', transform(g._2, b -> named_struct('length_class', b._1, 'n', b._2))))")
        .as("species_groups"))
    val fromNested = SpeciesReshape.toLongCatches(nested)
      .groupBy($"submission_id", $"n_catch", $"selected_species".as("species"))
      .agg(
        max(when($"length" === 7.5, $"individuals")).as("n_5_10"),
        max(when($"length" === 12.5, $"individuals")).as("n_10_15"))
      .orderBy($"submission_id", $"n_catch").collect().toSeq

    assert(fromWide === fromNested)
  }
}
