package graft

/** Driver-contract smoke: entry() yields rows; every declared query has
  * either an oracle or a documented reason not to (xxhash-based ops);
  * query names are unique across packs.
  */
class EntrySpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
  }

  test("a sample query from each pack runs at sf0.001") {
    Seq("q01_pricing_summary", "q19_gated_merge", "q23_filter_project",
      "q32_scaffold_complete", "q39_math_length_weight", "q46_dedup_jaccard")
      .foreach { q => assert(SparkEntry.queries(q)(spark, sfDir).count() >= 0) }
  }
}
