package graft

/** 100 TB plan posture, asserted on the REAL conformance queries (not
  * synthetic fixtures): small-dim joins must broadcast (a sort-merge
  * shuffle of the fact side is the scale regression), scan-adjacent
  * predicates must reach the parquet reader, and projections must prune
  * the read schema. Guards against a refactor silently trading these
  * away — the correctness gate wouldn't notice, the cluster bill would.
  */
class PlanAuditSpec extends SparkTestBase {

  private def finalPlan(name: String): String = {
    // scan metadata (PushedFilters/ReadSchema) renders truncated at the
    // default 100 chars — widen so the assertions see the full lists
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // AQE: materialize so the plan below is the FINAL one
    df.queryExecution.executedPlan.toString
  }

  test("q13 lookup join broadcasts the dim side, never sort-merges") {
    val plan = finalPlan("q13_join_broadcast_lookup")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact-side shuffle join leaked in:\n$plan")
  }

  test("q14 5-way chain keeps every lookup join broadcast") {
    val plan = finalPlan("q14_join_chain_5way")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge join in the chain:\n$plan")
  }

  test("q23 pushes predicates into the scan and prunes columns") {
    val plan = finalPlan("q23_filter_project")
    // shipdate + discount range predicates reach the parquet reader
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("GreaterThanOrEqual(l_discount"),
      s"filters not pushed:\n$plan")
    // the scan reads only the 6 referenced columns, not all 11
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("")
    val readCols = readSchema.split(",").map(_.trim.takeWhile(_ != ':')).toSet
    assert(readCols === Set("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate", "l_tax"),
      s"scan reads wrong column set: $readCols")
  }

  test("q72 contamination semi-join broadcasts the benchmark shingle set") {
    // the public operator checkpoints eagerly (its explode inputs are
    // cached), so assert on the pre-checkpoint dataflow seam
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, sfDir)
    val cSh = graft.ext.Dedup.shingleDf(
      docs.filter(!col("source").isin("src0", "src1")), "doc_id", "text", 3)
    val bSh = graft.ext.Dedup.shingleDf(
      docs.filter(col("source").isin("src0", "src1")), "doc_id", "text", 3)
    val df = graft.ext.Dedup.contaminationCountsPlan(cSh, bSh)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark side not broadcast in semi-join:\n$plan")
  }

  test("q76 packing windows are partitioned; only the O(#partitions) offset pass is global") {
    val plan = finalPlan("q76_pack_sequences")
    // the per-row cumsum must be partitioned by the range-partition id —
    // a partition-less window over the document table is the
    // single-task plan that cannot scale
    val windows = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(windows.nonEmpty, s"no window in plan:\n$plan")
    val partitioned = windows.filter(_.contains("part#"))
    val global = windows.filterNot(_.contains("part#"))
    assert(partitioned.nonEmpty, s"row cumsum window lost its partition key:\n$plan")
    // the only global-order window is the per-partition offset pass,
    // which runs over #partitions rows, not documents — it must sit
    // under the broadcast side of the offsets join
    assert(global.size <= 1, s"unexpected global windows: $global")
    assert(plan.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$plan")
  }

  test("q45 exact dedup aggregates with map-side partial aggregation") {
    val plan = finalPlan("q45_dedup_exact")
    // two HashAggregates around one exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial aggregation:\n$plan")
  }
}
