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

  test("q76 packing plan: big-side window partitioned, one single-partition offset pass") {
    // the public operator checkpoints eagerly (persisted partitioned
    // base — see packSequences scaladoc), so audit the dataflow seam.
    // Exchange nodes are the ground truth the text-matching of window
    // specs couldn't give: a partition-less window over the documents
    // table would ADD an `Exchange SinglePartition`, so exactly one
    // (the O(#partitions) offsets pass) is the scalable shape.
    import org.apache.spark.sql.functions._
    val base = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"),
        graft.ext.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .repartitionByRange(8, col("id"))
      .withColumn("part", spark_partition_id())
      .persist()
    try {
      val df = graft.ext.CorpusOps.packSequencesPlan(base, 512)
      df.collect()
      // walk the FINAL adaptive plan tree — toString renders Initial AND
      // Final sections, so any text count double-counts every exchange
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition}
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => s +: walk(s.plan)
        case _ => p +: p.children.flatMap(walk)
      }
      val nodes = walk(df.queryExecution.executedPlan)
      val shuffles = nodes.collect { case e: ShuffleExchangeExec => e.outputPartitioning }
      val singles = shuffles.count(_ == SinglePartition)
      assert(singles === 1,
        s"expected exactly 1 single-partition exchange, got $singles ($shuffles)")
      // the big-side cumsum window keeps its partition key: its exchange
      // hash-partitions on `part`
      assert(shuffles.exists {
        case h: HashPartitioning => h.expressions.exists(_.toString.contains("part#"))
        case _ => false
      }, s"row cumsum window lost its partition key: $shuffles")
      assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
        s"offsets not broadcast: ${nodes.map(_.nodeName).distinct}")
    } finally base.unpersist()
  }

  test("q84 chunking plan has zero shuffles up to the presentation sort") {
    // the operator itself is a pure projection + Generate; the only
    // exchange the QUERY may contain is the final ORDER BY's range
    // repartition. A groupBy/join sneaking into the chunker would show
    // up as a hash-partitioned exchange here.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val df = SparkEntry.queries("q84_chunk_windows")(spark, sfDir)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val shuffles = walk(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e.outputPartitioning }
    assert(shuffles.forall(_.isInstanceOf[RangePartitioning]),
      s"non-sort shuffle in the chunking plan: $shuffles")
  }

  test("q45 exact dedup aggregates with map-side partial aggregation") {
    val plan = finalPlan("q45_dedup_exact")
    // two HashAggregates around one exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial aggregation:\n$plan")
  }

  test("q109 bloom screen broadcasts the bit set, never shuffles it") {
    val plan = finalPlan("q109_bloom_screen")
    assert(plan.contains("BroadcastHashJoin"), s"filter bits not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"bit-set join degenerated to sort-merge:\n$plan")
  }

  test("q118 expectations audit is ONE aggregation pass over the data") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val df = SparkEntry.queries("q118_expectations_audit")(spark, sfDir)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    // n rules must NOT mean n scans: the FK lookup broadcasts and the
    // only data shuffle is the single-partition final-agg gather
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e.outputPartitioning }
    assert(shuffles.count(_ == SinglePartition) === 1 &&
      shuffles.size <= 2, // AQE may stage the tiny final sort too
      s"expected one gather, got $shuffles")
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      s"supplier FK lookup not broadcast: ${nodes.map(_.nodeName).distinct}")
  }

  test("q90 as-of join is the union-merge window plan: one hash shuffle, no join node") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = SparkEntry.queries("q90_asof_join")(spark, sfDir)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    // the whole point of the union-merge formulation: NO join operator
    assert(!nodes.exists(_.nodeName.contains("Join")),
      s"as-of degenerated into a join: ${nodes.map(_.nodeName).distinct}")
    // exactly one hash-partitioned exchange (the window's shuffle on k);
    // anything more means a side shuffled twice
    val hashShuffles = nodes.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashShuffles.length === 1,
      s"expected 1 hash shuffle, got ${hashShuffles.length}")
    assert(nodes.exists(_.nodeName.contains("Window")), "no window operator")
  }

  test("q91 range join stays an equi-join with map-side partial aggregation") {
    val plan = finalPlan("q91_range_join_bins")
    // the bin trick must never fall back to a nested-loop/cartesian plan
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range predicate planned as nested loop:\n$plan")
    // pair rows are aggregated map-side: partial + final HashAggregate
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial aggregation over the pair stream:\n$plan")
  }

  test("q92 unigram model joins as a broadcast of the vocab-sized side") {
    val plan = finalPlan("q92_unigram_nll")
    assert(plan.contains("BroadcastHashJoin"),
      s"token-NLL model not broadcast:\n$plan")
  }

  test("q374 ring successor is a scalar HOF projection — no join at all") {
    val plan = finalPlan("q374_hash_ring")
    // the per-key successor lookup must never row-amplify: no nested
    // loop, no cartesian, and in fact NO join of any kind — both ring
    // sizes resolve inside one projection over a literal sorted array
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"ring assign row-amplifies:\n$plan")
  }

  test("q130 classifier broadcasts the weight table and never nest-loops") {
    val plan = finalPlan("q130_hashed_classifier")
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table not broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested loop in classifier plan:\n$plan")
  }

  test("q134 gap fill runs both neighbor frames on ONE exchange + ONE sort") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // audit the operator seam (the conformance query adds its
    // presentation ORDER BY, which is its own legitimate exchange)
    val ev = graft.core.Tables.events(spark, sfDir).select($"event_id", $"user_id",
      unix_micros($"ts").as("t"),
      when((($"ts".cast("long") + $"user_id") % 10) === 0, lit(null))
        .otherwise(round($"value" * 100, 0).cast("long")).as("v_cents"))
    val df = graft.ops.TimeSeries.fillInterpolate(ev, Seq("user_id"), "t", "v_cents")
    df.collect()
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles === 1, s"expected 1 exchange, got $shuffles:\n${df.queryExecution.executedPlan}")
    val sorts = nodes.count(_.nodeName.contains("Sort"))
    assert(sorts === 1, s"expected 1 sort for both frames, got $sorts")
  }

  test("q198 CUSUM seam: both Lindley frames and the final agg on ONE exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, sfDir).select(
      $"l_suppkey".as("sk"),
      $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
      $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
      $"l_quantity".cast("long").as("q"))
    val df = graft.ops.TimeSeries.cusumStats(li, "sk",
      Seq("sec", "ok", "ln", "q"), "q", k = 26L, h = 500L)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles === 1,
      s"expected 1 exchange (window + group agg co-keyed), got $shuffles:\n${df.queryExecution.executedPlan}")
    val sorts = nodes.count(_.nodeName.contains("Sort"))
    assert(sorts === 1, s"expected 1 sort for both frames, got $sorts")
  }

  test("q197 FIFO seam: join reuses the two cumsum-window partitionings") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .filter($"l_partkey" < 1000)
      .select($"l_partkey".as("pk"),
        $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
        $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
        $"l_quantity".cast("long").as("q"), $"l_returnflag".as("rf"))
    val df = graft.ops.Allocate.fifoMatch(
      li.filter($"rf" === "R").drop("rf"),
      li.filter($"rf" =!= "R").drop("rf"),
      "pk", Seq("sec", "ok", "ln", "q"), "q")
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => s +: walk(s.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles === 2,
      s"expected 2 exchanges (one per side; the equi-join must reuse them), got $shuffles:\n${df.queryExecution.executedPlan}")
  }

  test("q154 naive range join is binned by RangeJoinBinning — never a nested loop") {
    val plan = finalPlan("q154_range_join_rule")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pure range join fell back to a nested loop:\n$plan")
    // the rewrite's signature: a union of two equi-join arms on
    // computed bin keys, each still carrying the exact band filter
    assert(plan.contains("Union"), s"no two-arm union in the plan:\n$plan")
    val equiJoins = Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .map(n => n.r.findAllIn(plan).length).sum
    assert(equiJoins >= 2, s"expected 2 equi-join arms, got $equiJoins:\n$plan")
  }

  test("q155 stock intersect idiom lowers onto the two-pointer kernel") {
    val plan = finalPlan("q155_sorted_intersect_rule")
    assert(plan.contains("sorted_intersect_size"),
      s"SortedIntersectRewrite did not fire in the executed plan:\n$plan")
    assert(!plan.contains("array_intersect"),
      s"stock array_intersect survived next to the kernel:\n$plan")
  }

  test("q131 unigram model broadcasts under the default gate") {
    val plan = finalPlan("q131_bigram_backoff")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary-sized unigram side lost its broadcast:\n$plan")
  }

  test("q131 degrades to shuffle joins past the model broadcast gate, same rows") {
    // baseline under the default gate (vocab ≪ 10M rows → broadcast)
    val expected = SparkEntry.queries("q131_bigram_backoff")(spark, sfDir).collect()
    spark.conf.set(graft.ext.LangModel.BroadcastMaxRowsKey, "1")
    // kill Catalyst's own size-based broadcast so the plan shows what
    // the OPERATOR no longer forces (a web-scale vocab would be past
    // both thresholds anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q131_bigram_backoff")(spark, sfDir)
      val got = df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"gated model join did not degrade to a shuffle join:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"a forced broadcast survived the gate:\n$plan")
      assert(got.sameElements(expected),
        "broadcast gate changed q131's result rows")
    } finally {
      spark.conf.unset(graft.ext.LangModel.BroadcastMaxRowsKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q171 fact scan carries a dynamic partition pruning filter") {
    val plan = finalPlan("q171_dpp_join")
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the month-partitioned fact scan:\n$plan")
  }

  test("q173 runtime bloom filter semi-filters the fact before its shuffle") {
    val plan = finalPlan("q173_runtime_bloom_join")
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"no runtime bloom filter on the fact side:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"join was not the shuffle join this query forces:\n$plan")
  }

  test("q176 ORC read pushes the price filter and prunes partitions statically") {
    val plan = finalPlan("q176_orc_roundtrip")
    assert(plan.contains("GreaterThan(o_totalprice,100000.0)"),
      s"price predicate not pushed to the ORC reader:\n$plan")
    assert(plan.contains("PartitionFilters: [") && plan.contains("omonth"),
      s"month range not applied as partition filters:\n$plan")
  }

  test("q163 radius search joins on grid cells — never a quadratic pair plan") {
    val plan = finalPlan("q163_radius_neighbors")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"radius search degenerated to an all-pairs join:\n$plan")
  }

  test("q164 frontier prefix-max is range-partitioned, not one global window") {
    val plan = finalPlan("q164_pareto_frontier")
    assert(plan.contains("rangepartitioning"),
      s"two-phase prefix lost its range partitioning:\n$plan")
  }

  test("q186 bucketed tables sort-merge join with ZERO exchanges") {
    import org.apache.spark.sql.functions.col
    // AQE off so the executed plan is inspectable as one tree; same
    // bucket layout as the conformance query
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val wh = graft.core.Scratch.dir("q186_buckets_spec")
    graft.core.Tables.orders(s2, sfDir).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/ord").saveAsTable("q186t_ord")
    graft.core.Tables.customer(s2, sfDir).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/cust").saveAsTable("q186t_cust")
    val j = s2.table("q186t_cust")
      .join(s2.table("q186t_ord"), col("c_custkey") === col("o_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles — bucket pruning lost:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"scan does not report bucketed read:\n$plan")
  }

  test("q250 centroid pair join broadcasts the groups-sized side, never a cartesian") {
    val plan = finalPlan("q250_label_centroid_cosines")
    // the grp_a < grp_b pair predicate is non-equi — correct plan is a
    // BROADCAST nested loop over the groups-sized centroid table, and
    // the corpus-side dim aggregation partial-combines map-side
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"pair join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in centroid pair plan:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"dim sums not partial-aggregated:\n$plan")
  }

  test("q247 kappa is one aggregation pass: no join, no window, no extra shuffle") {
    val plan = finalPlan("q247_cohen_kappa")
    assert(!plan.contains("Join"), s"join leaked into kappa plan:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into kappa plan:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"confusion counts not partial-aggregated map-side:\n$plan")
  }

  test("q246 k-anonymity levels are pure hash aggregations — no window, no join") {
    val plan = finalPlan("q246_k_anonymity")
    assert(!plan.contains("Join"), s"join leaked into census plan:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into census plan:\n$plan")
  }

  test("q249 funnel never sort-merge joins — corpus collapses before the rules table") {
    val plan = finalPlan("q249_filter_funnel")
    assert(!plan.contains("SortMergeJoin"),
      s"rules-side join shuffled:\n$plan")
  }

  test("q288 panel scan broadcasts the anchors; corpus never shuffles for the pair join") {
    val plan = finalPlan("q288_label_noise")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"panel × corpus join not a broadcast NLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unbroadcast cartesian leaked in:\n$plan")
  }

  test("q267 ADC joins the codes table to a BROADCAST distance table") {
    val plan = finalPlan("q267_pq_adc")
    assert(plan.contains("BroadcastHashJoin"),
      s"distance-table join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unbroadcast cartesian leaked in:\n$plan")
  }

  test("q273 pooled rank goes through range repartitioning, not a global window") {
    val plan = finalPlan("q273_quantile_normalize")
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"two-phase rank's range exchange missing:\n$plan")
  }

  test("q276 scores all LOO models with broadcast constants — per-source tables never shuffle the token stream twice") {
    val plan = finalPlan("q276_source_influence")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source constants not broadcast:\n$plan")
  }

  test("q277 chunking scan reads only the three referenced columns") {
    // other suites cache() the full documents table; the shared-session
    // CacheManager would substitute that full-schema InMemoryRelation for
    // this query's pruned scan and the audit would see all five columns
    spark.catalog.clearCache()
    val plan = finalPlan("q277_cdc_chunks")
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse("")
    val readCols = readSchema.split(",").map(_.trim.takeWhile(_ != ':')).toSet
    assert(readCols === Set("doc_id", "text", "source"),
      s"scan reads wrong column set: $readCols")
    assert(plan.contains("cdc_cutpoints"),
      s"rolling-hash kernel missing from the plan:\n$plan")
  }

  test("q296 Shapley: coalition tables broadcast; the corpus never cartesians") {
    val plan = finalPlan("q296_shapley_players")
    // the 2^n lattice joins must be broadcast, and the only cross joins
    // are against single-row/lattice-sized broadcast sides
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast in the lattice joins:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"non-broadcast cartesian leaked into the Shapley plan:\n$plan")
  }

  test("q302 DBSCAN: candidate pairs come from the grid equi-join, never a cross join") {
    val plan = finalPlan("q302_dbscan_grid")
    assert(!plan.contains("CartesianProduct"),
      s"quadratic pair plan leaked into DBSCAN:\n$plan")
  }

  test("q309 cross-validation scores all folds in one pass — no per-fold scans") {
    // count LOGICAL parquet relations outside the persisted fragments:
    // the six model/score branches must resolve to InMemoryRelation hits,
    // not re-scan the corpus once per fold (plan strings expand cached
    // plans, so string-counting "Scan parquet" overcounts)
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = SparkEntry.queries("q309_crossval_nb")(spark, sfDir)
    df.collect()
    val scans = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }.length
    assert(scans <= 2,
      s"fold models are rescanning the corpus ($scans uncached parquet relations)")
  }

  test("q335 CKA gram builds from the id-keyed self-join, never a cartesian") {
    val plan = finalPlan("q335_cka_halves")
    assert(!plan.contains("CartesianProduct"),
      s"dims-squared gram went cartesian:\n$plan")
  }

  test("q326 change-point runs both prefix windows on the per-key sort") {
    val plan = finalPlan("q326_changepoint")
    assert(!plan.contains("CartesianProduct"))
    // the scoring and the argmax pick both partition by the key — no
    // partition-less global window over the fact table
    assert(!plan.contains("WindowExec: No Partition"),
      s"global window leaked into the per-key change-point:\n$plan")
  }

  test("q310 Dirichlet retrieval joins the corpus through the inverted index") {
    val plan = finalPlan("q310_dirichlet_ql")
    assert(!plan.contains("CartesianProduct"),
      s"query-likelihood scoring went quadratic:\n$plan")
  }

  test("q338 burstiness gaps never sort a token's full occurrence stream in one task") {
    // q338 runs green end-to-end...
    SparkEntry.queries("q338_token_burstiness")(spark, sfDir).collect()
    // ...and its gap operator plans the two-phase shape: the
    // occurrence-level window keys on (partition id, group); the only
    // single-key window sits ABOVE the per-(slice, group) aggregate —
    // bounded input, never the raw occurrence stream
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    // AQE wraps the executed plan in query stages `collect` can't
    // traverse — audit under a non-adaptive sibling session
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val occ = graft.core.Tables.documents(s2, sfDir)
      .selectExpr("doc_id",
        "posexplode(split(trim(text), '\\\\s+')) AS (pos, tok)")
      .selectExpr("tok", "CAST(doc_id * 1024 + pos AS LONG) AS __v")
    val p = s2.sparkContext.defaultParallelism
    val base = occ.repartitionByRange(p, col("tok"), col("__v"))
      .withColumn("__part", spark_partition_id())
    val plan = graft.ops.Ranks.twoPhaseGapMomentsPlan(base, "tok")
    plan.collect()
    val winExecs = plan.queryExecution.executedPlan.collect {
      case we: WindowExec => we
    }
    assert(winExecs.length == 2, s"expected 2 windows, got $winExecs")
    winExecs.foreach { we =>
      if (we.partitionSpec.length == 1)
        assert(we.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
          s"single-key window runs over raw occurrences:\n$we")
    }
    assert(winExecs.exists(_.partitionSpec.length >= 2),
      "occurrence-level window lost the partition-id key")
  }

  test("q383 Dawid-Skene: rater/prior tables broadcast; no shuffle-side join on the panel") {
    import org.apache.spark.sql.functions.{col, lit}
    val rows = (1L to 200L).flatMap(i => Seq(
      (i, 1L, i % 2 == 0), (i, 2L, i % 2 == 0), (i, 3L, (i % 2 == 0) != (i % 3 == 0))))
    val df = spark.createDataFrame(rows).toDF("item", "rater", "y")
      .repartition(8, col("item"))
    val out = graft.ops.Eval.dawidSkene(df, "item", "rater", "y", iters = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the per-rater and prior tables ride in as broadcasts (explicit
    // hints in the operator) — the labels⋈posterior join is the one
    // shuffle the algorithm owns; nothing goes cartesian
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("round-11 incremental cycles: every join is an equi-join, nothing cartesian") {
    // gated merge (q384), complete topology (q387), derived export
    // (q388), and the two deletion lanes (q385/q386): the touched-key
    // semi/anti joins and tombstone anti-joins must all plan as hash/
    // sort-merge equi-joins — a nested-loop fallback here would scale
    // O(state × delta) instead of O(touched)
    for (name <- Seq("q384_incremental_gated_merge", "q387_chained_trips",
        "q388_chained_export", "q385_dedup_delete",
        "q389_chained_takedown")) {
      val plan = finalPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name went cartesian:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name planned a nested loop:\n${plan.take(2000)}")
    }
    // the ANN deletion lane serves through ivfPqServe, whose one
    // deliberate BroadcastNestedLoopJoin is the bounded quantizer-table
    // attach (queries × m·k codebook rows — constants, the q376/q341
    // posture); the purge/candidate joins must still never cartesian
    val annPlan = finalPlan("q386_ann_delete")
    assert(!annPlan.contains("CartesianProduct"),
      s"q386 went cartesian:\n${annPlan.take(2000)}")
  }

  test("round-12 incremental cycles: every join is an equi-join, nothing cartesian") {
    // partitioned topology (q390) and the derived-export topologies
    // (q391/q392): partition-pruned state reads, touched-key semi/anti
    // joins, the submission-grain rollup join, and the comp/doc/export
    // three-way join must all plan as hash/sort-merge equi-joins
    for (name <- Seq("q390_partitioned_topology", "q391_topology_export",
        "q392_topology_export_takedown",
        "q394_partitioned_export_takedown")) {
      val plan = finalPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name went cartesian:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name planned a nested loop:\n${plan.take(2000)}")
    }
    // the BM25 serve's one deliberate BroadcastNestedLoopJoin is the
    // 1-row collection-stats attach (crossJoin(broadcast(stats)) — the
    // q350 posture); the purge/panel joins must still never cartesian
    val bmPlan = finalPlan("q393_bm25_delete")
    assert(!bmPlan.contains("CartesianProduct"),
      s"q393 went cartesian:\n${bmPlan.take(2000)}")
    // round-13 partitioned-store and manifest lanes: the band joins,
    // bucket-pruned purges, touched-month export derives, and the
    // manifest topology must all stay equi-join shaped (q397/q398 keep
    // the BM25 1-row stats BNLJ exemption)
    for (name <- Seq("q395_lsh_partitioned_store",
        "q396_lsh_partitioned_delete", "q399_touched_export",
        "q400_manifest_topology", "q403_snapshot_topology")) {
      val plan = finalPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name went cartesian:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name planned a nested loop:\n${plan.take(2000)}")
    }
    for (name <- Seq("q397_bm25_partitioned_index",
        "q398_bm25_partitioned_delete")) {
      val plan = finalPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name went cartesian:\n${plan.take(2000)}")
    }
  }

  test("round-13 continuation lanes: skipping reads, compaction, time travel and lookups plan as scans and equi-joins") {
    for (name <- Seq("q404_zonemap_skipping", "q405_stats_only_agg",
        "q406_zonemap_incremental", "q407_snapshot_compaction",
        "q408_zonemap_manifest", "q409_snapshot_time_travel",
        "q410_bloom_point_lookup", "q411_zonemap_zorder",
        "q412_content_lookup", "q413_snapshot_schema_evolution",
        "q414_merge_on_read_delete")) {
      val plan = finalPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name went cartesian:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name planned a nested loop:\n${plan.take(2000)}")
    }
  }
}
