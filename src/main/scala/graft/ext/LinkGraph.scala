package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Link-graph analytics in EXACT integer fixed-point — PageRank as the
  * canonical centrality/quality prior (link-based quality weighting of
  * crawled sources is a standard ingredient of web-corpus curation).
  *
  * Distributed float PageRank is not reproducible (per-partition sum
  * order varies), so ranks are integer MICRO-units of 1e-12 total mass:
  * init = 1e12 div n, one step is
  * `rank' = (15·(1e12 div n)) div 100 + (85·Σ floor(rank_u div deg_u)) div 100`
  * — every operation an integer floor, so the result is bit-identical
  * at any parallelism AND in any engine (the DuckDB oracle chains the
  * same step). The simplification is the textbook one: dangling-node
  * mass is dropped rather than redistributed (mirrored by the oracle).
  *
  * Scale shape: per iteration, one join of ranks to edges on `src`
  * (both sides hash-partitioned on the node id — a real deployment
  * would bucket both tables on it once) and one groupBy(dst) with
  * map-side partial sums. Ranks are locally checkpointed each step so
  * the plan stays one-iteration deep — same eager-iteration contract as
  * [[Dedup.duplicateComponents]].
  */
object LinkGraph {

  /** @param edges directed DISTINCT (src, dst) pairs
    * @param iters number of power-iteration steps (plan depth is O(1)
    *              per step — checkpointed)
    */
  def pageRankMicro(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the caller's edge derivation fans out into eDeg (twice: list +
    // degree agg) and nodes — persist it so it computes once (same
    // lesson as triangleCounts; q115's edges are an orders-lineitem
    // join + distinct that used to run twice)
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    // out-degree is loop-invariant: join it into the edge list ONCE so
    // each iteration is a single ranks-to-edges join, not two
    val eDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist(lvl)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist(lvl)
    try {
      val n = nodes.count()
      val init = 1000000000000L / n
      val base = (15L * init) / 100L
      var ranks = nodes.withColumn("rank", lit(init)).checkpointEager()
      for (_ <- 1 to iters) {
        val contrib = eDeg.join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rank div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr("85 * coalesce(s, cast(0 as bigint)) div 100")).as("rank"))
          .checkpointEager()
      }
      ranks.select(col("id").as("node_id"), col("rank").as("rank_micro"))
    } finally { eDeg.unpersist(false); nodes.unpersist(false); e.unpersist(false) }
  }

  /** WEIGHTED PageRank with the same exact-integer floor discipline as
    * [[pageRankMicro]]: node u flows `(rank_u · w_e) div W_u` along
    * each out-edge e, where `W_u = Σ w` over u's out-edges — link
    * strength (co-occurrence counts, click weights) steers the mass
    * instead of splitting it uniformly. Every operation is an integer
    * floor on non-negative operands, so the result is bit-identical at
    * any parallelism and in any engine; `w = 1` everywhere degenerates
    * to exactly [[pageRankMicro]] (spec-pinned).
    *
    * Same scale shape: the weight sum is loop-invariant and joined
    * into the edge list once; per iteration one ranks-to-edges join +
    * one groupBy(dst) partial-sum; ranks eagerly checkpointed.
    *
    * @param edges directed (src, dst, w) rows with POSITIVE integer
    *              weights, at most one edge per (src, dst);
    *              `rank · w` must fit in 64 bits — with total mass
    *              1e12 that caps w at ~9e6, far above any count-like
    *              weight
    */
  def pageRankWeightedMicro(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst"), col("w")).persist(lvl)
    val eW = e.join(e.groupBy(col("src")).agg(sum(col("w")).as("wsum")), "src")
      .persist(lvl)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist(lvl)
    try {
      val n = nodes.count()
      val init = 1000000000000L / n
      val base = (15L * init) / 100L
      var ranks = nodes.withColumn("rank", lit(init)).checkpointEager()
      for (_ <- 1 to iters) {
        val contrib = eW.join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("(rank * w) div wsum").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr("85 * coalesce(s, cast(0 as bigint)) div 100")).as("rank"))
          .checkpointEager()
      }
      ranks.select(col("id").as("node_id"), col("rank").as("rank_micro"))
    } finally { eW.unpersist(false); nodes.unpersist(false); e.unpersist(false) }
  }

  /** Synchronous label propagation (community detection), `rounds`
    * fixed iterations: every node adopts the MOST FREQUENT label among
    * its neighbors, ties to the smallest label, isolated semantics like
    * [[Dedup.duplicateComponents]] (a node with no neighbors keeps its
    * own id). Fixed round count + deterministic tie-break = the
    * reproducible form of LPA (async/random-order variants are not
    * replayable); any engine chains the same two steps.
    *
    * Per round: one edges-to-labels equi-join + one (dst, label) count
    * + one per-node argmax — all map-side-combining shuffles on node
    * ids. Labels are checkpointed per round (bounded lineage, the
    * [[pageRankMicro]] contract).
    */
  def labelPropagation(pairs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one round")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .checkpointEager()
    val nodes = edges.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("label", col("id")).checkpointEager()
    for (_ <- 1 to rounds) {
      val freq = edges
        .join(labels.select(col("id").as("src"), col("label").as("nl")), "src")
        .groupBy(col("dst").as("id"), col("nl"))
        .agg(count(lit(1)).as("c"))
      val adopted = freq
        .groupBy(col("id"))
        .agg(min_by(col("nl"), struct((-col("c")).as("negc"), col("nl"))).as("label"))
      labels = nodes.join(adopted, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
        .checkpointEager()
    }
    labels.select(col("id").as("node_id"), col("label"))
  }

  /** Bounded-hop BFS from a seed set: the shortest hop-distance from
    * any seed to every node within `maxHops` — k-hop neighborhoods /
    * reachability (crawl-frontier expansion, spam-distance from a
    * trusted core, feature extraction "distance to nearest seed").
    * Exact integers throughout; the oracle's min-relaxation CTE chain
    * reproduces it bit-for-bit because unit-weight BFS and repeated
    * min-relaxation converge to the same distances.
    *
    * Scale shape: FRONTIER iteration, not whole-set relaxation — each
    * hop joins only the nodes discovered in the previous hop to the
    * edge list (settled nodes never re-expand; with unit weights a
    * distance never improves after first discovery), then one
    * `left_anti` against the settled set. All shuffles are equi-joins
    * on the node id; the settled/frontier sets are eagerly
    * checkpointed per hop ([[pageRankMicro]] contract).
    *
    * @param edges   directed (src, dst) pairs
    * @param seeds   (id) rows, distance 0; duplicates tolerated
    * @param maxHops number of expansion rounds (plan depth O(1)/round)
    * @return (node_id, dist) for every node within maxHops of a seed
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "at least one hop")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    try {
      var settled = seeds.select(col("id")).distinct()
        .withColumn("dist", lit(0L)).checkpointEager()
      var frontier = settled
      var hop = 1
      while (hop <= maxHops && !frontier.isEmpty) {
        val discovered = e.join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(settled, Seq("id"), "left_anti")
          .withColumn("dist", lit(hop.toLong))
          .checkpointEager()
        settled = settled.unionByName(discovered).checkpointEager()
        frontier = discovered
        hop += 1
      }
      settled.select(col("id").as("node_id"), col("dist"))
    } finally { e.unpersist(false); () }
  }

  /** Bounded-round WEIGHTED shortest paths (Bellman–Ford relaxation,
    * min-plus semiring) from a seed set: `rounds` synchronous passes of
    * `dist'(v) = min(dist(v), min over edges (u,v) of dist(u) + w)` —
    * the weighted generalization of [[bfsDistances]]. Unlike BFS there
    * is NO settled set: a longer-hop path may still be cheaper, so
    * every round relaxes the full current table (correct to the exact
    * shortest distance once `rounds` ≥ the shortest-path hop diameter;
    * with fewer rounds the semantics are "cheapest path within k
    * hops" — deterministic either way, which is what the oracle's
    * chained min-relaxation CTEs replay).
    *
    * Scale: per round one equi-join (edges ⋈ dist on src) + one
    * min-groupBy — both shuffle on node ids; dist is checkpointed per
    * round (bounded lineage, the [[graft.ops.Exec.checkpointEager]]
    * contract). Exact non-negative integer weights.
    *
    * @param edges (src, dst, w) directed, w a non-negative long
    * @param seeds (id) — distance 0 sources
    * @return (node_id, dist) for nodes reachable within `rounds` hops
    */
  def weightedShortestPaths(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one round")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst"), col("w")).persist(lvl)
    try {
      var dist = seeds.select(col("id")).distinct()
        .withColumn("dist", lit(0L)).checkpointEager()
      for (_ <- 1 to rounds) {
        val relaxed = e.join(dist.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy(col("id")).agg(min(col("dist")).as("dist"))
          .checkpointEager()
      }
      dist.select(col("id").as("node_id"), col("dist"))
    } finally { e.unpersist(false); () }
  }

  /** Fixed-round k-core PEELING: repeatedly drop nodes of degree < k
    * (with their edges) for exactly `rounds` iterations — the
    * degeneracy/cohesion filter (spam farms and long-tail leaf nodes
    * fall out; the dense core that survives is where community
    * signals live). Fixed round count = the reproducible form, same
    * discipline as [[labelPropagation]]/[[pageRankMicro]]: converged
    * or not, any engine chaining the same `rounds` peels gets the
    * identical node set, and once a peel removes nothing further
    * rounds are no-ops (Spark exits early; the result still equals
    * the oracle's full chain).
    *
    * Per round: one degree groupBy + two `left_semi` edge filters —
    * all equi-shuffles on node ids, edges re-checkpointed per round
    * (bounded lineage).
    *
    * @param pairs undirected edges as (id_a, id_b); normalized and
    *              deduplicated here
    * @return (node_id, deg) for nodes surviving `rounds` peels, with
    *         their degree in the surviving subgraph
    */
  def kCorePeel(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var e = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .checkpointEager()
    var r = 1
    var stable = false
    while (r <= rounds && !stable) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("id"))
      val e2 = e
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .checkpointEager()
      stable = e2.count() == e.count()
      e = e2
      r += 1
    }
    degrees(e).select(col("id").as("node_id"), col("deg"))
  }

  /** Per-node triangle counts by degree-ordered orientation — the
    * clustering/community-density signal over co-occurrence graphs
    * (co-purchased parts, co-cited pages). Exact integer counting, so
    * any engine reproduces it bit-for-bit.
    *
    * The scale trick is the classical orientation bound: direct every
    * undirected edge from its lower-(degree, id) endpoint to the higher
    * one, build wedges only from ORIENTED out-edges, and close them
    * against the oriented edge list. Out-degree under this orientation
    * is O(sqrt(m)) regardless of raw degree skew — a hub of degree d
    * contributes wedges only toward its few higher-degree peers, so the
    * wedge set (the only super-linear intermediate) is O(m^1.5) worst
    * case instead of sum(deg^2), and every join is a plain equi-shuffle
    * (wedges on the pivot node, closure on the (v, w) pair). Each
    * triangle materializes exactly once, at its lowest-ranked vertex.
    *
    * @param pairs undirected edges as (id_a, id_b) rows; duplicates,
    *              orientation, and self-loops are normalized away
    * @return (node_id, n_triangles) for every node on >= 1 triangle
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist the normalized edge set: it fans out into THREE consumers
    // (both degree scans and the orientation join), and its upstream —
    // the caller's edge derivation — is typically the expensive part
    // (measured 11 s -> ~4 s on q128, whose edges come from a fact-table
    // self-join that would otherwise re-execute per branch)
    val und = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(lvl)
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // a < b by normalization, so ties in degree keep the a -> b direction
    val oriented = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"))
      .persist(lvl)
    try {
      val wedges = oriented.select(col("src").as("u"), col("dst").as("v"))
        .join(oriented.select(col("src").as("u"), col("dst").as("w")), "u")
        .filter(col("v") =!= col("w"))
      // the closing edge exists oriented v -> w for exactly ONE of the two
      // (v, w)/(w, v) wedge twins, so the inner join is also the dedup
      val tri = wedges.join(
        oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      tri.select(explode(array(col("u"), col("v"), col("w"))).as("node_id"))
        .groupBy(col("node_id")).agg(count(lit(1)).as("n_triangles"))
        .checkpointEager()
    } finally { oriented.unpersist(false); und.unpersist(false) }
  }

  /** PERSONALIZED PageRank with the [[pageRankMicro]] exact-integer
    * floor discipline: teleport mass returns only to the SEED set, so
    * rank measures proximity to the seeds along links — the "expand
    * from a trusted whitelist" crawl-frontier prior (seed a few vetted
    * sources, rank the rest by how much seed mass flows to them), and
    * the standard related-item score on bipartite graphs.
    *
    *   init_v = 1e12 div |S| on seeds, 0 elsewhere
    *   rank'_v = (15·(1e12 div |S|)) div 100 · [v ∈ S]
    *           + (85·Σ_{u→v} (rank_u div deg_u)) div 100
    *
    * Every operation an integer floor — bit-identical at any
    * parallelism and in any engine. Same per-iteration shape as the
    * global variant (one ranks-to-edges join + one groupBy(dst)); the
    * seed membership joins as a broadcast flag.
    *
    * @param seeds 1-column (id) seed set, distinct
    */
  def pageRankPersonalizedMicro(edges: DataFrame, seeds: DataFrame,
                                iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    val eDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist(lvl)
    val sd = seeds.toDF("id").distinct().persist(lvl)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(broadcast(sd.withColumn("is_seed", lit(true))), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .persist(lvl)
    try {
      val nSeeds = sd.count()
      require(nSeeds >= 1, "need at least one seed")
      val init = 1000000000000L / nSeeds
      val base = (15L * init) / 100L
      var ranks = nodes
        .withColumn("rank", when(col("is_seed"), lit(init)).otherwise(lit(0L)))
        .select(col("id"), col("rank")).checkpointEager()
      for (_ <- 1 to iters) {
        val contrib = eDeg.join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rank div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (when(col("is_seed"), lit(base)).otherwise(lit(0L))
              + expr("85 * coalesce(s, cast(0 as bigint)) div 100")).as("rank"))
          .checkpointEager()
      }
      ranks.select(col("id").as("node_id"), col("rank").as("rank_micro"))
    } finally {
      nodes.unpersist(false); sd.unpersist(false)
      eDeg.unpersist(false); e.unpersist(false)
    }
  }

  /** Degree assortativity of an undirected graph (pass both edge
    * directions): the Pearson correlation, across edges, of the two
    * endpoint degrees — positive r = hubs link hubs (social-network
    * shape), negative = hubs link leaves (bipartite / infrastructure
    * shape). The five sufficient moments are EXACT integer sums over
    * the edge list (degree ≤ n keeps every product far inside 64 bits
    * for any graph whose edge list fits a cluster); the statistic is
    * one shared-shape double at the end.
    *
    * One degree aggregation + two broadcast-sized joins of the degree
    * table back onto edges + one total aggregation.
    *
    * @return 1 row: (n_edges, sxy, sx, sy, sxx, syy, r_micro)
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val m = e
      .join(deg.select(col("id").as("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dy")), "dst")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    val n = col("n_edges").cast("double")
    val cov = col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / n
    val vx = col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / n
    val vy = col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / n
    m.select(col("n_edges"), col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"),
      when(vx > 0.0 && vy > 0.0,
        round(cov / sqrt(vx) / sqrt(vy) * 1000000, 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("r_micro"))
  }

  /** Conductance of a vertex partition: for each group S,
    * `cut(S) / min(vol(S), vol(V∖S))` where cut counts edges with
    * exactly one endpoint in S and vol sums degrees — the spectral-
    * quality audit for any blocking/clustering the engine produced
    * (IVF cells, label groups, brand families): low conductance =
    * the partition respects the graph's community structure.
    *
    * One degree aggregation, two id-keyed joins of the assignment onto
    * the edge list, then group-sized arithmetic. Exact integers until
    * the single micro-rounded ratio; groups whose smaller side has
    * zero volume yield null.
    *
    * @param edges  undirected edges, each ONCE with `id_a < id_b`
    * @param assign (id, grp) vertex partition
    * @return (grp, n_nodes, vol, cut_edges, conductance_micro)
    */
  def partitionConductance(edges: DataFrame, assign: DataFrame): DataFrame = {
    val e = edges.select(col("id_a"), col("id_b"))
    val tagged = e
      .join(assign.select(col("id").as("id_a"), col("grp").as("ga")), "id_a")
      .join(assign.select(col("id").as("id_b"), col("grp").as("gb")), "id_b")
      // shared-input checkpoint, lazy result (the markovStationary
      // lesson: eager result materialization loses AQE)
      .checkpointEager()
    val cut = tagged.filter(col("ga") =!= col("gb"))
      .select(explode(array(col("ga"), col("gb"))).as("grp"))
      .groupBy(col("grp")).agg(count(lit(1)).as("cut_edges"))
    val deg = tagged.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val vol = deg.join(assign, "id").groupBy(col("grp"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("vol"))
    val tot = tagged.agg((count(lit(1)) * 2).as("tot_vol"))
    vol.join(cut, Seq("grp"), "left")
      .na.fill(0L, Seq("cut_edges"))
      .crossJoin(broadcast(tot))
      .withColumn("mv", least(col("vol"), col("tot_vol") - col("vol")))
      .select(col("grp"), col("n_nodes"), col("vol"), col("cut_edges"),
        when(col("mv") > 0L,
          round(col("cut_edges").cast("double") * 1000000.0
            / col("mv").cast("double"), 0).cast("long"))
          .otherwise(lit(null).cast("long")).as("conductance_micro"))
  }

  /** Fixed-round k-core PEEL: each round removes every node whose
    * degree among SURVIVORS is below `k`; after `rounds` rounds the
    * survivors approximate (and, once a round removes nothing, exactly
    * equal) the k-core — the standard "dense interaction core"
    * extraction. Fixed rounds rather than convergence detection keep
    * the computation a pure function both engines replay identically;
    * callers size `rounds` to the expected peel depth (each round is
    * one semi-join + one degree aggregation, eagerly checkpointed).
    *
    * @param edges undirected edge list given in BOTH directions
    * @return (node_id, core_degree) for surviving nodes
    */
  def kCorePeel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col("src"), col("dst")).persist(lvl)
    try {
      var alive = e0.select(col("src").as("id")).distinct().checkpointEager()
      for (_ <- 1 to rounds) {
        val survEdges = e0
          .join(alive.select(col("id").as("src")), "src")
          .join(alive.select(col("id").as("dst")), "dst")
        alive = survEdges.groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select(col("id")).checkpointEager()
      }
      e0.join(alive.select(col("id").as("src")), "src")
        .join(alive.select(col("id").as("dst")), "dst")
        .groupBy(col("src").as("node_id")).agg(count(lit(1)).as("core_degree"))
    } finally e0.unpersist(false)
  }

  /** HITS hubs & authorities in the same exact integer fixed-point
    * discipline as [[pageRankMicro]]: per round, authority = Σ of hub
    * scores over IN-edges, hub = Σ of the new authority scores over
    * OUT-edges, each renormalized to a 1e6 max by an integer floor
    * division (all operands non-negative, so Spark `div` ≡ DuckDB `//`).
    * On a bipartite source→target graph this is the classic "good hubs
    * cite good authorities" quality prior (query-independent HITS) —
    * the complement of PageRank's single-score view.
    *
    * Scale shape per round: two edge-to-score joins + two groupBy
    * partial sums, all hash-keyed on node ids; the normalizer is a
    * 1-row aggregate broadcast back; scores eagerly checkpointed so
    * the plan stays one-round deep. Nodes with no in-edges hold
    * authority 0, nodes with no out-edges hold hub 0 (never renormed
    * into existence — the oracle replays the identical floors).
    *
    * @param edges directed DISTINCT (src, dst) pairs
    * @return (node_id, hub_micro, auth_micro)
    */
  def hitsMicro(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist(lvl)
    try {
      nodes.count() // materialize before the loop's repeated scans
      def renorm(raw: DataFrame, vCol: String): DataFrame = {
        val mx = raw.agg(max(col(vCol)).as("mx"))
        raw.crossJoin(broadcast(mx))
          .select(col("id"),
            when(col("mx") > 0, expr(s"$vCol * 1000000 div mx"))
              .otherwise(lit(0L)).as(vCol))
      }
      var hub = nodes.withColumn("h", lit(1000000L)).checkpointEager()
      var auth = nodes.withColumn("a", lit(0L))
      for (_ <- 1 to iters) {
        val aRaw = nodes.join(
            e.join(hub.withColumnRenamed("id", "src"), "src")
              .groupBy(col("dst").as("id")).agg(sum(col("h")).as("s")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("s"), lit(0L)).as("a"))
        auth = renorm(aRaw, "a").checkpointEager()
        val hRaw = nodes.join(
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
              .groupBy(col("src").as("id")).agg(sum(col("a")).as("s")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("s"), lit(0L)).as("h"))
        hub = renorm(hRaw, "h").checkpointEager()
      }
      nodes.join(hub, "id").join(auth, "id")
        .select(col("id").as("node_id"), col("h").as("hub_micro"),
          col("a").as("auth_micro"))
    } finally { nodes.unpersist(false); e.unpersist(false) }
  }

  /** Adamic–Adar link prediction over a bipartite edge set: for every
    * pair of right-side nodes sharing a left-side neighbor, the sum of
    * `1/ln(deg(neighbor))` over the common neighbors — rarer shared
    * neighbors count more. Per-term values are rounded to micro-units
    * BEFORE the integer sum (the exact-sum discipline), so the score is
    * engine-identical.
    *
    * `maxDeg` is the scale lever: a left node of degree d fans out d²
    * pairs, so hub neighbors are dropped above the cap (they carry the
    * least signal anyway — exactly the df-cap trade the banded
    * containment screen documents). Degree-1 neighbors are excluded
    * (no pair, and ln 1 = 0 would divide by zero).
    *
    * @return (id_a, id_b, n_common, score_micro), top `k` by score
    */
  def adamicAdarTopK(edges: DataFrame, k: Int, maxDeg: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxDeg)
      .withColumn("term_micro",
        round(lit(1000000.0) / log(col("deg").cast("double")), 0).cast("long"))
    val ed = e.join(broadcast(deg), "src")
    ed.select(col("src"), col("dst").as("id_a"), col("term_micro"))
      .join(ed.select(col("src"), col("dst").as("id_b")), "src")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("term_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
  }

  /** Local clustering coefficient per node:
    * `2·T(v) / (deg(v)·(deg(v)−1))` from [[triangleCounts]] and the
    * degree table — "how tightly does each node's neighborhood close"
    * (the per-node reading of the global transitivity q128 reports).
    * Degree-1 nodes yield null (the coefficient is undefined).
    *
    * @param pairs undirected edges, each once with any orientation
    * @return (node_id, degree, n_triangles, coeff_micro)
    */
  def clusteringCoefficient(pairs: DataFrame): DataFrame = {
    val und = pairs.select(
      least(col("id_a"), col("id_b")).as("a"),
      greatest(col("id_a"), col("id_b")).as("b")).distinct()
      .checkpointEager()
    val deg = und.select(col("a").as("node_id"))
      .unionAll(und.select(col("b").as("node_id")))
      .groupBy(col("node_id")).agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(und.select(col("a").as("id_a"), col("b").as("id_b")))
    deg.join(tri, Seq("node_id"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("node_id"), col("degree"), col("n_triangles"),
        when(col("degree") >= 2L,
          round(col("n_triangles").cast("double") * 2000000.0
            / (col("degree") * (col("degree") - 1)).cast("double"), 0)
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("coeff_micro"))
  }

  /** Harmonic centrality of a seed panel within `maxHops`:
    * `H(s) = Σ_{v ≠ s reachable} 1/d(s,v)` with the per-seed labeled
    * min-relaxation (the [[bfsDistances]] rounds keyed by (seed, node)
    * so every seed carries its own distance field), reciprocal as the
    * engine-identical integer floor `1e6 div d`. Bounded: the state is
    * |seeds| × reached nodes; seeds are a panel by design.
    *
    * @param edges directed (src, dst) rows — pass both directions for
    *              an undirected reading
    * @return (seed, n_reached, harmonic_micro)
    */
  def harmonicCentrality(edges: DataFrame, seeds: DataFrame,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "hop budget out of range")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    try {
      var dist = seeds.select(col("id").as("seed"))
        .distinct()
        .withColumn("id", col("seed")).withColumn("dist", lit(0L))
        .checkpointEager()
      for (_ <- 1 to maxHops) {
        val relax = e.join(dist.withColumnRenamed("id", "src"), "src")
          .select(col("seed"), col("dst").as("id"),
            (col("dist") + 1L).as("dist"))
        dist = dist.unionByName(relax)
          .groupBy(col("seed"), col("id")).agg(min(col("dist")).as("dist"))
          .checkpointEager()
      }
      dist.filter(col("dist") > 0L)
        .groupBy(col("seed"))
        .agg(count(lit(1)).as("n_reached"),
          sum(expr("1000000 div dist")).as("harmonic_micro"))
    } finally e.unpersist(false)
  }

  /** k-truss decomposition step: iteratively remove edges supported by
    * fewer than `k − 2` triangles — the cohesive-subgraph mining
    * standard (tighter than k-core: every surviving edge sits in at
    * least k−2 triangles of surviving edges). Up to `rounds` prune
    * passes run, stopping EARLY at the fixpoint (a round that prunes
    * nothing — detected by comparing consecutive edge counts, which is
    * free on the per-round checkpoint; once a round removes no edge,
    * every later round recomputes identical support, so the early
    * return is bit-identical to running the full budget). The result
    * is the surviving edge set with the support counted in the final
    * executed round; if the budget was exhausted BEFORE the fixpoint
    * the peel cascade may not have converged — size `rounds` to the
    * graph (a fixpoint needs ≤ |E| rounds).
    *
    * Scale shape per round: triangle enumeration by degree-ordered
    * orientation (the [[triangleCounts]] wedge join — every triangle
    * materializes once, wedge fan-out bounded by the lower-degree
    * endpoint), support via one hash aggregate over 3·|triangles|
    * rows, prune is a filter. Each round checkpoints, so the plan
    * depth stays constant.
    *
    * @return surviving (id_a, id_b, support) canonical edges
    */
  def kTruss(pairs: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    require(rounds >= 1 && rounds <= 32, "round budget out of range")
    var und = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct().checkpointEager()
    var prevEdges = und.count()
    var converged = false
    var kept: DataFrame = null
    for (_ <- 1 to rounds if !converged) {
      val deg = und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dg"))
      // a < b by normalization, so degree ties keep the a -> b direction
      val oriented = und
        .join(deg.select(col("id").as("a"), col("dg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("dg").as("db")), "b")
        .select(
          when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
          when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"))
        .checkpointEager()
      val tri = oriented.select(col("src").as("u"), col("dst").as("v"))
        .join(oriented.select(col("src").as("u"), col("dst").as("w")), "u")
        .filter(col("v") =!= col("w"))
        .join(oriented.select(col("src").as("v"), col("dst").as("w")),
          Seq("v", "w"))
      val hits = tri.select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .unionAll(tri.select(least(col("u"), col("w")).as("a"),
          greatest(col("u"), col("w")).as("b")))
        .unionAll(tri.select(least(col("v"), col("w")).as("a"),
          greatest(col("v"), col("w")).as("b")))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
      kept = und.join(hits, Seq("a", "b"), "left")
        .na.fill(0L, Seq("support"))
        .filter(col("support") >= k - 2L)
        .checkpointEager()
      und = kept.select(col("a"), col("b"))
      val n = kept.count() // free: kept is checkpointed above
      converged = n == prevEdges
      prevEdges = n
    }
    kept.select(col("a").as("id_a"), col("b").as("id_b"), col("support"))
  }
}
