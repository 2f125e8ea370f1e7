package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // out-degree is loop-invariant: join it into the edge list ONCE so
    // each iteration is a single ranks-to-edges join, not two
    val e = edges.select(col("src"), col("dst"))
    val eDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist(lvl)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist(lvl)
    try {
      val n = nodes.count()
      val init = 1000000000000L / n
      val base = (15L * init) / 100L
      var ranks = nodes.withColumn("rank", lit(init)).localCheckpoint(true)
      for (_ <- 1 to iters) {
        val contrib = eDeg.join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rank div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr("85 * coalesce(s, cast(0 as bigint)) div 100")).as("rank"))
          .localCheckpoint(true)
      }
      ranks.select(col("id").as("node_id"), col("rank").as("rank_micro"))
    } finally { eDeg.unpersist(false); nodes.unpersist(false) }
  }
}
