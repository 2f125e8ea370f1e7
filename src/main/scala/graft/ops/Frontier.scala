package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** 2-D Pareto frontier (skyline) under strict-both-coordinates dominance:
  * point p is dominated iff some q has BOTH q.x > p.x and q.y > p.y;
  * the frontier is every non-dominated distinct point.
  *
  * The reference surfaces best-trade-off rows (highest catch at most
  * recent date, `/root/reference/R/export.R` top-performer exports); the
  * skyline generalizes that to "every row not beaten on both axes" — the
  * standard curation query for quality-vs-recency or quality-vs-length
  * corpus triage.
  *
  * Scale posture: the classic sort-based skyline needs a GLOBAL cummax
  * over x-descending order — as a single global-order window that
  * collapses the table into one task. Here the cummax is the same
  * TWO-PHASE range-partitioned prefix the corpus prefix-sum operators
  * use ([[graft.ext.CorpusOps.packSequences]]): per-x max first (one
  * hash aggregation — the only pass over all points), then a
  * range-partitioned per-partition running max plus an O(#partitions)
  * single-row-per-partition offset pass. Wall-clock is two linear
  * passes at any data size.
  */
object Frontier {

  private val NegInf = Long.MinValue

  /** Frontier of the distinct (x, y) long-integer point set of `df`.
    * Output: the frontier points (x, y), one row each.
    */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // the distinct point set feeds BOTH the per-x table and the final
    // dominance probe — persist it or the distinct shuffle (the full
    // pass over all input points) executes twice
    val pts = df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per x; bound(x) = max y over strictly greater x decides
    // dominance for EVERY point at x, so the prefix runs on the per-x
    // table, not the point set
    val perX = pts.groupBy(col("x")).agg(max(col("y")).as("maxy"))

    // two-phase exclusive prefix max over x DESC. The range partitioner
    // samples with an rdd-dependent seed, so both consumers (local
    // window + per-partition totals) must see one materialized set of
    // boundaries — persist before branching (same contract as
    // CorpusOps.packSequences).
    val base = perX.repartitionByRange(p, col("x").desc)
      .withColumn("part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val localBefore = Window.partitionBy(col("part")).orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val partBefore = Window.orderBy(col("part"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = base.groupBy(col("part")).agg(max(col("maxy")).as("pmax"))
        .select(col("part"),
          coalesce(max(col("pmax")).over(partBefore), lit(NegInf)).as("poffset"))
      val bounds = base
        .withColumn("local_before",
          coalesce(max(col("maxy")).over(localBefore), lit(NegInf)))
        .join(broadcast(offsets), "part")
        .select(col("x"),
          greatest(col("local_before"), col("poffset")).as("bound"))
      pts.join(bounds, "x")
        .filter(col("y") >= col("bound"))
        .select(col("x"), col("y"))
        .checkpointEager()
    } finally {
      base.unpersist(false)
      pts.unpersist(false)
    }
  }
}
