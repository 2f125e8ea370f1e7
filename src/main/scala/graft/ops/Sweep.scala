package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Sweep-line interval analytics: peak concurrency per group over a set
  * of half-open integer intervals `[start, end)`.
  *
  * The textbook algorithm sorts all boundary events and takes a running
  * sum of +1/−1 deltas — per group, a GLOBAL-order prefix sum, which as
  * a single `Window.partitionBy(grp).orderBy(t)` puts each group's whole
  * event list in one task (the hot group = the whole corpus at 100 TB).
  * Here the prefix sum is TWO-PHASE like every global prefix in this
  * engine ([[graft.ext.CorpusOps.packSequences]]): range-partition by
  * (grp, t, delta), per-partition running sums, then offset each
  * partition by the per-(group, partition) totals of the partitions
  * before it — an O(#partitions · #groups-per-partition) single pass.
  *
  * Tie semantics: boundaries sort by (t, delta), so at equal t the −1
  * ends precede the +1 starts (half-open intervals never overlap when
  * one ends where the other begins). Within a run of EQUAL (t, delta)
  * rows the running values depend on arbitrary intra-tie order, but the
  * per-group MAX is permutation-invariant: a run of −1s is monotone
  * decreasing and a run of +1s monotone increasing, so the maximum is
  * always attained at a tie-group boundary — which is why only the max
  * (not row-level running values) is part of the operator's contract.
  */
object Sweep {

  /** Peak concurrency and interval count per group.
    *
    * @param intervals (grp, start, end) — long integers, half-open;
    *                  rows with end ≤ start are dropped (zero/negative
    *                  length never occupies the timeline)
    * @param broadcastOffsets the per-(partition, group) offsets table is
    *                  O(#partitions · #groups-per-partition) rows —
    *                  broadcast-sized for type-cardinality groups (the
    *                  default). A group-explosion regime (millions of
    *                  groups) sets this false and the offsets join
    *                  becomes a plain shuffle equi-join on
    *                  (partition, group) instead — same rows, same
    *                  contract, spec-pinned equal
    */
  def maxConcurrency(intervals: DataFrame,
      broadcastOffsets: Boolean = true): DataFrame = {
    val spark = intervals.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val iv = intervals.select(col("grp"), col("start").cast("long"),
        col("end").cast("long"))
      .filter(col("end") > col("start"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deltas = iv.select(col("grp"), col("start").as("t"), lit(1L).as("delta"))
        .unionByName(iv.select(col("grp"), col("end").as("t"), lit(-1L).as("delta")))
      val base = deltas.repartitionByRange(p, col("grp"), col("t"), col("delta"))
        .withColumn("part", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val local = Window.partitionBy(col("part"), col("grp"))
          .orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perPartGrp = base.groupBy(col("part"), col("grp"))
          .agg(sum(col("delta")).as("ptotal"))
        val prevParts = Window.partitionBy(col("grp")).orderBy(col("part"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = perPartGrp.select(col("part"), col("grp"),
          coalesce(sum(col("ptotal")).over(prevParts), lit(0L)).as("poffset"))
        val peaks = base
          .withColumn("run_local", sum(col("delta")).over(local))
          .join(if (broadcastOffsets) broadcast(offsets) else offsets,
            Seq("part", "grp"))
          .groupBy(col("grp"))
          .agg(max(col("run_local") + col("poffset")).as("max_concurrency"))
        val counts = iv.groupBy(col("grp")).agg(count(lit(1)).as("n_intervals"))
        counts.join(peaks, "grp")
          .select(col("grp"), col("n_intervals"), col("max_concurrency"))
          .checkpointEager()
      } finally base.unpersist(false)
    } finally iv.unpersist(false)
  }

  /** Total COVERED time per group — the measure of the union of the
    * group's intervals (uptime from overlapping sessions, portfolio
    * "any position open" time). Sweep formulation: between consecutive
    * boundaries, the timeline is covered iff the running interval
    * count is positive, so
    * `covered = Σ (t_next − t) · [run > 0]`.
    *
    * Same TWO-PHASE prefix discipline as [[maxConcurrency]], plus the
    * two-phase form of `lead`: within a range partition the next
    * boundary comes from a local window; the LAST row of each
    * (partition, group) run patches its successor from a bounded
    * per-(partition, group) HEADS table (first boundary of each
    * partition, next-present-partition lookup via one window over that
    * small table). Tie runs contribute zero length, so the sum is
    * invariant to intra-tie order — the same permutation argument as
    * the concurrency max.
    */
  def coveredTime(intervals: DataFrame): DataFrame = {
    val spark = intervals.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val iv = intervals.select(col("grp"), col("start").cast("long"),
        col("end").cast("long"))
      .filter(col("end") > col("start"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deltas = iv.select(col("grp"), col("start").as("t"), lit(1L).as("delta"))
        .unionByName(iv.select(col("grp"), col("end").as("t"), lit(-1L).as("delta")))
      val base = deltas.repartitionByRange(p, col("grp"), col("t"), col("delta"))
        .withColumn("part", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val local = Window.partitionBy(col("part"), col("grp"))
          .orderBy(col("t"), col("delta"))
        val perPartGrp = base.groupBy(col("part"), col("grp"))
          .agg(sum(col("delta")).as("ptotal"), min(col("t")).as("head_t"))
        val byPart = Window.partitionBy(col("grp")).orderBy(col("part"))
        val meta = perPartGrp.select(col("part"), col("grp"),
          coalesce(sum(col("ptotal")).over(
            byPart.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as("poffset"),
          lead(col("head_t"), 1).over(byPart).as("next_head_t"))
        val covered = base
          .withColumn("run", sum(col("delta")).over(
            local.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("nt_local", lead(col("t"), 1).over(local))
          .join(broadcast(meta), Seq("part", "grp"))
          .withColumn("nt", coalesce(col("nt_local"), col("next_head_t")))
          .groupBy(col("grp"))
          .agg(sum(when(col("run") + col("poffset") > 0, col("nt") - col("t"))
            .otherwise(0L)).as("covered"))
        val counts = iv.groupBy(col("grp")).agg(count(lit(1)).as("n_intervals"))
        counts.join(covered, "grp")
          .select(col("grp"), col("n_intervals"), col("covered"))
          .checkpointEager()
      } finally base.unpersist(false)
    } finally iv.unpersist(false)
  }
}
