package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Per-group dense 1..n ranking WITHOUT a per-group global-order
  * window. `Window.partitionBy(grp).orderBy(...)` puts each group's
  * whole row set in one task — the hot group becomes the whole corpus
  * at 100 TB. Here ranks come from the engine's standard TWO-PHASE
  * prefix pattern ([[Sweep.maxConcurrency]],
  * [[graft.ext.CorpusOps.packSequences]]): range-partition by
  * (grp, order keys), per-partition local `row_number`, then offset
  * each partition by the count of same-group rows in the partitions
  * before it. The offsets table is one row per (partition, group)
  * actually present — broadcast-sized for type-cardinality groups; a
  * million-group regime would swap the broadcast for a shuffle join
  * (one-line change, same contract).
  *
  * The order keys must be a TOTAL order within each group (include a
  * unique tie-break key) — otherwise rank assignment within ties is
  * partition-placement-dependent. All keys must be non-null (range
  * partitioner and cross-engine NULL ordering both bite; callers
  * filter/coalesce first).
  */
object Ranks {

  /** Adds `rankCol` = 1-based rank of each row within its `grp`,
    * ordered by `orderCols` (must include a unique tie-break).
    */
  def twoPhaseRank(df: DataFrame, grpCol: String, orderCols: Seq[String],
      rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val ordCols: Seq[Column] = orderCols.map(col)
    val base = df
      .repartitionByRange(p, (col(grpCol) +: ordCols): _*)
      .withColumn("__part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val local = Window.partitionBy(col("__part"), col(grpCol))
        .orderBy(ordCols: _*)
      val perPartGrp = base.groupBy(col("__part"), col(grpCol))
        .agg(count(lit(1)).as("__pn"))
      val prevParts = Window.partitionBy(col(grpCol)).orderBy(col("__part"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = perPartGrp.select(col("__part"), col(grpCol),
        coalesce(sum(col("__pn")).over(prevParts), lit(0L)).as("__poffset"))
      base
        .withColumn("__rn", row_number().over(local).cast("long"))
        .join(broadcast(offsets), Seq("__part", grpCol))
        .withColumn(rankCol, col("__rn") + col("__poffset"))
        .drop("__part", "__rn", "__poffset")
        .checkpointEager() // materialize before unpersisting the base
    } finally { base.unpersist(false); () }
  }

  /** Adds `outCol` = running sum of `valueCol` over the GLOBAL order
    * `orderCols` (must be a total order) — same two-phase shape as
    * [[twoPhaseRank]] but for prefix sums: range-partition by the order
    * keys, per-partition local cumulative sum, then offset each
    * partition by the sum of all partitions before it. The only global
    * window left runs over the per-partition sums table —
    * `defaultParallelism` rows, bounded by the cluster not the data —
    * so a dimension that scales with the fact table (parts, users)
    * never funnels through one task the way a partition-less
    * `Window.orderBy` does.
    */
  def twoPhasePrefixSum(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val base = df
      .repartitionByRange(p, orderCols: _*)
      .withColumn("__part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val local = Window.partitionBy(col("__part")).orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perPart = base.groupBy(col("__part"))
        .agg(sum(valueCol).as("__psum"))
      // bounded global window: one row per partition
      val prevParts = Window.orderBy(col("__part"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = perPart.select(col("__part"),
        coalesce(sum(col("__psum")).over(prevParts), lit(0L)).as("__poffset"))
      base
        .withColumn("__lc", sum(valueCol).over(local))
        .join(broadcast(offsets), Seq("__part"))
        .withColumn(outCol, col("__lc") + col("__poffset"))
        .drop("__part", "__lc", "__poffset")
        .checkpointEager() // materialize before unpersisting the base
    } finally { base.unpersist(false); () }
  }

  /** Per-group inter-occurrence gap MOMENTS (count, Σg, Σg²) over the
    * global `orderCol` order — the burstiness/VMR building block —
    * without `Window.partitionBy(grp).orderBy(v)` over raw occurrence
    * rows (the hottest group, e.g. the token "the" over a corpus, would
    * land its entire occurrence stream in one task's sort). Same
    * two-phase shape as [[twoPhaseRank]]: range-partition by
    * (grp, order), per-slice local lag + moment aggregation, then the
    * slice-boundary gaps (last-of-previous-slice → first-of-this-slice)
    * from the per-(partition, group) summary table — one row per slice
    * a group touches, bounded by the cluster's partition count × the
    * (broadcast-sized) group panel, never by occurrence volume.
    *
    * `orderCol` must be integer-typed and a total order within each
    * group (ties would make gap attribution placement-dependent).
    *
    * @return (grpCol, n_gaps, sum_gap, sum_gap_sq) one row per group
    */
  def twoPhaseGapMoments(df: DataFrame, grpCol: String,
      orderCol: Column): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val base = df.select(col(grpCol), orderCol.cast("long").as("__v"))
      .repartitionByRange(p, col(grpCol), col("__v"))
      .withColumn("__part", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try twoPhaseGapMomentsPlan(base, grpCol).checkpointEager()
    finally { base.unpersist(false); () }
  }

  /** The lazy dataflow of [[twoPhaseGapMoments]] given the already
    * range-partitioned base (`grpCol`, `__v`, `__part`) — exposed so
    * the plan audit can assert the window keying without the
    * checkpoint boundary hiding the executed plan.
    */
  private[graft] def twoPhaseGapMomentsPlan(base: DataFrame,
      grpCol: String): DataFrame = {
    val local = Window.partitionBy(col("__part"), col(grpCol))
      .orderBy(col("__v"))
    val sliced = base
      .withColumn("__g", col("__v") - lag(col("__v"), 1).over(local))
      .groupBy(col("__part"), col(grpCol))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
        count(col("__g")).as("__ng"),
        sum(col("__g")).as("__sg"),
        sum(col("__g") * col("__g")).as("__sgg"))
    // boundary gaps over the bounded per-(slice, group) summary
    val wPrev = Window.partitionBy(col(grpCol)).orderBy(col("__part"))
    sliced
      .withColumn("__bg", col("__lo") - lag(col("__hi"), 1).over(wPrev))
      .groupBy(col(grpCol))
      .agg((sum(col("__ng")) + count(col("__bg"))).as("n_gaps"),
        (coalesce(sum(col("__sg")), lit(0L))
          + coalesce(sum(col("__bg")), lit(0L))).as("sum_gap"),
        (coalesce(sum(col("__sgg")), lit(0L))
          + coalesce(sum(col("__bg") * col("__bg")), lit(0L)))
          .as("sum_gap_sq"))
  }
}
