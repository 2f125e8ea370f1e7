package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer proration: split a fixed integer budget across the keys of
  * each group in proportion to a positive integer weight, with
  * LARGEST-REMAINDER rounding — `Σ alloc = budget` exactly, per group,
  * every time (the property float proration can't give). The classic
  * use-cases are seat apportionment, cost allocation, and sampling
  * budgets per shard/stratum ([[graft.ext.CorpusOps.stratumBudgetSelect]]
  * solves the dual problem: spend a budget down a ranked list).
  *
  * Method (Hamilton): `base = (budget·w) div W` floors each share, then
  * the `budget − Σ base` leftover units go one each to the keys with
  * the largest remainder `(budget·w) mod W`, ties broken by key
  * ascending — fully deterministic, exact 64-bit integer arithmetic on
  * non-negative operands, so any engine reproduces it bit-for-bit.
  *
  * Scale shape: one groupBy for W, one broadcast join back (group
  * cardinality = type cardinality), and one window ORDER BY remainder
  * within each group — bounded by the #keys-per-group, which is the
  * dimension table's size, not the fact table's. `budget·w` must fit
  * in 64 bits: budget ≤ 1e6 with cent-scale weights (≤ ~9e12 per key)
  * stays under 9.2e18 with room.
  */
object Allocate {

  /** @param df        one row per (grp, key) with its weight
    * @param grpCol    allocation group (budget is per-group)
    * @param keyCol    unique key within the group (tie-break order)
    * @param weightCol POSITIVE integer weight (rows with NULL or
    *                  non-positive weight get allocation 0 and do not
    *                  participate — the [[graft.ext.CorpusOps.weightedSample]]
    *                  guard, enforced here, not just documented)
    * @param budget    integer units to hand out per group
    * @return (grp, key, weight, alloc) — Σ alloc per group = budget
    *         when the group has ≥ 1 positive-weight key
    */
  def prorate(df: DataFrame, grpCol: String, keyCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val pos = df.select(col(grpCol), col(keyCol),
        col(weightCol).cast("long").as("weight"))
      .filter(col("weight").isNotNull && col("weight") > 0)
    val totals = pos.groupBy(col(grpCol)).agg(sum(col("weight")).as("wsum"))
    val based = pos.join(broadcast(totals), grpCol)
      .withColumn("base", expr(s"($budget * weight) div wsum"))
      .withColumn("rem", expr(s"($budget * weight) % wsum"))
    val leftover = Window.partitionBy(col(grpCol))
    val byRem = Window.partitionBy(col(grpCol))
      .orderBy(col("rem").desc, col(keyCol).asc)
    based
      .withColumn("leftover", lit(budget) - sum(col("base")).over(leftover))
      .withColumn("rk", row_number().over(byRem).cast("long"))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col(grpCol), col(keyCol), col("weight"), col("alloc"))
  }

  /** FIFO lot matching — the inventory-costing / queue-consumption
    * primitive: per key, consume supply lots in arrival order against
    * demands in arrival order, reporting how much of each demand each
    * lot fills. The classic imperative two-pointer walk becomes a pure
    * RELATIONAL interval-overlap join on cumulative quantities: lot i
    * occupies `[cumB_{i−1}, cumB_i)` on the key's supply axis, demand j
    * occupies `[cumD_{j−1}, cumD_j)` on the demand axis, and FIFO means
    * the two axes are THE SAME axis — matched(i,j) =
    * `max(0, min(bhi, dhi) − max(blo, dlo))`, i.e. plain 1-D interval
    * intersection. Exact non-negative integers throughout.
    *
    * Scale shape: one cumulative-sum window per side (both partitioned
    * by key — the join that follows is on the same key, so the
    * partitioning carries through with no extra exchange), then an
    * equi-join on key with the overlap range predicate. Per-key output
    * is LINEAR (≤ nB + nD − 1 matched pairs — consecutive intervals on
    * one axis), even though the join inspects lot×demand candidate
    * pairs per key; keys with huge lot AND demand counts would want
    * the [[graft.plans.RangeJoinBinning]] bin treatment on the
    * cumulative axis.
    *
    * Demand beyond total supply is unmatched (reported via
    * `short = dhi − min(dhi, total supply)` on request by joining
    * totals); lots beyond total demand simply match nothing.
    *
    * @param buys  supply lots: (key, ord…, qty > 0)
    * @param sells demands: (key, ord…, qty > 0)
    * @param ordCols arrival order within key (must totally order rows)
    * @return (key, buy_ord…, sell_ord…, matched_qty > 0)
    */
  def fifoMatch(buys: DataFrame, sells: DataFrame, keyCol: String,
      ordCols: Seq[String], qtyCol: String): DataFrame =
    fifoMatchImpl(buys, sells, keyCol, ordCols, qtyCol, physical = false)

  /** [[fifoMatch]] lowered onto the engine's own
    * [[graft.plans.IntervalOverlapJoinExec]] physical operator: the
    * same cumulative-interval formulation, but the per-key kernel is
    * the two-pointer merge (O(nB + nD) per key) instead of
    * SortMergeJoin's same-key pair materialization + overlap filter
    * (O(nB · nD)) — identical results by construction (spec-pinned,
    * and q215 runs it against q197's plain-SQL oracle).
    */
  def fifoMatchPhysical(buys: DataFrame, sells: DataFrame, keyCol: String,
      ordCols: Seq[String], qtyCol: String): DataFrame =
    fifoMatchImpl(buys, sells, keyCol, ordCols, qtyCol, physical = true)

  private def fifoMatchImpl(buys: DataFrame, sells: DataFrame, keyCol: String,
      ordCols: Seq[String], qtyCol: String, physical: Boolean): DataFrame = {
    def cum(df: DataFrame, hi: String, lo: String) = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(ordCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.filter(col(qtyCol).isNotNull && col(qtyCol) > 0)
        .withColumn("__q", col(qtyCol).cast("long"))
        .withColumn(hi, sum(col("__q")).over(w))
        .withColumn(lo, col(hi) - col("__q"))
    }
    val b = cum(buys, "bhi", "blo").select(
      col(keyCol).as("key") +: ordCols.map(c => col(c).as(s"buy_$c")) :+
        col("blo") :+ col("bhi"): _*)
    val s = cum(sells, "dhi", "dlo").select(
      col(keyCol).as("skey") +: ordCols.map(c => col(c).as(s"sell_$c")) :+
        col("dlo") :+ col("dhi"): _*)
    val joined =
      if (physical)
        graft.plans.IntervalOverlapJoin.join(b, s,
          "key", "blo", "bhi", "skey", "dlo", "dhi")
      else
        b.join(s, col("key") === col("skey") &&
          col("blo") < col("dhi") && col("dlo") < col("bhi"))
    joined
      .withColumn("matched_qty",
        least(col("bhi"), col("dhi")) - greatest(col("blo"), col("dlo")))
      .select(col("key") +: ordCols.map(c => col(s"buy_$c")) ++:
        ordCols.map(c => col(s"sell_$c")) :+ col("matched_qty"): _*)
  }
}
