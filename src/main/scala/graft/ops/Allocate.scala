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
}
