package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier product-limit survival estimation per group — the
  * right-censored time-to-event curve (churn, failure, time-to-ship):
  * at each distinct event time t, `S ← S · (n_t − d_t) / n_t` where
  * `n_t` = subjects still at risk (duration ≥ t) and `d_t` = observed
  * events at t; censored subjects leave the risk set without an event.
  *
  * Engine-portable discipline: the survival product is kept in MICRO
  * units with one truncating division per step —
  * `S_micro ← (S_micro · (n_t − d_t)) div n_t`, seeded at 1,000,000 —
  * all operands non-negative integers, so DuckDB's `//` replays it
  * bit-for-bit via `list_reduce` (the [[TimeSeries.emaFixedPoint]]
  * convention for inherently sequential recurrences).
  *
  * Scale shape: one groupBy to (grp, t) cells — the fact table
  * collapses to ≤ |grp|·|distinct t| rows before anything sequential
  * happens; the risk set is a suffix sum (one window over the tiny cell
  * table); the product fold runs over each group's ordered cell list
  * (bounded by distinct TIMES, not subjects — the 100 TB posture:
  * a billion subjects with daily-resolution durations folds over ≤ a
  * few thousand cells per group).
  */
object Survival {

  /** @param durCol   non-negative integer duration (time to event or to
    *                 censoring)
    * @param eventCol 1 = event observed, 0 = right-censored
    * @return one row per (grp, t) with an observed event:
    *         (grp, t, n_risk, d, s_micro) — s_micro is the survival
    *         estimate just AFTER time t, in micro-units
    */
  def kaplanMeier(df: DataFrame, grpCol: String, durCol: String,
      eventCol: String): DataFrame = {
    val cells = df
      .filter(col(durCol).isNotNull && col(durCol) >= 0)
      .groupBy(col(grpCol).as("grp"), col(durCol).cast("long").as("t"))
      .agg(count(lit(1)).as("c"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"))
    // risk set at t = subjects with duration >= t = suffix sum of cell
    // counts in time order (censored-at-t subjects count: KM removes
    // them AFTER the events at their own time)
    val wSuffix = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrefix = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("n_risk", sum(col("c")).over(wSuffix))
      .withColumn("__steps",
        collect_list(struct(col("t"), col("n_risk"), col("d"))).over(wPrefix))
      .filter(col("d") > 0)
      .select(col("grp"), col("t"), col("n_risk"), col("d"),
        expr(
          """aggregate(filter(__steps, s -> s.d > 0), cast(1000000 as bigint),
            |  (acc, s) -> (acc * (s.n_risk - s.d)) div s.n_risk)""".stripMargin)
          .as("s_micro"))
  }

  /** Nelson–Aalen cumulative hazard: per event time,
    * `h(t) = d_t / n_risk(t)` micro-rounded, `H(t)` the running integer
    * sum — the hazard-scale companion to [[kaplanMeier]] (same risk
    * sets, no product), preferred when hazards get compared or summed
    * across groups.
    *
    * @return (grp, t, n_risk, d, h_micro, cumhaz_micro) at event times
    */
  def nelsonAalen(df: DataFrame, grpCol: String, durCol: String,
                  eventCol: String): DataFrame = {
    val cells = df.select(col(grpCol).as("grp"),
        col(durCol).cast("long").as("t"), col(eventCol).cast("long").as("ev"))
      .groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("c"), sum(col("ev")).as("d"))
    val rev = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val fwd = Window.partitionBy(col("grp")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("n_risk", sum(col("c")).over(rev))
      .withColumn("h_micro",
        round(col("d").cast("double") * 1000000.0
          / col("n_risk").cast("double"), 0).cast("long"))
      .withColumn("cumhaz_micro", sum(col("h_micro")).over(fwd))
      .filter(col("d") > 0)
      .select(col("grp"), col("t"), col("n_risk"), col("d"), col("h_micro"),
        col("cumhaz_micro"))
  }
}
