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

  /** Two-sample log-rank (Mantel–Cox) test: does group 1's
    * time-to-event distribution differ from group 0's, respecting
    * right-censoring — the hypothesis-test companion to
    * [[kaplanMeier]], run off the SAME risk-set cells.
    *
    * At each distinct event time t: observed group-1 events `d1`,
    * expected `E = d·n1/n`, hypergeometric variance
    * `V = d·(n1/n)·(n0/n)·(n−d)/(n−1)` (0 when n = 1); per-time E and
    * V are micro-rounded integers summed exactly;
    * `Z = (O1 − ΣE) / sqrt(ΣV)` is the one final shared-shape double.
    *
    * Scale shape: one groupBy to (group, t) cells, suffix-sum windows
    * over the ≤ |distinct t| cell table — identical posture to KM.
    *
    * @param sideCol 0/1 group indicator column name
    * @return one row: (n1, n0, o1, e1_micro, v_micro, z_milli)
    */
  def logRank(df: DataFrame, sideCol: String, durCol: String,
              eventCol: String): DataFrame = {
    val cells = df
      .filter(col(durCol).isNotNull && col(durCol) >= 0)
      .select(col(sideCol).cast("int").as("s1"),
        col(durCol).cast("long").as("t"), col(eventCol).cast("long").as("ev"))
      .groupBy(col("t"))
      .agg(sum(when(col("s1") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s1") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("s1") === 1, col("ev")).otherwise(0L)).as("d1"),
        sum(when(col("s1") === 0, col("ev")).otherwise(0L)).as("d0"))
    val suffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risky = cells
      .withColumn("n1t", sum(col("c1")).over(suffix))
      .withColumn("n0t", sum(col("c0")).over(suffix))
      .withColumn("dt", col("d1") + col("d0"))
      .withColumn("nt", col("n1t") + col("n0t"))
      .filter(col("dt") > 0)
    def dd(c: String) = col(c).cast("double")
    val eTerm = dd("dt") * dd("n1t") / dd("nt")
    val vTerm = when(col("nt") <= 1L, lit(0.0d)).otherwise(
      dd("dt") * (dd("n1t") / dd("nt")) * (dd("n0t") / dd("nt"))
        * (dd("nt") - dd("dt")) / (dd("nt") - 1.0d))
    val tot = cells.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    risky
      .agg(sum(col("d1")).as("o1"),
        sum(round(eTerm * 1000000.0d, 0).cast("long")).as("e1_micro"),
        sum(round(vTerm * 1000000.0d, 0).cast("long")).as("v_micro"))
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n0"), col("o1"), col("e1_micro"), col("v_micro"),
        round((col("o1").cast("double")
          - col("e1_micro").cast("double") / 1000000.0d)
          / sqrt(col("v_micro").cast("double") / 1000000.0d) * 1000.0d, 0)
          .cast("long").as("z_milli"))
  }
}
