package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recurring-revenue movement analytics — the MRR waterfall: each
  * period's revenue change decomposed into NEW (customer absent last
  * period), EXPANSION (grew), CONTRACTION (shrank), and CHURN (absent
  * this period, attributed to the period the customer vanished).
  * Exact integer cents; the decomposition identity
  * `mrr(t) − mrr(t−1) = new + expansion − contraction − churn`
  * holds exactly per period (spec-pinned).
  *
  * Semantics: periods are compared CALENDAR-adjacent (an integer month
  * index, so gaps are real absences, not collapsed); a customer
  * returning after a gap counts as NEW again (no "resurrected" class —
  * the usual 4-bucket waterfall).
  *
  * Scale shape: one partial-combining groupBy to the (customer,
  * period) table, then a self equi-join on (customer, period+1) —
  * both shuffles key on the customer dimension; the output is
  * |periods| rows.
  */
object Revenue {

  /** @param df      one row per (custCol, midxCol) with integer revenue
    *                (pre-aggregated; duplicates are summed here anyway)
    * @param midxCol integer period index (e.g. (year−y0)·12 + month−1)
    * @return per period: (midx, mrr_cents, new_cents, expansion_cents,
    *         contraction_cents, churned_cents) — churn rows can extend
    *         one period past the last active one
    */
  def mrrWaterfall(df: DataFrame, custCol: String, midxCol: String,
      revCol: String): DataFrame = {
    val m = df.groupBy(col(custCol).as("cust"),
        col(midxCol).cast("long").as("midx"))
      .agg(sum(col(revCol).cast("long")).as("rev"))
    val cur = m
    val prev = m.select(col("cust"), (col("midx") + 1L).as("midx"),
      col("rev").as("prev_rev"))
    cur.join(prev, Seq("cust", "midx"), "full_outer")
      .groupBy(col("midx"))
      .agg(
        sum(coalesce(col("rev"), lit(0L))).as("mrr_cents"),
        sum(when(col("prev_rev").isNull, col("rev")).otherwise(0L))
          .as("new_cents"),
        sum(when(col("rev").isNotNull && col("prev_rev").isNotNull
            && col("rev") > col("prev_rev"), col("rev") - col("prev_rev"))
          .otherwise(0L)).as("expansion_cents"),
        sum(when(col("rev").isNotNull && col("prev_rev").isNotNull
            && col("rev") < col("prev_rev"), col("prev_rev") - col("rev"))
          .otherwise(0L)).as("contraction_cents"),
        sum(when(col("rev").isNull, col("prev_rev")).otherwise(0L))
          .as("churned_cents"))
  }
}
