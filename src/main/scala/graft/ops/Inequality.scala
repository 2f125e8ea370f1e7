package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concentration / inequality diagnostics over integer measures — the
  * "is this corpus dominated by a few sources?" signal (share-of-voice
  * per domain, token mass per source, revenue per segment).
  *
  * Gini from the rank formulation: with x_(1) ≤ … ≤ x_(n) and 1-based
  * ranks i,
  * `G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)`
  * Both Σ terms are exact 64-bit integers; the single division is one
  * shared-shape double expression rounded to MICRO units, so any
  * engine reproduces it bit-for-bit. Ties are rank-order-invariant
  * (equal x contribute x·Σi over the tied block no matter the
  * permutation), but ranks carry a unique tie-break anyway so the
  * dataflow is deterministic row-by-row.
  *
  * Scale shape: ranks come from [[Ranks.twoPhaseRank]] — never a
  * per-group global-order window — and the Σ's are one partial-
  * aggregating groupBy. `i·x` must fit in 64 bits: n ≤ 1e6 rows per
  * group at cent-scale values (≤ ~9e12) stays under the long ceiling.
  */
object Inequality {

  /** Per-group Gini coefficient in micro-units.
    *
    * @param df     input rows
    * @param grpCol group column (non-null)
    * @param valCol NON-NEGATIVE integer measure (cents, tokens);
    *               NULLs dropped
    * @param keyCol unique tie-break key within the group
    * @return (grp, n, total, gini_micro); groups with n·Σx = 0 (all
    *         zero mass) are emitted with gini_micro NULL
    */
  def giniMicro(df: DataFrame, grpCol: String, valCol: String,
      keyCol: String): DataFrame = {
    val base = df.select(col(grpCol), col(valCol).cast("long").as("__x"),
        col(keyCol))
      .filter(col("__x").isNotNull && col("__x") >= 0)
    val ranked = Ranks.twoPhaseRank(base, grpCol, Seq("__x", keyCol), "__i")
    ranked.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
      .withColumn("gini_micro",
        when(col("n") * col("total") > 0,
          round((lit(2L) * col("__ix") - (col("n") + 1L) * col("total"))
            .cast("double") * 1000000.0
            / (col("n") * col("total")).cast("double"), 0).cast("long")))
      .select(col(grpCol), col("n"), col("total"), col("gini_micro"))
  }
}
