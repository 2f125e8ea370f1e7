package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic floating-point aggregation helpers.
  *
  * Distributed double sums are order-dependent (partial aggregation order
  * varies run to run and differs from any single-threaded oracle). For
  * money-like columns with fixed decimal precision we therefore sum exact
  * integer "cents": `round(x * 100)` is a single IEEE-deterministic
  * multiply + round, the long sum is exact and order-independent, and the
  * final division by 100.0 is again a single deterministic op. The DuckDB
  * oracle mirrors the same expression (`SUM(CAST(round(x*100,0) AS
  * BIGINT)) / 100.0`), giving bit-identical results at any parallelism —
  * this property is what makes the correctness gate stable at 1000
  * executors, not just on local[32].
  */
object Exact {
  /** Exact sum of a fixed-point column; `scale`=100 for 2-decimal money. */
  def centsSum(c: Column, scale: Long = 100L): Column =
    sum(round(c * scale, 0).cast("long"))

  /** Order-independent double sum of a 2-decimal column. */
  def moneySum(c: Column): Column = centsSum(c) / 100.0

  /** Order-independent mean of a 2-decimal column (exact-sum / count). */
  def moneyAvg(c: Column): Column =
    centsSum(c) / count(when(c.isNotNull, 1)) / 100.0

  /** Round to 4 decimals — used on interpolated (percentile) and
    * transcendental (ln/exp/cosine) results where the last ulp may differ
    * between engines; 4 decimals leaves ~11 orders of magnitude of head
    * room over the expected error. The `+ 0.0` collapses IEEE negative
    * zero (round of a tiny negative) to +0.0 — engines disagree on the
    * sign of that zero, and a value hasher that looks at bits or string
    * form would see a difference where numeric equality sees none.
    */
  def r4(c: Column): Column = round(c, 4) + 0.0

  def r6(c: Column): Column = round(c, 6) + 0.0
}
