package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Giant-group escape hatch for the exact percentile aggregations.
  *
  * Spark's exact `percentile` buffers EVERY value of a group in the
  * aggregation buffer — correct, and required for the DuckDB-oracle
  * queries (q03/q60 and the export medians mirroring the reference's
  * R/export.R:222-224,576-578,804), but an executor-OOM hazard on a
  * skewed group at 100 TB: one hot key (a dominant returnflag, a mega
  * vessel) turns its buffer into the whole group. This is the same
  * hazard [[LocScaleBSketch]] closed for the robust-bounds pipeline.
  *
  * Unlike robust bounds, plain quantiles need NO custom
  * TypedImperativeAggregate: Spark's `ApproximatePercentile`
  * (`percentile_approx`) already IS the bounded-memory
  * Greenwald-Khanna sketch with partial aggregation and sketch merges
  * on the shuffle — building a twin of it would re-implement a
  * codegen'd built-in. These wrappers exist to make the swap explicit
  * and disciplined:
  *
  *  - same call shape as the exact aggregations they replace;
  *  - `accuracy` is the inverse RANK error: the returned value's rank
  *    is within ±n/accuracy of the target (default 1e4 → ±0.01 % of
  *    the group);
  *  - memory is O(accuracy · log n) per group regardless of group
  *    size, vs O(group) for exact `percentile`.
  *
  * The exact path stays the conformance default (the oracle compares
  * value hashes; a sketch value can differ in the last interpolated
  * decimal); a 100 TB deployment swaps `percentile` →
  * [[percentileSketch]] per call site. `PercentilesSpec` pins the
  * rank-error contract on a million-row log-skewed group.
  */
object Percentiles {

  val DefaultAccuracy = 10000

  /** Sketch percentile of `c` at `prob` — bounded-memory replacement
    * for `percentile(c, prob)` on groups too large to buffer.
    */
  def percentileSketch(c: Column, prob: Double,
                       accuracy: Int = DefaultAccuracy): Column =
    percentile_approx(c, lit(prob), lit(accuracy))

  /** Multi-quantile form: one sketch pass, an array of values — the
    * shape of q03's (p50, p60, p75, p95) summaries.
    */
  def percentilesSketch(c: Column, probs: Seq[Double],
                        accuracy: Int = DefaultAccuracy): Column =
    percentile_approx(c, array(probs.map(lit): _*), lit(accuracy))

  def medianSketch(c: Column, accuracy: Int = DefaultAccuracy): Column =
    percentileSketch(c, 0.5, accuracy)
}
