package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exact

/** Incremental (materialized-view) aggregate maintenance: keep a compact
  * ALGEBRAIC state per key — `(n, sum_cents)` — and fold each new batch
  * into it instead of re-scanning history. The whole point at 100 TB:
  * the nightly delta is GBs while the history is the lake; a state merge
  * touches `O(|state| + |delta|)`, never `O(|history|)`.
  *
  * Correctness rests on the state being a commutative monoid (counts and
  * exact integer-cent sums add; avg derives at read time) — which is
  * exactly what the oracle checks: `merge(state(history), state(delta))`
  * must equal `state(full)` recomputed from scratch. Doubles summed
  * directly would fail that equality run-to-run; integer cents make the
  * merge associative AND engine-portable ([[graft.core.Exact]]).
  */
object IncrementalAgg {

  /** Rollup state for one slice of data: per-key row count and exact
    * integer-cent sum. One shuffle with map-side partial aggregation.
    */
  def rollupState(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), Exact.centsSum(valueCol).as("sum_cents"))
  }

  /** Merge rollup states: same-key components add. With bucketed state
    * tables the union co-locates and the merge is shuffle-free; here it
    * is one partial-agg shuffle over state-sized (not data-sized) input.
    */
  def mergeStates(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
  }

  /** Read-time derived columns: the mean reconstructed from the state
    * (one deterministic division — order-independent at any cluster
    * size).
    */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_value", col("sum_cents") / col("n") / 100.0)

  /** Per-key top-k as a MERGEABLE state: the state is the top-k ROWS
    * per key (ordered by `ordCol` desc, ties to the smaller
    * `payloadCol`), so `merge(topK(A), topK(B)) ≡ topK(A ∪ B)` — the
    * classic bounded-state monoid (each side's discarded rows can
    * never re-enter any union's top-k). Row-shaped (not list-shaped)
    * state keeps the merge relational and the per-key window input
    * bounded by `sides · k` rows, not the data.
    *
    * @return (keys..., rnk, payloadCol, ordCol) — `rnk` 1-based
    */
  def topKState(df: DataFrame, keys: Seq[String], ordCol: String,
                payloadCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ordCol).desc, col(payloadCol).asc)
    df.select((keys.map(col) :+ col(payloadCol) :+ col(ordCol)): _*)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Merge top-k states (and/or a fresh delta's [[topKState]]): union,
    * re-rank, keep k. Input per key is bounded by `states.size · k`.
    */
  def mergeTopKStates(keys: Seq[String], ordCol: String,
                      payloadCol: String, k: Int,
                      states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    topKState(states.reduce(_.unionByName(_)).drop("rnk"),
      keys, ordCol, payloadCol, k)
  }
}
