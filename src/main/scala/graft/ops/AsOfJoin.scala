package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join: attach to every left row the
  * payload of the LAST right row with the same key and `time` at or
  * before the left row's `time`.
  *
  * Beyond-reference time-series surface (the reference's nearest
  * temporal op is the gated same-day 1:1 merge,
  * R/merging-landings.R:9-60 — equality on the day, not as-of); this is
  * the standard enrichment step a training-data pipeline needs for
  * "state as of event time" features.
  *
  * Spark-first plan — the UNION-MERGE formulation, not a per-row probe:
  * tag both sides, union them, and run ONE window
  * `last(payload, ignoreNulls) over (partition by key order by (time,
  * side, tie) rows unbounded preceding)`. Cost is a single shuffle of
  * left+right on `key` and a per-partition sort — no nested-loop, no
  * per-row subquery, no driver loop; exactly the plan you'd want at
  * 1000 executors. Right rows sort BEFORE left rows at equal time
  * (side 0 < 1), so a right row at exactly t matches ("at or before").
  * Among right rows with equal (key, time) the LARGEST `rightUnique`
  * wins (ascending tie column, `last` takes the latest).
  *
  * Skew note: a hot key serializes into one task's sort — at scale,
  * pre-split hot keys by time range (the window is order-local, so a
  * range split with boundary hand-off is the escape hatch; AQE cannot
  * split a window partition).
  *
  * @param key         join key column present on BOTH sides
  * @param time        ordering column present on BOTH sides (numeric or
  *                    timestamp; must be non-null)
  * @param rightUnique right-side column that is unique per right row —
  *                    the deterministic tie-break at equal time
  * @param rightPayload right-side columns to attach (null when no right
  *                     row precedes the left row)
  */
object AsOfJoin {
  def lastPrior(left: DataFrame, right: DataFrame, key: String, time: String,
                rightUnique: String, rightPayload: Seq[String]): DataFrame = {
    val payloadCols = (rightUnique +: rightPayload).distinct
    require(!payloadCols.contains(key) && !payloadCols.contains(time),
      "rightUnique/rightPayload must be disjoint from key and time")
    val taggedRight = right.select(col(key), col(time),
      struct(payloadCols.map(col): _*).as("__p"),
      col(rightUnique).as("__tie"), lit(0).as("__side"))
    val taggedLeft = left.withColumn("__side", lit(1))
    // unionByName fills each side's missing columns with typed nulls
    val merged = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Forward as-of: attach the payload of the FIRST right row at or
    * after the left row's time (numeric `time` required — epoch
    * seconds/micros). Implemented by time negation over [[lastPrior]]
    * (`rt >= lt ⟺ -rt <= -lt`), so the two directions share one plan
    * shape and one set of invariants. Ties at equal (key, time) resolve
    * to the LARGEST `rightUnique`, same as the backward direction.
    */
  def firstAfter(left: DataFrame, right: DataFrame, key: String, time: String,
                 rightUnique: String, rightPayload: Seq[String]): DataFrame = {
    val nl = left.withColumn(time, negate(col(time)))
    val nr = right.withColumn(time, negate(col(time)))
    lastPrior(nl, nr, key, time, rightUnique, rightPayload)
      .withColumn(time, negate(col(time)))
  }

  /** [[lastPrior]] restricted to right rows strictly within `maxAgeSec`
    * of the left time (both times in epoch seconds): matches older than
    * the horizon are nulled out — the "stale state is no state" variant.
    */
  def lastPriorWithin(left: DataFrame, right: DataFrame, key: String,
                      timeSec: String, rightUnique: String,
                      rightPayload: Seq[String], maxAgeSec: Long): DataFrame = {
    val joined = lastPrior(
      left, right.withColumn("__rt", col(timeSec)), key, timeSec,
      rightUnique, rightPayload :+ "__rt")
    val fresh = col("__rt").isNotNull && col(timeSec) - col("__rt") < maxAgeSec
    val keep = (rightUnique +: rightPayload).distinct
    joined
      .select(left.columns.map(col) ++
        keep.map(c => when(fresh, col(c)).as(c)): _*)
  }
}
