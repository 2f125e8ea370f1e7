package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the continuous twin of the batch
  * range join ([[graft.ops.ScaleJoins.rangeCountByBins]] / q91): match
  * each left event with the right events of the SAME key whose event
  * time falls within `[leftTs - before, leftTs + after]`.
  *
  * Both sides carry a watermark and the join condition carries explicit
  * event-time bounds — the two things Spark's symmetric hash join needs
  * to know which buffered state can never match again and evict it.
  * Without the time bounds the state store grows with the whole history
  * of both streams (the unbounded-state failure mode at an always-on
  * ingest); with them, state is O(events inside watermark + interval),
  * independent of stream age.
  *
  * The key equality predicate keeps the state lookup hash-partitioned
  * (state co-partitioned by key, no cross-partition scans) — the shape
  * that scales out; a pure range predicate with no key would force
  * every right row to be checked against every left partition.
  */
object IntervalJoin {

  /** Inner interval join of two streams on `key`, with `rightTs` in
    * `[leftTs - before, leftTs + after]` (both closed). `delay` is the
    * max expected out-of-orderness of either stream (watermark).
    * `before`/`after`/`delay` are interval strings, e.g. "1 hour".
    */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 before: String, after: String, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    l.join(r, joinCond(key, leftTs, rightTs, before, after))
      .drop(col(s"r.$key"))
  }

  /** Batch twin on static frames — same condition, no watermarks; the
    * equivalence target for specs and backfills.
    */
  def joinWithinBatch(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      before: String, after: String): DataFrame =
    left.alias("l").join(right.alias("r"),
        joinCond(key, leftTs, rightTs, before, after))
      .drop(col(s"r.$key"))

  private def joinCond(key: String, leftTs: String, rightTs: String,
                       before: String, after: String): Column =
    col(s"l.$key") === col(s"r.$key") &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after")
}
