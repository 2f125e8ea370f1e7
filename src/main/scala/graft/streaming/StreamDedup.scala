package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous twin of
  * [[graft.ext.Dedup.exactDupGroups]] for an always-on ingest: keep the
  * FIRST arrival of each key, drop every later duplicate, with state
  * that expires instead of growing forever.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key and
  * evicts it once the watermark passes the key's event time + delay —
  * the only shape that is both correct (duplicates of an in-flight key
  * are always caught while reordering is still possible) and bounded
  * (state is O(keys inside the watermark horizon), not O(all keys
  * ever)). A plain streaming `dropDuplicates` without the watermark
  * variant accumulates state for every key for the lifetime of the
  * query — the state-store OOM at 100 TB/day ingest.
  */
object StreamDedup {

  /** First-arrival dedup on `keyCols` for a stream with event-time
    * column `tsCol`; duplicates arriving within `delay` of the original
    * (in event time) are dropped, state for older keys is evicted.
    */
  def firstArrivals(events: DataFrame, keyCols: Seq[String],
                    tsCol: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Batch twin for equivalence tests: first arrival per key by event
    * time (ties broken by the full row for determinism is the caller's
    * concern; synthetic fixtures keep (key, ts) unique).
    */
  def firstArrivalsBatch(events: DataFrame, keyCols: Seq[String],
                         tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
