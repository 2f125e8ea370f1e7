package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous upsert into a keyed document store — the streaming twin
  * of the reference's periodic export diff (R/airtable.R:324-420,
  * `upsertDiff`): each micro-batch is keyed, reduced to one row per
  * key (latest by an ordering column — arrivals within a batch may
  * collide), and merged into the target collection.
  *
  * `foreachBatch` is the right seam because upsert is not an append:
  * the sink needs read-modify-write per batch, which no declarative
  * streaming sink offers. Inside the batch function everything is
  * plain batch DataFrames, so the SAME dedup/diff operators the batch
  * pipeline uses run unchanged — one code path, two execution modes.
  *
  * State discipline at scale: the stream itself keeps NO state (no
  * watermark aggregation) — the store is the state. Per batch the cost
  * is one left-anti/semi diff against the current collection, i.e.
  * O(batch + |store| scan); for a partitioned store this is where a
  * key-bucketed layout ([[graft.ops.ScaleJoins.bucketedJoin]] /
  * Z-order, `ops/Layout`) pays for itself.
  */
object StreamUpsert {

  /** Latest row per key within a batch: max_by on (orderCol, then key
    * for full determinism when orderCol ties).
    */
  private[streaming] def latestPerKey(batch: DataFrame, key: String,
                                      orderCol: String): DataFrame = {
    val others = batch.columns.filterNot(_ == key)
    batch.groupBy(col(key))
      .agg(max_by(struct(others.map(col): _*), struct(col(orderCol), col(key)))
        .as("__r"))
      .select(col(key) +: others.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Merge one batch into `collection` of the in-memory V2 store:
    * unchanged rows for absent keys are kept, incoming keys replace
    * their stored row. Returns (creates, updates) counts for the
    * caller's sync log (the reference logs exactly this split).
    */
  private[streaming] def mergeBatch(spark: SparkSession, batch: DataFrame,
                                    collection: String, key: String,
                                    orderCol: String): (Long, Long) = {
    import graft.io.{DocumentSink, MemDocStore}
    val latest = latestPerKey(batch, key, orderCol)
    val exists = MemDocStore.collections.contains(collection)
    val existing =
      if (exists) DocumentSink.pullFrom(spark, MemDocStore.Format,
        Map("collection" -> collection))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], latest.schema)
    val (creates, updates) = DocumentSink.upsertDiff(latest, existing, key)
    val nCreates = creates.count()
    val nUpdates = updates.count()
    val kept = existing.join(latest.select(key), Seq(key), "left_anti")
    // truncate-write the merged view (pushTo is mode=overwrite; the V2
    // scan of `existing` runs in the write job's tasks BEFORE the
    // driver-side commit swaps the registry, so read-then-replace is
    // safe within one batch)
    DocumentSink.pushTo(kept.unionByName(latest), MemDocStore.Format,
      Map("collection" -> collection))
    (nCreates, nUpdates)
  }

  /** Start the continuous upsert: every micro-batch merges into
    * `collection`, keyed by `key`, newest-by-`orderCol` wins.
    */
  def run(stream: DataFrame, collection: String, key: String,
          orderCol: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, collection, key, orderCol): Unit
      }
      .start()
}
