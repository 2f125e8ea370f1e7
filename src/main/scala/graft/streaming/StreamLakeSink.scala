package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.Versioned

/** Streaming sink into the generation-pinned snapshot lane — the
  * "stream into a lakehouse table" pattern: every micro-batch publishes
  * its touched partitions as NEW `__gen` subdirectories and flips ONE
  * atomic manifest whose tag is derived from the batch id, so the lake
  * gets EXACTLY-ONCE batch semantics on top of streaming's
  * at-least-once batch replay:
  *
  *  - a recovered/replayed batch whose manifest already committed
  *    SHORT-CIRCUITS (its tag is ≤ the published one — batch ids are
  *    monotone, so a later committed tag proves this batch committed
  *    too);
  *  - a replayed batch whose publish CRASHED before the manifest
  *    commit recomputes from the prior pins (which never flipped) and
  *    rewrites its own generation directories idempotently — readers
  *    never saw the half-written generation;
  *  - rows are keyed: a batch re-emitting `keyCol` REPLACES the stored
  *    row instead of duplicating it (the trip_id-replacement contract
  *    of the topology cycles), so even at-least-once DATA delivery
  *    upstream converges;
  *  - every committed batch is a consistent snapshot — the manifest
  *    tags are a per-epoch time-travel catalog
  *    ([[graft.io.Versioned.readSnapshotPartitionsAt]]), and GC
  *    retention bounds it.
  *
  * The stream itself keeps no state (no watermark aggregation): the
  * manifest IS the state, which is what makes recovery trivially
  * correct. Per batch the cost is O(touched partitions), the same
  * contract as the batch cycles — StreamLakeSpec pins convergence,
  * replay no-ops, crash recovery, and per-epoch time travel.
  */
object StreamLakeSink {

  /** The manifest tag of `batchId` — zero-padded so lexicographic
    * order equals batch order (the [[Versioned.commitManifest]]
    * monotonicity contract).
    */
  def batchTag(batchId: Long): String = f"$batchId%020d_strm"

  /** Publish one micro-batch: merge its rows into the touched
    * partitions (keyed replacement), write them as generation `batchTag
    * (batchId)`, commit the manifest. @return false when the batch had
    * already committed (replay short-circuit), true when this call
    * published it.
    */
  def commitBatch(spark: SparkSession, dir: String, manifestPrefix: String,
                  prefix: String, partCol: String, keyCol: String,
                  batch: DataFrame, batchId: Long): Boolean = {
    val gen = batchTag(batchId)
    // monotone batch ids: a published tag ≥ gen proves this batch's
    // manifest committed (it, or a successor that could only have run
    // after it committed)
    if (Versioned.latestManifest(dir, manifestPrefix).exists(_._1 >= gen))
      return false
    val pins0 = Versioned.snapshotPins(dir, manifestPrefix, prefix)
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val merged =
      if (pins0.isEmpty) batch
      else graft.ext.Exec.checkpointEager(
        Versioned.readSnapshotAt(spark, dir, prefix, partCol, pins0,
            Some(touched))
          .join(batch.select(col(keyCol)).distinct(), Seq(keyCol),
            "left_anti")
          .unionByName(batch))
    val present = Versioned.writeSnapshotPartitions(merged, dir, prefix,
      partCol, gen)
    val pins = pins0 -- touched.map(_.toString) ++
      present.map(_.toString -> gen)
    Versioned.commitManifest(dir, manifestPrefix, gen, pins.map {
      case (v, g) => Versioned.snapshotPinKey(prefix, v) -> g })
    true
  }

  /** Start the continuous lake publish. */
  def run(stream: DataFrame, dir: String, manifestPrefix: String,
          prefix: String, partCol: String, keyCol: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch.sparkSession, dir, manifestPrefix, prefix,
          partCol, keyCol, batch, batchId): Unit
      }
      .start()
}
