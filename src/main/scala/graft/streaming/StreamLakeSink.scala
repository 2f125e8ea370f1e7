package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.{FileStats, Versioned}

/** Streaming sink into the generation-pinned snapshot lane — the
  * "stream into a lakehouse table" pattern: every micro-batch publishes
  * its touched partitions as NEW `__gen` subdirectories and flips ONE
  * atomic manifest whose tag is derived from the batch id, so the lake
  * gets EXACTLY-ONCE batch semantics on top of streaming's
  * at-least-once batch replay:
  *
  *  - a recovered/replayed batch whose manifest already committed
  *    SHORT-CIRCUITS (a committed BATCH tag ≥ its own — batch ids are
  *    monotone, so a later committed batch tag proves this batch
  *    committed too; non-batch tags such as a compaction's are ignored
  *    here, because a maintenance commit proves nothing about which
  *    batches landed);
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
  * SKIPPING SIDECARS ride the epoch: when `zoneStat` / `bloomKey` are
  * set, each batch re-derives the zone-map / bloom rows for its
  * touched partitions from the just-written generation and folds the
  * sidecar re-pins into the SAME manifest commit — after every epoch,
  * `readSkippingSnapshot` ≡ full scan and `statsOnlyAggSnapshot` is
  * exact (StreamLakeSpec pins both). Without this, the first streamed
  * epoch leaves any sidecar on the root stale and the skipping read
  * path silently loses pruning — or crashes after GC.
  *
  * MAINTENANCE COMMITS on the same manifest (e.g.
  * [[graft.io.Versioned.compactSnapshotLeaves]]) must use tags WITHOUT
  * the `_strm` suffix that sort between the last and next batch tag
  * (a compaction after batch 7 tags itself `%020d_cmp`.format(7), say)
  * — a maintenance tag sorting above future batch tags would make
  * those batches' manifest commits fail loudly (the monotonicity
  * guard), never drop data silently.
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
    * monotonicity contract). The `_strm` suffix marks BATCH commits;
    * the replay short-circuit compares only against tags carrying it.
    */
  def batchTag(batchId: Long): String = f"$batchId%020d_strm"

  private val BatchTagSuffix = "_strm"

  /** Publish one micro-batch: merge its rows into the touched
    * partitions (keyed replacement), write them as generation `batchTag
    * (batchId)`, re-derive any configured sidecars for the touched
    * partitions, commit the manifest once. @return false when the
    * batch had already committed (replay short-circuit), true when
    * this call published it.
    */
  def commitBatch(spark: SparkSession, dir: String, manifestPrefix: String,
                  prefix: String, partCol: String, keyCol: String,
                  batch: DataFrame, batchId: Long,
                  zoneStat: Option[String] = None,
                  bloomKey: Option[(String, Long, Long)] = None,
                  zoneMultiCols: Option[Seq[String]] = None): Boolean = {
    val gen = batchTag(batchId)
    // monotone batch ids: a committed BATCH tag ≥ gen proves this
    // batch's manifest committed (it, or a successor that could only
    // have run after it committed). Restricted to batch-format tags:
    // a maintenance commit (compaction, manual pin) proves nothing
    // about which batches landed, and comparing against it would drop
    // batches silently. manifestTags is newest-first, so the first
    // batch tag is the max.
    if (Versioned.manifestTags(dir, manifestPrefix)
        .find(_.endsWith(BatchTagSuffix)).exists(_ >= gen))
      return false
    val pins0 = Versioned.snapshotPins(dir, manifestPrefix, prefix)
    val touched = batch.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // an EMPTY micro-batch (no-data trigger, empty source slice) is a
    // publish-nothing no-op: there is nothing to pin, and on a fresh
    // root the data/sidecar writes would not even create it — a replay
    // re-runs the same no-op; the NEXT non-empty batch's manifest
    // subsumes this epoch in the monotone-tag order
    if (touched.isEmpty) return true
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
    // CARRY-FORWARD: start from the latest manifest's FULL entries and
    // replace only this sink's stale keys for the touched partitions —
    // on a SHARED manifest (maintenance commits, pinned delete batches
    // from commitSnapshotDeleteVectors, other roots' pins, sidecars
    // this sink does not manage) a rebuilt-from-scratch entry map
    // would silently erase them at the next batch commit, and erased
    // DV pins mean deleted rows RESURRECT. Same pattern as
    // compactSnapshotLeaves / LakeTable.commitSnapshot.
    val entries0 = Versioned.latestManifest(dir, manifestPrefix)
      .map(_._2).getOrElse(Map.empty)
    def replaceTouched(entries: Map[String, String], p: String,
                       newPins: Set[Any]): Map[String, String] =
      entries --
        touched.map(v => Versioned.snapshotPinKey(p, v)) ++
        newPins.map(v => Versioned.snapshotPinKey(p, v) -> gen)
    var entries = replaceTouched(entries0, prefix, present)
    // sidecar rows re-derived from the just-written generation; their
    // re-pins ride the same commit (stats flip with data). Specs
    // resolve explicit-arg-first, then the spec the manifest pins
    // (FileStats.zoneSpecEntry/bloomSpecEntry/zoneMultiSpecEntry,
    // committed with every epoch) — a RESTARTED stream that forgets
    // its sidecar args picks them up from the manifest instead of
    // silently stranding the sidecars.
    val dataPins2 = pins0 ++ present.map(_.toString -> gen)
    zoneStat.orElse(FileStats.pinnedZoneSpec(entries0, prefix))
      .foreach { statCol =>
        val zp = FileStats.writeSnapshotSidecar(spark, dir, prefix,
          partCol, statCol, dataPins2, touched, gen)
        entries = replaceTouched(entries,
          FileStats.sidecarPrefix(prefix), zp) +
          FileStats.zoneSpecEntry(prefix, statCol)
      }
    bloomKey.orElse(FileStats.pinnedBloomSpec(entries0, prefix))
      .foreach { case (bkCol, items, bits) =>
        val bp = FileStats.writeSnapshotBloomSidecar(spark, dir, prefix,
          partCol, bkCol, dataPins2, touched, gen, items, bits)
        entries = replaceTouched(entries,
          FileStats.bloomPrefix(prefix), bp) +
          FileStats.bloomSpecEntry(prefix, bkCol, items, bits)
      }
    zoneMultiCols.orElse(FileStats.pinnedZoneMultiSpec(entries0, prefix))
      .foreach { statCols =>
        val mp = FileStats.writeSnapshotSidecarMulti(spark, dir, prefix,
          partCol, statCols, dataPins2, touched, gen)
        entries = replaceTouched(entries,
          FileStats.sidecarMultiPrefix(prefix), mp) +
          FileStats.zoneMultiSpecEntry(prefix, statCols)
      }
    Versioned.commitManifest(dir, manifestPrefix, gen, entries)
    true
  }

  /** Start the continuous lake publish; `zoneStat` / `bloomKey` opt
    * the root's skipping sidecars into per-epoch maintenance.
    */
  def run(stream: DataFrame, dir: String, manifestPrefix: String,
          prefix: String, partCol: String, keyCol: String,
          zoneStat: Option[String] = None,
          bloomKey: Option[(String, Long, Long)] = None,
          zoneMultiCols: Option[Seq[String]] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch.sparkSession, dir, manifestPrefix, prefix,
          partCol, keyCol, batch, batchId, zoneStat, bloomKey,
          zoneMultiCols): Unit
      }
      .start()
}
