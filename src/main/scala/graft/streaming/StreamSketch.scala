package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Sketches
import graft.io.{DocumentSink, MemDocStore}

/** Continuous Count-Min maintenance: each micro-batch's counter delta
  * is ADDED into the stored sketch — the streaming form of frequency
  * tracking over an unbounded token/key stream (heavy-hitter
  * monitoring while a crawl ingests).
  *
  * Count-Min is the rare sketch whose streaming merge is trivially
  * exact: counters are a commutative monoid (cell-wise addition), so
  * `merge(sketch(b1), sketch(b2)) == sketch(b1 ++ b2)` with NO
  * approximation added by batching — the spec pins that equality and
  * [[graft.ops.IncrementalAgg]] documents the same algebra for exact
  * rollups. The stream itself keeps no state (no watermark, no
  * aggregation buffers): the d×w counter table in the store IS the
  * state, and its size is independent of stream length — the whole
  * point of sketching an unbounded stream.
  */
object StreamSketch {

  /** Add one batch's counters into `collection` (cell-wise sum). */
  private[streaming] def mergeBatch(spark: SparkSession, batch: DataFrame,
                                    collection: String, keyCol: String,
                                    d: Int, w: Int): Unit = {
    val delta = Sketches.countMinCounters(batch, keyCol, d, w)
    val existing =
      if (MemDocStore.collections.contains(collection))
        DocumentSink.pullFrom(spark, MemDocStore.Format,
          Map("collection" -> collection))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    val merged = existing.unionByName(delta)
      .groupBy(col("row"), col("pos")).agg(sum(col("cnt")).as("cnt"))
    DocumentSink.pushTo(merged, MemDocStore.Format,
      Map("collection" -> collection))
  }

  /** Start continuous sketch maintenance over `stream`'s `keyCol`. */
  def run(stream: DataFrame, collection: String, keyCol: String,
          d: Int, w: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, collection, keyCol, d, w)
      }
      .start()

  /** Read the maintained counter table back as a batch DataFrame. */
  def counters(spark: SparkSession, collection: String): DataFrame =
    DocumentSink.pullFrom(spark, MemDocStore.Format,
      Map("collection" -> collection))

  /** Max-merge one batch's grouped HLL registers into `collection`.
    * Registers are a max-monoid (associative, commutative, IDEMPOTENT),
    * so the batched maintenance is exactly the single-pass build — no
    * approximation added by micro-batching, and replaying the same data
    * leaves the state unchanged. The register table is bounded at
    * groups × 2^p rows regardless of stream length.
    */
  private[streaming] def mergeHllBatch(spark: SparkSession, batch: DataFrame,
                                       collection: String, groupCol: String,
                                       keyCol: String, p: Int): Unit = {
    val delta = Sketches.hllRegistersBy(batch, Seq(groupCol), keyCol, p)
    val existing =
      if (MemDocStore.collections.contains(collection))
        DocumentSink.pullFrom(spark, MemDocStore.Format,
          Map("collection" -> collection))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    val merged = existing.unionByName(delta)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("register")).as("register"))
    DocumentSink.pushTo(merged, MemDocStore.Format,
      Map("collection" -> collection))
  }

  /** Continuous grouped-HLL maintenance over `stream` — the streaming
    * distinct-counter (distinct users per event type while events
    * ingest). The stored register table IS the state; the stream keeps
    * none.
    */
  def runHll(stream: DataFrame, collection: String, groupCol: String,
             keyCol: String, p: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeHllBatch(batch.sparkSession, batch, collection, groupCol, keyCol, p)
      }
      .start()

  /** OR one batch's Bloom bit delta into `collection`. Set bits are an
    * OR-monoid — associative, commutative, IDEMPOTENT — so the batched
    * maintenance equals the single-pass build exactly and replaying
    * data is a no-op; the bit table is bounded at `m` rows regardless
    * of stream length. This is the streaming dedup SCREEN: the stored
    * filter answers "have we (possibly) seen this key before" for an
    * ingest running next to it ([[graft.ext.Sketches.bloomScreen]] is
    * the batch probe side — no false negatives by construction).
    */
  private[streaming] def mergeBloomBatch(spark: SparkSession, batch: DataFrame,
                                         collection: String, keyCol: String,
                                         m: Int, k: Int): Unit = {
    val delta = Sketches.bloomBits(batch, keyCol, m, k)
    val existing =
      if (MemDocStore.collections.contains(collection))
        DocumentSink.pullFrom(spark, MemDocStore.Format,
          Map("collection" -> collection))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    val merged = existing.unionByName(delta).distinct()
    DocumentSink.pushTo(merged, MemDocStore.Format,
      Map("collection" -> collection))
  }

  /** Continuous Bloom-filter maintenance over `stream`'s `keyCol`. */
  def runBloom(stream: DataFrame, collection: String, keyCol: String,
               m: Int, k: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBloomBatch(batch.sparkSession, batch, collection, keyCol, m, k)
      }
      .start()

  /** Add one batch's nearest-centroid cell counts into `collection`.
    * `centroids` must be a LOCAL relation (cid, cm: array<long> micro
    * components) so each batch broadcasts the same frozen quantizer;
    * assignment is exact integer squared-L2 with ties to the lower cid
    * (the [[graft.ext.Pq]] discipline), and per-cell counts are an
    * addition monoid — the batched state equals the single-pass build.
    */
  private[streaming] def mergeCellBatch(spark: SparkSession, batch: DataFrame,
                                        collection: String,
                                        centroids: DataFrame): Unit = {
    val d2 = aggregate(zip_with(col("vm"), col("cm"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val delta = batch
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000000, 0).cast("long")).as("vm"))
      .crossJoin(broadcast(centroids))
      .withColumn("dd", d2)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("dd"), col("cid"))).as("cid"))
      .groupBy(col("cid")).agg(count(lit(1)).as("cnt"))
    val existing =
      if (MemDocStore.collections.contains(collection))
        DocumentSink.pullFrom(spark, MemDocStore.Format,
          Map("collection" -> collection))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    val merged = existing.unionByName(delta)
      .groupBy(col("cid")).agg(sum(col("cnt")).as("cnt"))
    DocumentSink.pushTo(merged, MemDocStore.Format,
      Map("collection" -> collection))
  }

  /** Continuous IVF-cell occupancy over an embedding stream — the
    * online cluster-drift monitor (a cell whose share surges marks a
    * distribution shift while a crawl ingests). The stored (cid, cnt)
    * table IS the state, bounded at the centroid count.
    */
  def runCellCounts(stream: DataFrame, collection: String,
                    centroids: DataFrame): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeCellBatch(batch.sparkSession, batch, collection, centroids)
      }
      .start()

  /** Add one batch's fixed-width value-histogram deltas into
    * `collection`: `bin = clamp(floor(value/width), 0, bins−1)` —
    * bin counts are an addition monoid, so the batched maintenance
    * equals the single-pass build and quantiles read off the stored
    * cumulative counts at any moment (the latency-dashboard
    * primitive). State is bounded at `bins` rows forever.
    */
  private[streaming] def mergeHistBatch(spark: SparkSession, batch: DataFrame,
                                        collection: String, valCol: String,
                                        width: Double, bins: Int): Unit = {
    val delta = batch
      .select(least(greatest(floor(col(valCol).cast("double") / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val existing =
      if (MemDocStore.collections.contains(collection))
        DocumentSink.pullFrom(spark, MemDocStore.Format,
          Map("collection" -> collection))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    val merged = existing.unionByName(delta)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    DocumentSink.pushTo(merged, MemDocStore.Format,
      Map("collection" -> collection))
  }

  /** Continuous histogram maintenance over `stream`'s `valCol`. */
  def runHistogram(stream: DataFrame, collection: String, valCol: String,
                   width: Double, bins: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeHistBatch(batch.sparkSession, batch, collection, valCol,
          width, bins)
      }
      .start()
}
