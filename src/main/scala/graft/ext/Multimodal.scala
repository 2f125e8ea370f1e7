package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media carried as opaque `binary` columns
  * with a typed metadata struct, and a partition-wise decode/featurize
  * stage.
  *
  * The Spark side is real and tested — schema, partitioning, batch
  * iteration shape — while the actual codec is STUBBED with a
  * deterministic fake (this container has no image/audio libraries). A
  * real deployment swaps `fakeDecode` for the JNI/FFmpeg/PIL call; the
  * `mapPartitions` seam is exactly where per-partition codec state
  * (decoder handles, GPU context) would be initialized once per task
  * rather than per row — the reason this is NOT a per-row UDF.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("declared_bytes", LongType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("n_frames", LongType),
    StructField("head_byte", IntegerType),
    StructField("checksum", LongType)))

  /** STUB CODEC — deterministic fake standing in for a real media
    * decoder. Derives "frames" and a checksum purely from the bytes so
    * tests are reproducible. ??? in production terms: replace with the
    * real decode.
    */
  def fakeDecode(payload: Array[Byte]): (Long, Int, Long) = {
    val nFrames = payload.length / 256L + 1L
    val head = if (payload.isEmpty) -1 else payload(0) & 0xff
    var sum = 0L
    var i = 0
    // mod at each step: keeps the fold in-range on engines that error on
    // 64-bit overflow instead of wrapping
    while (i < math.min(payload.length, 64)) {
      sum = (sum * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1
    }
    (nFrames, head, sum)
  }

  /** Build a media table from the documents fixture: payload = UTF-8
    * bytes of the text (standing in for image/audio bytes).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/utf-8").as("kind"), col("n_chars").as("declared_bytes")).as("meta"))

  /** Evenly-spaced frame sampling over decoded media: for each item,
    * emit `k` frame-index rows spanning [0, n_frames) — the video
    * training-data pattern (sample k frames per clip, decode only
    * those). Pure `sequence` + `explode` (a Generate, per-row expansion
    * inside codegen, no shuffle); sampled index i of k is
    * floor(i·n_frames/k), so the schedule is integer-exact and
    * engine-reproducible. Items with fewer frames than k yield each
    * frame at most once (distinct indices).
    */
  def sampleFrames(features: DataFrame, k: Int): DataFrame =
    features
      // frameless or undecoded items have nothing to sample — without
      // this guard, n_frames = 0 emitted a phantom frame 0 and null
      // emitted a null index, both outside the [0, n_frames) contract
      .filter(col("n_frames").isNotNull && col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(array_distinct(transform(sequence(lit(0), lit(k - 1)),
          i => floor(i.cast("long") * col("n_frames") / k)))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("n_frames"))

  /** Content-addressable blob manifest — exact media dedup by digest,
    * the first pass every multimodal ingest runs (identical bytes are
    * common at crawl scale: re-hosted images, mirrored clips). One
    * hash-groupBy on the md5 of the payload: map-side partial
    * aggregation, no byte array ever shuffles twice; the canonical copy
    * is the smallest id, bytes are accounted per digest. md5 is
    * engine-standard, so the manifest is oracle-checkable.
    */
  def blobManifest(media: DataFrame): DataFrame =
    media.groupBy(md5(col("payload")).as("digest"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("media_id")).as("canonical_id"),
        sum(length(col("payload")).cast("long")).as("total_bytes"))

  /** Partition-wise decode/featurize: one iterator pass per partition,
    * batch-shaped like an Arrow/pandas UDF would be. The decoder is
    * initialized once per partition (here trivially; in production this
    * is the expensive codec/GPU setup).
    */
  def featurize(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"), col("meta.kind").as("kind"))
      .mapPartitions { rows =>
        // per-partition decoder init happens here (stubbed)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val kind = r.getString(2)
          val (frames, head, sum) = fakeDecode(payload)
          Row(id, kind, payload.length.toLong, frames, head, sum)
        }
      }(enc)
  }
}
