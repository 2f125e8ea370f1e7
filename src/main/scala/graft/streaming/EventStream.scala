package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference pipeline is batch-only
  * (SURVEY.md §2.10 — a 2-day cron that reprocesses the full snapshot),
  * so streaming here is the forward-looking twin: the SAME windowed
  * aggregation as the batch query q36_window_tumbling, expressed over
  * `readStream`, with an event-time watermark for late data.
  *
  * The transform is shared (one function, two callers) — the core Spark
  * property that batch and streaming share a logical-plan vocabulary.
  */
object EventStream {

  /** Physical schema of the events files at `path`, discovered from the
    * parquet footers (a metadata-only batch read — no data scan). The
    * file source needs an explicit schema; discovering it instead of
    * pinning one keeps the streaming path schema-on-read like the batch
    * loader ([[graft.core.Tables.normalizeEventTs]]).
    *
    * PRECONDITION: at least one file must match `path` at call time (a
    * footer read needs a footer) — an initially-empty stream directory
    * needs a caller-pinned schema instead. Sets the `nanosAsLong`
    * legacy conf itself so TIMESTAMP(NANOS) files are readable by ANY
    * caller, not only those that came through [[readEvents]].
    */
  def rawSchema(spark: SparkSession, path: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path).schema
  }

  /** Shared transform: 6h tumbling windows per event type with exact
    * cents totals. Works on both batch and streaming inputs, and on any
    * physical encoding of `ts` (nanos long / timestamp / timestamp_ntz).
    */
  def windowedTotals(events: DataFrame): DataFrame =
    graft.core.Tables.normalizeEventTs(events)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total"))

  /** Streaming read of the events file(s); `path` may be a glob. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema(spark, path)).parquet(path)
  }

  /** Run the streaming aggregation to completion over the (finite) file
    * source and return the result table — used by tests to assert
    * batch/stream equivalence.
    */
  def runToCompletion(spark: SparkSession, path: String, queryName: String): DataFrame = {
    val q = windowedTotals(readEvents(spark, path))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
