package graft

import graft.core.Tables
import graft.streaming.EventStream

/** Batch/stream equivalence: the shared windowed-totals transform over
  * readStream(file source) must equal the same transform over the batch
  * read (SURVEY.md §2.10 — streaming as the forward-looking twin of the
  * reprocess-everything batch semantics).
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed totals == batch windowed totals") {
    // the parquet file source wants a directory: stage the single file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runToCompletion(spark, dir.toString, "stream_out")
      .select("win_start", "event_type", "n", "total")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val batch = EventStream.windowedTotals(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .select("win_start", "event_type", "n", "total")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
