package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.Sessionize

/** Gap-sessionization: the stateful streaming operator must produce
  * exactly the batch twin's sessions minus each user's (still-open)
  * final session.
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private val gap = 2L * 3600L * 1000000L // 2h in micros

  test("streaming flatMapGroupsWithState == batch sessions minus open tails") {
    val dir = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))

    val batchEvents = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("ts_micros"), $"value")
    val batch = Sessionize.sessionizeBatch(batchEvents, gap)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)

    val streamed = Sessionize.runToCompletion(spark, dir.toString, gap, "sess_out")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    // open tails = per user, the session with the max start
    val w = Window.partitionBy($"user_id").orderBy($"session_start".desc)
    val tails = Sessionize.sessionizeBatch(batchEvents, gap)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    assert(streamed === (batch -- tails))
  }
}
