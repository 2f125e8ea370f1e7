package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — gap-based user sessions over the event stream,
  * in both execution modes:
  *
  *  - batch: the classic lag/gap/cumulative-sum window dataflow (one
  *    shuffle on user_id);
  *  - streaming: `flatMapGroupsWithState` with per-user state and an
  *    event-time-ish gap close, the KeyValueGroupedDataset custom-state
  *    surface.
  *
  * The reference pipeline has no streaming (SURVEY.md §2.10); this is a
  * beyond-reference operator for the event table, with the batch twin
  * serving as its oracle in tests. State per key is O(1) (an open
  * session summary), so memory scales with active users, not events.
  */
object Sessionize {

  case class Event(user_id: Long, ts_micros: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class UserSession(user_id: Long, session_start: Long, session_end: Long,
                         n_events: Long, total_value: Double)

  /** Batch twin: gap > gapMicros starts a new session (lag + cumulative
    * sum of boundaries), then per-session aggregate.
    */
  def sessionizeBatch(events: DataFrame, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_micros"))
    events
      .withColumn("prev", lag(col("ts_micros"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_micros") - col("prev") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts_micros")).as("session_start"),
        max(col("ts_micros")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("total_value"))
      .drop("session_no")
  }

  /** Streaming: one SessionState per user; events beyond the gap flush
    * the open session. On stream end (timeout/finished source) remaining
    * state is flushed by a final sentinel pass in the test harness.
    */
  def sessionizeStreaming(spark: SparkSession, events: Dataset[Event],
                          gapMicros: Long): Dataset[UserSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // events arrive per micro-batch; sort within the group for
          // deterministic gap logic on the finite file source
          val sorted = it.toSeq.sortBy(e => (e.ts_micros, e.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val cents = math.round(e.value * 100)
            if (st == null) {
              st = SessionState(e.ts_micros, e.ts_micros, 1L, cents.toDouble)
            } else if (e.ts_micros - st.last > gapMicros) {
              out += UserSession(userId, st.start, st.last, st.n, st.total / 100.0)
              st = SessionState(e.ts_micros, e.ts_micros, 1L, cents.toDouble)
            } else {
              st = SessionState(st.start, e.ts_micros, st.n + 1, st.total + cents)
            }
          }
          if (st != null) state.update(st) else state.remove()
          out.iterator
      }
  }

  /** Run the streaming sessionizer over the (finite) events file and
    * return the CLOSED sessions. Each user's final session stays open in
    * state (a real stream would close it by timeout); the batch twin's
    * result equals closed ∪ {last session per user}, which is exactly
    * what SessionizeSpec asserts.
    */
  def runToCompletion(spark: SparkSession, path: String, gapMicros: Long,
                      queryName: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream.schema(EventStream.rawSchema(spark, path)).parquet(path)
    val raw = graft.core.Tables.normalizeEventTs(src)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_micros"), col("value"))
      .as[Event]
    val q = sessionizeStreaming(spark, raw, gapMicros)
      .writeStream.outputMode("append").format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
