package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key streaming admission quota on the arbitrary-state v2 API
  * (`transformWithState`, Spark 4.x): admit at most `n` rows per key
  * over the lifetime of the stream, drop the rest — the continuous
  * source-cap every ingest pipeline puts in front of a crawl feed (no
  * single domain/source may flood the corpus). The batch twin is a
  * row_number-over-arrival window; the streaming form needs only a
  * per-key COUNTER, not the rows themselves: O(keys) state, unlike the
  * window's full materialization.
  *
  * Why `transformWithState` and not `flatMapGroupsWithState`: the v2
  * API gives typed named state (ValueState here), per-state TTL, and
  * timers — this operator needs just the counter, but the shape is the
  * template for richer processors (and Sessionize keeps the v1 example
  * alongside). Requires the RocksDB state-store provider
  * ([[StreamQuota.configure]] sets it — the default HDFS provider does
  * not support the v2 operator).
  */
object StreamQuota {

  /** Admission counter per key: admit while count < n. */
  class QuotaProcessor[I](n: Long) extends StatefulProcessor[String, I, I] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[I],
                                 timerValues: TimerValues): Iterator[I] = {
      var c = if (admitted.exists()) admitted.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[I]
      rows.foreach { r => if (c < n) { c += 1; out += r } }
      admitted.update(c)
      out.iterator
    }
  }

  /** Point the session at the RocksDB state store (required by
    * transformWithState). Returns the previous provider so tests can
    * restore it.
    */
  def configure(spark: SparkSession): String = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    prev
  }

  /** Admit the first `n` rows per key, in arrival order. */
  def admitFirstN[I: Encoder](ds: Dataset[I], key: I => String, n: Long): Dataset[I] =
    ds.groupByKey(key)(Encoders.STRING)
      .transformWithState(new QuotaProcessor[I](n), TimeMode.None(), OutputMode.Append())
}
