package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Continuous per-key top-k items on the arbitrary-state v2 API —
  * the live "top domains per source" / "top error codes per service"
  * leaderboard next to the batch TakeOrdered.
  *
  * State design (the third v2-API shape in this engine, next to
  * [[StreamQuota]]'s ValueState counter and
  * [[SessionizeV2]]'s event-time timers): a [[MapState]] holding
  * item → running count per key, plus a ValueState with the key's total
  * rows processed. After each batch that touches a key, the processor
  * emits that key's CURRENT top-k snapshot (count desc, item asc —
  * deterministic ties) tagged with the running total, so a consumer
  * keeps the row set with the highest `key_total` per key as "current"
  * (the tag makes snapshot generations order-independent to read).
  *
  * Scale posture: state is O(distinct items per key) — right when the
  * item domain is bounded (event types, status codes, registered
  * domains). For unbounded domains (raw URLs) this state grows without
  * bound; that regime belongs to the sketched maintenance path
  * ([[StreamSketch]]'s Count-Min cells, O(d·w) forever) at the price of
  * approximate counts. The two operators are the exact/approximate pair
  * of the same query, like exact percentile vs percentileSketch.
  */
object StreamTopK {

  /** One leaderboard row: the key's top items as of `keyTotal` rows. */
  case class TopItem(key: String, item: String, cnt: Long, keyTotal: Long)

  class TopKProcessor(k: Int)
      extends StatefulProcessor[String, (String, String), TopItem] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
                                 timerValues: TimerValues): Iterator[TopItem] = {
      var t = if (total.exists()) total.get() else 0L
      rows.foreach { case (_, item) =>
        val c = if (counts.containsKey(item)) counts.getValue(item) else 0L
        counts.updateValue(item, c + 1L)
        t += 1L
      }
      total.update(t)
      counts.iterator().toSeq
        .sortBy { case (item, c) => (-c, item) }
        .take(k)
        .map { case (item, c) => TopItem(key, item, c, t) }
        .iterator
    }
  }

  /** Maintain and emit the per-key top-`k` item leaderboard. */
  def topKPerKey(ds: Dataset[(String, String)], k: Int): Dataset[TopItem] = {
    implicit val enc = Encoders.product[TopItem]
    ds.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
