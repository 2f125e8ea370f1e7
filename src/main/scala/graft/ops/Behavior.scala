package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Behavioral analytics over an event stream: cohort retention, Markov
  * transition estimation, and time-in-state attribution.
  *
  * Mirrors the reference's per-submission activity rollups (trip
  * timelines in R/export.R, validation-status transitions in
  * R/validation.R) generalized to the event-log shape a training-data
  * telemetry pipeline emits.
  *
  * Scale posture: every operator keys its shuffles on `user_id` (or the
  * aggregated state pair), so a 100 TB event log distributes on the
  * natural high-cardinality key; no global-order window ever touches the
  * raw events. All arithmetic is exact integers (epoch seconds / week
  * indexes / counts) until a final shared-shape micro rounding, so the
  * DuckDB oracle reproduces results bit-for-bit at any parallelism.
  */
object Behavior {

  /** Epoch-week index from a timestamp column: `cast(ts as long) div
    * 604800`. Non-negative for any post-1970 stream, so Spark `div`
    * (truncate) and DuckDB `//` (floor) agree. Takes the column NAME —
    * integer `div` has no Column-DSL form (`/` is double division, see
    * the Layout.zKey trap) so the expression is built as SQL text.
    */
  def epochWeek(tsColName: String): org.apache.spark.sql.Column =
    expr(s"cast($tsColName as long) div 604800")

  /** Weekly cohort retention: users are cohorted by their first active
    * week; for every (cohort_week, week_offset) cell, how many of that
    * cohort's users were active `offset` weeks after they arrived.
    *
    * Plan: one distinct over (user, week), one per-user min, one join —
    * all hash-partitioned on `user_id`, so the two big exchanges share a
    * partitioning and the final rollup is over the tiny (cohort, offset)
    * grid. Cells with zero active users are absent (sparse grid — the
    * scaffold-complete operator in [[Reshape]] densifies if a consumer
    * needs the full rectangle).
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val uw = events
      .select(col(userCol).as("u"), epochWeek(tsCol).as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("u")).agg(min(col("wk")).as("cohort_week"))
    uw.join(cohort, "u")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition estimates between event types, per
    * user timeline. Orders each user's events by (ts, eventId) — the id
    * breaks timestamp ties deterministically — takes adjacent pairs via
    * one partitioned lag, and reports each (prev, next) pair's count and
    * its row probability in integer micro-units
    * (`round(n * 1e6 / total_from_prev)` through the shared double shape
    * both engines evaluate identically).
    *
    * The lag window is partitioned by user — the event log's natural
    * distribution key — and the transition matrix itself is
    * |event_type|² rows, so the normalizing window over `prev_type` runs
    * on a bounded table no matter the corpus size.
    */
  def eventTransitions(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", typeCol: String = "event_type",
                       idCol: String = "event_id"): DataFrame = {
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(perUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val perPrev = Window.partitionBy(col("prev_type"))
    pairs.withColumn("p_micro",
      round(col("n_transitions") * 1000000.0 /
        sum(col("n_transitions")).over(perPrev)).cast("long"))
  }

  /** Longest consecutive-day streak per user — the gaps-and-islands
    * maximum run: distinct active days collapse to islands via the
    * classic `day − row_number()` constant (consecutive days share it),
    * then two bounded groupBys (per island, per user). All the
    * fact-table volume dies in the first DISTINCT; the window runs on
    * the per-user day table.
    *
    * @param dayCol integer day number (epoch days or similar)
    * @return (user, n_active_days, longest_streak)
    */
  def longestStreak(df: DataFrame, userCol: String,
      dayCol: String): DataFrame = {
    val days = df.select(col(userCol).as("user"),
      col(dayCol).cast("long").as("day")).distinct()
    val w = Window.partitionBy(col("user")).orderBy(col("day"))
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user"), col("island"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("user"))
      .agg(sum(col("run")).as("n_active_days"),
        max(col("run")).as("longest_streak"))
  }

  /** Two-step Markov transition matrix — the square of the one-step
    * matrix in EXACT integer micro-units: one-step probabilities are
    * `p(a,b) = (n_ab · 1e6) div n_a` (truncating div on non-negative
    * counts — engine-identical), and the square is
    * `p²(a,c) = (Σ_b p(a,b)·p(b,c)) div 1e6` — integer products (≤
    * 1e12) summed exactly over the mid state before the single closing
    * division, so matrix composition introduces no float anywhere.
    *
    * Scale: the per-user lag window is the only fact-table pass; the
    * matrix itself is |states|² rows, so the self-join square is a
    * dimension-table operation regardless of corpus size.
    *
    * @return (from_type, to_type, p2_micro) for every 2-hop-reachable
    *         pair
    */
  def markovTwoStep(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val p1 = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("b"))
      .withColumn("a", lag(col("b"), 1).over(perUser))
      .filter(col("a").isNotNull)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("na", sum(col("n")).over(Window.partitionBy(col("a"))))
      .withColumn("p_micro", expr("(n * 1000000) div na"))
      .select(col("a"), col("b"), col("p_micro"))
    p1.as("x").join(p1.as("y"), col("x.b") === col("y.a"))
      .groupBy(col("x.a").as("from_type"), col("y.b").as("to_type"))
      .agg(sum(col("x.p_micro") * col("y.p_micro")).as("pp"))
      .select(col("from_type"), col("to_type"),
        expr("pp div 1000000").as("p2_micro"))
  }

  /** Stationary distribution of the one-step transition matrix by
    * `rounds` unrolled integer power iterations: π'_j = (Σ_i π_i ·
    * p_ij) div 1e6 with the same truncating-div fixed point as
    * [[markovTwoStep]] (non-negative operands — engine-identical), π₀
    * uniform micro. States missing as a target in some round keep a
    * zero row (left join against the state dimension), so the output
    * schema is stable and the oracle can replay every floor.
    *
    * Scale: one per-user lag pass builds the |states|² matrix; the
    * iteration is |states|-sized joins — dimension work. Floor
    * truncation bleeds ≤|states| micro of mass per round by design
    * (the spec pins the bound).
    */
  def markovStationary(events: DataFrame, rounds: Int = 6,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "unrolled rounds out of range")
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val p1 = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("b"))
      .withColumn("a", lag(col("b"), 1).over(perUser))
      .filter(col("a").isNotNull)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("na", sum(col("n")).over(Window.partitionBy(col("a"))))
      .withColumn("p_micro", expr("(n * 1000000) div na"))
      .select(col("a"), col("b"), col("p_micro"))
      // checkpoint the SHARED INPUT (shallow plan), return the fold
      // LAZILY: materializing the fold itself (persist/localCheckpoint)
      // executes it without AQE's runtime coalescing/broadcasts —
      // measured 0.9 s (lazy, action path) vs 4-6 s (eager) at sf0.1
      .checkpointEager()
    val states = p1.select(col("a").as("state")).distinct()
      .unionByName(p1.select(col("b").as("state")).distinct()).distinct()
    val pi0 = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("k"))))
      .select(col("state"), expr("1000000 div k").as("pi_micro"))
    val piN = (1 to rounds).foldLeft(pi0) { (pi, _) =>
      val stepped = pi.join(p1, pi("state") === p1("a"))
        .groupBy(col("b").as("state2"))
        .agg(sum(col("pi_micro") * col("p_micro")).as("m"))
      states.join(stepped, col("state") === col("state2"), "left")
        .select(col("state"),
          coalesce(expr("m div 1000000"), lit(0L)).as("pi_micro"))
    }
    piN.select(col("state"), col("pi_micro"))
  }

  /** First/last-touch conversion attribution: each conversion event
    * credits the FIRST and the LAST preceding touch event by the same
    * user within `windowSec` — the two bookend rules of marketing
    * attribution (any position-based blend interpolates between them).
    * One per-user equi-join bounded by the window filter, then two
    * partial-aggregating argmin/argmax picks per conversion (the
    * min_by-struct shape — no window over the joined stream);
    * conversions with no touch in window keep null credits.
    *
    * @return (conv_id, conv_sec, cents, first_touch_id, last_touch_id,
    *         n_touches)
    */
  def touchAttribution(events: DataFrame, convType: String,
      touchType: String, windowSec: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(idCol).as("conv_id"),
        col(tsCol).cast("long").as("conv_sec"),
        round(col(valueCol) * 100, 0).cast("long").as("cents"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("u"), col(idCol).as("t_id"),
        col(tsCol).cast("long").as("t_sec"))
    val inWindow = conv.join(touch, Seq("u"))
      .filter(col("t_sec") <= col("conv_sec")
        && col("t_sec") > col("conv_sec") - windowSec)
    val credits = inWindow.groupBy(col("conv_id"))
      .agg(min_by(col("t_id"), struct(col("t_sec"), col("t_id")))
          .as("first_touch_id"),
        max_by(col("t_id"), struct(col("t_sec"), col("t_id")))
          .as("last_touch_id"),
        count(lit(1)).as("n_touches"))
    conv.join(credits, Seq("conv_id"), "left")
      .na.fill(0L, Seq("n_touches"))
      .select(col("conv_id"), col("conv_sec"), col("cents"),
        col("first_touch_id"), col("last_touch_id"), col("n_touches"))
  }

  /** Ordered funnel conversion within a time window: users enter at
    * their FIRST `steps(0)` event; each later step must occur at or
    * after the previous step's completion and within `windowSec` of the
    * funnel entry. Output: one row per step with the surviving user
    * count and its micro-unit conversion rate relative to step 1.
    *
    * Staged per-user min-aggregations — step i is one equi-join on
    * `user_id` against the step-(i−1) survivors plus one groupBy, so
    * every shuffle keys on the natural user key and the per-step count
    * rows are single-row aggregates. Exact integer epoch-micros
    * throughout; the one division is the shared micro shape.
    */
  def funnelConversion(events: DataFrame, steps: Seq[String], windowSec: Long,
                       userCol: String = "user_id", tsCol: String = "ts",
                       typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(windowSec > 0, "window must be positive")
    val winUs = windowSec * 1000000L
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("us"))
    val first = e.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("us")).as("t"))
      .withColumn("deadline", col("t") + winUs)
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("et") === step)
        .join(prev.select(col("u"), col("t").as("tprev"), col("deadline")), "u")
        .filter(col("us") >= col("tprev") && col("us") <= col("deadline"))
        .groupBy(col("u"))
        .agg(min(col("us")).as("t"), min(col("deadline")).as("deadline"))
    }
    val rows = stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
    rows.crossJoin(broadcast(first.agg(count(lit(1)).as("n1"))))
      .select(col("step_idx"), col("step"), col("n_users"),
        when(col("n1") > 0,
          round(col("n_users").cast("double") * 1000000.0 / col("n1")).cast("long"))
          .otherwise(lit(0L)).as("conv_micro"))
  }

  /** Top-N most common session-opening paths: each user's first `k`
    * event types (by (ts, eventId)) joined with `>`, counted across
    * users. One per-user rank window (partitioned on the user key), an
    * order-insensitive collect re-sorted by rank inside the row, and a
    * distributed TakeOrdered for the top-N — no global sort.
    */
  def topPaths(events: DataFrame, k: Int, topN: Int,
               userCol: String = "user_id", tsCol: String = "ts",
               typeCol: String = "event_type",
               idCol: String = "event_id"): DataFrame = {
    require(k > 0 && topN > 0, "k and topN must be positive")
    val perUser = Window.partitionBy(col("u"))
      .orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol).as("u"), col(tsCol), col(idCol), col(typeCol).as("et"))
      .withColumn("rn", row_number().over(perUser))
      .filter(col("rn") <= k)
      .groupBy(col("u"))
      // collect_list order is nondeterministic under parallel merge —
      // sort by the embedded rank, then project the types
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("rn"), col("et")))),
          x => x.getField("et"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topN)
  }

  /** Total dwell time per event type: the gap between consecutive events
    * of one user is attributed to the EARLIER event's type (the state the
    * user was in while the clock ran). Each user's last event has no
    * successor and contributes no interval. Exact integer epoch-second
    * arithmetic throughout.
    */
  def timeInState(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts", typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    events
      // keep the full-resolution timestamp for the window ordering —
      // the floored `sec` would reorder same-second events
      .select(col(userCol), col(idCol), col(tsCol), col(typeCol).as("state"),
        expr(s"cast($tsCol as long)").as("sec"))
      .withColumn("next_sec", lead(col("sec"), 1).over(perUser))
      .filter(col("next_sec").isNotNull)
      .groupBy(col("state"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("next_sec") - col("sec")).as("total_sec"))
  }

  /** Conversion attribution over the event log: for every conversion
    * event, credit the LAST touch (most recent non-conversion event of
    * the same user strictly before it, within `windowSec`) and the
    * FIRST touch (the user's earliest preceding non-conversion event,
    * unwindowed — the classic first-touch definition). Emits per-channel
    * credit counts; conversions with no qualifying touch fall out of
    * the respective count.
    *
    * Determinism: the per-user ordering is (full-resolution ts,
    * event_id); both touch lookups are IGNORE-NULLS window navigations
    * over the strictly-preceding frame, so each conversion resolves to
    * exactly one row in any engine. All integer epoch-second
    * arithmetic.
    *
    * Scale shape: one shuffle keyed on the user, windows bounded by
    * per-user timelines; the channel aggregate is a
    * partial-combining groupBy over type-cardinality keys.
    */
  def attribution(events: DataFrame, convType: String, windowSec: Long,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    val before = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol) =!= convType
    val marked = events.select(col(userCol), col(idCol), col(tsCol),
        col(typeCol), expr(s"cast($tsCol as long)").as("sec"))
      .withColumn("last_ch", last(when(isTouch, col(typeCol)), ignoreNulls = true).over(before))
      .withColumn("last_sec", last(when(isTouch, col("sec")), ignoreNulls = true).over(before))
      .withColumn("first_ch", first(when(isTouch, col(typeCol)), ignoreNulls = true).over(before))
      .filter(col(typeCol) === convType)
    val lastCredit = marked
      .filter(col("last_ch").isNotNull && col("sec") - col("last_sec") <= windowSec)
      .groupBy(col("last_ch").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"))
    val firstCredit = marked
      .filter(col("first_ch").isNotNull)
      .groupBy(col("first_ch").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    lastCredit.join(firstCredit, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"),
        coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"))
  }

  /** Daily active/new/cumulative-distinct user counts — the growth
    * dashboard primitive ("users to date"). COUNT(DISTINCT) per day
    * plus a running total of first-seen users; the cumulative sum runs
    * over the per-DAY aggregate, whose cardinality is bounded by the
    * calendar (a decade is ~3,650 rows), so the single-task window is
    * safe by construction — the fact-table work is two
    * partial-combining groupBys keyed on (user) and (day, user).
    *
    * All integer epoch-day arithmetic (`cast(ts as long) div 86400` —
    * the shared cross-engine shape).
    */
  def cumulativeDistinct(events: DataFrame, userCol: String = "user_id",
                         tsCol: String = "ts"): DataFrame = {
    val du = events.select(expr(s"cast($tsCol as long) div 86400").as("day"),
        col(userCol).as("u"))
      .distinct()
    val active = du.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val firstSeen = du.groupBy(col("u")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(firstSeen, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(byDay))
  }

  /** Backtest of the Markov-1 next-event predictor: the transition
    * matrix trains on events BEFORE `cutoffDay` (argmax next type per
    * context, ties to the lexicographically smaller type), then every
    * post-cutoff transition scores against its prediction — the
    * temporal-split evaluation that keeps the model from grading its
    * own training data. One lag pass + bounded matrix argmax + one
    * scoring join on the context type.
    *
    * @return (prev_type, predicted, n_test, n_correct, acc_milli)
    */
  def markovBacktest(events: DataFrame, cutoffDay: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("b"),
        expr(s"cast($tsCol as long) div 86400").as("day"))
      .withColumn("a", lag(col("b"), 1).over(perUser))
      // the transition is assigned to the day of its SECOND event;
      // train pairs must complete before the cutoff
      .filter(col("a").isNotNull)
      .persist()
    try {
    // argmax over the bounded |types|² matrix: best next type per
    // context, ties to the smaller type
    val wA = Window.partitionBy(col("a")).orderBy(col("n").desc, col("b").asc)
    val model = pairs.filter(col("day") < cutoffDay)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      .select(col("a"), col("b").as("predicted"))
    val test = pairs.filter(col("day") >= cutoffDay)
    test.join(model, "a")
      .groupBy(col("a").as("prev_type"), col("predicted"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("b") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_milli",
        round(col("n_correct").cast("double") * 1000.0
          / col("n_test").cast("double"), 0).cast("long"))
      .checkpointEager()
    } finally pairs.unpersist(false)
  }

  /** Churn-label construction with temporal hygiene: features aggregate
    * STRICTLY from events on or before `cutoffDay`; the label is "no
    * activity in the following `horizonDays`" — the future window the
    * features must never see (the leakage rule every churn training
    * set lives or dies by; the crossValNb leakage canary is the model-
    * side twin of this audit). One pass per side, one anti-join-shaped
    * left join on the user key.
    *
    * @return (user_id, n_events, n_purchases, n_days_active, recency_days,
    *         spend_cents, churned)
    */
  def churnLabels(events: DataFrame, cutoffDay: Long, horizonDays: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value"): DataFrame = {
    val ev = events.select(col(userCol).as("user_id"),
      expr(s"cast($tsCol as long) div 86400").as("day"),
      col(typeCol).as("et"),
      round(col(valueCol) * 100, 0).cast("long").as("cents"))
    val feats = ev.filter(col("day") <= cutoffDay)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("et") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        countDistinct(col("day")).as("n_days_active"),
        (lit(cutoffDay) - max(col("day"))).as("recency_days"),
        sum(col("cents")).as("spend_cents"))
    val future = ev
      .filter(col("day") > cutoffDay && col("day") <= cutoffDay + horizonDays)
      .select(col("user_id")).distinct()
      .withColumn("active", lit(true))
    feats.join(future, Seq("user_id"), "left")
      .withColumn("churned", coalesce(!col("active"), lit(true)))
      .drop("active")
  }

  /** RFM segmentation: per-user recency/frequency/monetary quartile
    * codes (1..4, 4 best — low recency, high frequency, high spend),
    * rolled up to segment sizes and value. Quartiles come from the
    * two-phase global rank ([[graft.ext.CorpusOps.quantileBuckets]] —
    * never a partition-less window over the user table), ties broken
    * by user id, money as exact integer cents.
    *
    * @return (segment, r_code, f_code, m_code, n_users,
    *         mean_monetary_milli) per non-empty segment
    */
  def rfmSegments(events: DataFrame, refDay: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val per = events.select(col(userCol).as("user_id"),
        expr(s"cast($tsCol as long) div 86400").as("day"),
        round(col(valueCol) * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg((lit(refDay) - max(col("day"))).as("recency"),
        count(lit(1)).as("freq"), sum(col("cents")).as("monetary"))
      .persist()
    try {
    def codes(c: String, best: String) = {
      val b = graft.ext.CorpusOps.quantileBuckets(per, "user_id", col(c), 4)
        .select(col("id").as("user_id"), col("bucket"))
      if (best == "low") b.select(col("user_id"), (lit(4L) - col("bucket")).as(s"${c}_code"))
      else b.select(col("user_id"), (col("bucket") + 1L).as(s"${c}_code"))
    }
    per
      .join(codes("recency", "low"), "user_id")
      .join(codes("freq", "high"), "user_id")
      .join(codes("monetary", "high"), "user_id")
      .groupBy((col("recency_code") * 100 + col("freq_code") * 10
          + col("monetary_code")).as("segment"),
        col("recency_code").as("r_code"), col("freq_code").as("f_code"),
        col("monetary_code").as("m_code"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("monetary")).cast("double") * 10.0
          / count(lit(1)).cast("double"), 0).cast("long")
          .as("mean_monetary_milli"))
      .checkpointEager()
    } finally per.unpersist(false)
  }
}
