package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling for keyed time series — the sensor/metric repair pass
  * (null = missing reading): linear interpolation between the nearest
  * observed neighbors, falling back to LOCF / NOCB at the edges.
  *
  * The interpolation is EXACT integer arithmetic:
  * `(v1·(t2−t) + v2·(t−t1)) div (t2−t1)` over integer timestamps and
  * integer (fixed-point) values — all operands non-negative, so Spark's
  * truncating `div` and DuckDB's flooring `//` agree and the fill is
  * bit-reproducible in any engine.
  *
  * One exchange: both neighbor lookups are window frames over the same
  * (partition, order) — Spark plans them on a single sort. The frames
  * are `last(… IGNORE NULLS)` over (unbounded, −1) and
  * `first(… IGNORE NULLS)` over (+1, unbounded): linear state per
  * partition, no self-join, no per-gap scan.
  */
object TimeSeries {

  /** Subsequence similarity search over keyed time series (the
    * distributed "find windows that look like this one" primitive of
    * the time-series similarity-search literature, e.g. EDBT'19 /
    * SIGMOD'20 streaming-similarity lines): slide a length-`w` window
    * over every key's time-ordered integer readings, score each window
    * against the query pattern by SQUARED EUCLIDEAN distance in exact
    * integer units (Σ(aᵢ−bᵢ)² over fixed-point longs — no float ever,
    * so the global top-k is reproducible bit-for-bit in any engine),
    * and return the k best (ties by the window's head row id).
    *
    * Scale shape: window extraction is one partitioned sort (the frame
    * collect is per-key, arrays of length w); the pattern is a one-row
    * broadcast; scoring is per-row codegen; global top-k is Spark's
    * TakeOrdered (per-partition heaps + driver merge of k·partitions
    * rows — never a full sort). A z-normalized variant would divide by
    * per-window σ — that belongs in micro-units if added; this exact
    * form is the conformance anchor.
    *
    * @param pattern one row with an array<long> column `pw`, length w
    */
  def subsequenceTopK(df: DataFrame, partCols: Seq[String], tsCol: String,
                      idCol: String, valCol: String,
                      pattern: DataFrame, w: Int, k: Int): DataFrame = {
    val frame = Window.partitionBy(partCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, w - 1)
    val wins = df
      .withColumn("win", collect_list(col(valCol)).over(frame))
      .filter(size(col("win")) === w)
    wins.crossJoin(broadcast(pattern))
      .withColumn("dist_c2",
        aggregate(zip_with(col("win"), col("pw"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      .orderBy(col("dist_c2"), col(idCol))
      .limit(k)
      .select((partCols.map(col) :+ col(idCol) :+ col("dist_c2")): _*)
  }

  /** Z-NORMALIZED subsequence search — the shape-matching form of
    * [[subsequenceTopK]] (UCR-style semantics: a window matches the
    * pattern up to affine scaling). Uses the closed form
    * `d² = 2w·(1 − corr(a, b))` over z-normalized windows, with corr
    * computed from FIVE exact integer sufficient statistics
    * (Σa, Σa², Σb, Σb², Σab): the only doubles are one shared-shape
    * quotient and its micro-rounding, so the top-k order is
    * engine-reproducible. Zero-variance windows (flat lines — undefined
    * z-norm) are excluded by the exact integer test `w·Σa² − (Σa)² > 0`.
    * Same plan shape as the exact variant; the variance products exceed
    * 64 bits, so they are cast to double BEFORE multiplying (both
    * engines, same shape).
    */
  def znSubsequenceTopK(df: DataFrame, partCols: Seq[String], tsCol: String,
                        idCol: String, valCol: String,
                        pattern: DataFrame, w: Int, k: Int): DataFrame = {
    val frame = Window.partitionBy(partCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, w - 1)
    def sumArr(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0L), (acc, x) => acc + x)
    val pstats = pattern.select(col("pw"),
      sumArr(col("pw")).as("sb"),
      sumArr(transform(col("pw"), x => x * x)).as("sbb"))
    val wins = df
      .withColumn("win", collect_list(col(valCol)).over(frame))
      .filter(size(col("win")) === w)
      .withColumn("sa", sumArr(col("win")))
      .withColumn("saa", sumArr(transform(col("win"), x => x * x)))
      .filter(lit(w.toLong) * col("saa") - col("sa") * col("sa") > 0)
    wins.crossJoin(broadcast(pstats))
      .withColumn("sab", sumArr(zip_with(col("win"), col("pw"), (a, b) => a * b)))
      .withColumn("corr",
        (lit(w.toLong) * col("sab") - col("sa") * col("sb")).cast("double")
          / sqrt((lit(w.toLong) * col("saa") - col("sa") * col("sa")).cast("double")
            * (lit(w.toLong) * col("sbb") - col("sb") * col("sb")).cast("double")))
      .withColumn("znd2_micro",
        round(lit(2.0 * w) * (lit(1.0) - col("corr")) * 1000000, 0).cast("long"))
      .orderBy(col("znd2_micro"), col(idCol))
      .limit(k)
      .select((partCols.map(col) :+ col(idCol) :+ col("znd2_micro")): _*)
  }

  /** Debounce/throttle per key: keep an event only if it starts a new
    * burst — i.e. it is MORE than `gap` after the previous event of its
    * key (event time). Burst semantics, not a plain lag filter: rows
    * inside a burst chain onto the kept head even when their immediate
    * predecessor was itself dropped — which is exactly the
    * gaps-and-islands head row, and the head is the row whose distance
    * to its predecessor exceeds the gap, so ONE lag window suffices (no
    * island renumbering pass). `tsCol` must be unique per key for a
    * deterministic order.
    */
  def debounce(df: DataFrame, partCols: Seq[String], tsCol: String,
               gap: Long): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(tsCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull || col(tsCol) - col("__prev") > gap)
      .drop("__prev")
  }

  /** @param tsCol  integer (epoch-seconds-like) NON-NULL ordering column,
    *               unique within a partition for a true interpolation
    *               (ties fall back to LOCF)
    * @param valCol integer fixed-point reading; NULL = missing
    * @return input plus `filled` (the repaired value; stays NULL only
    *         when a partition has no observation at all) and
    *         `fill_method` ∈ observed | interp | locf | nocb | none
    */
  def fillInterpolate(df: DataFrame, partCols: Seq[String],
                      tsCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(tsCol))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    val v = col(valCol)
    val staged = df.select(col("*"),
      last(v, ignoreNulls = true).over(before).as("__pv"),
      last(when(v.isNotNull, col(tsCol)), ignoreNulls = true).over(before).as("__pt"),
      first(v, ignoreNulls = true).over(after).as("__nv"),
      first(when(v.isNotNull, col(tsCol)), ignoreNulls = true).over(after).as("__nt"))
    val canInterp = col("__pv").isNotNull && col("__nv").isNotNull &&
      col("__nt") > col("__pt")
    staged
      .withColumn("__num",
        col("__pv") * (col("__nt") - col(tsCol)) + col("__nv") * (col(tsCol) - col("__pt")))
      .withColumn("__den", col("__nt") - col("__pt"))
      .withColumn("fill_method",
        when(v.isNotNull, lit("observed"))
          .when(canInterp, lit("interp"))
          .when(col("__pv").isNotNull, lit("locf"))
          .when(col("__nv").isNotNull, lit("nocb"))
          .otherwise(lit("none")))
      .withColumn("filled",
        when(v.isNotNull, v)
          .when(canInterp, expr("__num div __den"))
          .when(col("__pv").isNotNull, col("__pv"))
          .when(col("__nv").isNotNull, col("__nv")))
      .drop("__pv", "__pt", "__nv", "__nt", "__num", "__den")
  }

  /** Sequential per-key FOLDS in exact integer arithmetic — the two
    * canonical "inherently recursive" window computations that plain
    * SQL windows cannot express (the recurrence references its own
    * previous output), done as a per-key `aggregate()` left fold over
    * the key's time-ordered value list. Engine-portable by
    * construction: DuckDB replays the identical fold with
    * `list_reduce` (spec- and oracle-pinned).
    *
    * Scale shape: ONE partial-combining groupBy per key collects the
    * ordered list, then the fold is a per-row expression. A key's full
    * history must fit one aggregation buffer — the right regime for
    * entity-level histories (orders per customer, readings per
    * device); a million-event single key would need a segmented
    * fold (chunk-local folds + carry composition), which both these
    * recurrences admit but which is not implemented here.
    */

  /** Fixed-point exponential moving average per key:
    * `ema ← (num·x + (den−num)·ema) div den`, seeded with the first
    * value. `num/den` ≈ the smoothing alpha in integer fixed point;
    * all operands non-negative integers, so `div` ≡ DuckDB `//` and
    * the result is bit-identical in any engine.
    *
    * @param orderCols total order within a key (include unique
    *                  tie-breaks; ties that remain must carry equal
    *                  values for the fold to stay order-invariant)
    * @param valCol    NON-NEGATIVE integer value (fixed-point cents);
    *                  NULLs dropped
    * @return (key, n, last_val, ema) — `den·ema` must fit in 64 bits
    */
  def emaFixedPoint(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valCol: String, num: Long, den: Long): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need 0 < num <= den")
    val sorted = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(valCol).cast("long").as("__v"): _*)))
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"), sorted.as("__s"))
      .withColumn("__vals", expr("transform(__s, x -> x.__v)"))
      .select(col("key"), col("n"),
        expr("element_at(__vals, -1)").as("last_val"),
        expr(
          s"""aggregate(slice(__vals, 2, size(__vals) - 1),
             |  element_at(__vals, 1),
             |  (acc, x) -> ($num * x + ${den - num} * acc) div $den)""".stripMargin)
          .as("ema"))
  }

  /** Floor-capped running balance per key (inventory with backorders
    * dropped, token buckets, battery charge): `level ← max(0, level +
    * delta)` folded over the key's time-ordered signed deltas from a
    * zero start — the classic non-associative running sum that a
    * prefix-sum window CANNOT express (the clamp makes it
    * order-dependent-recursive). Exact integer arithmetic; only
    * addition and max, so sign never meets a division and the engines
    * agree bit-for-bit.
    *
    * @return (key, n_moves, final_level)
    */
  def cappedRunningSum(df: DataFrame, keyCol: String, orderCols: Seq[String],
      deltaCol: String): DataFrame = {
    val sorted = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(deltaCol).cast("long").as("__d"): _*)))
    df.filter(col(deltaCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_moves"), sorted.as("__s"))
      .withColumn("__ds", expr("transform(__s, x -> x.__d)"))
      .select(col("key"), col("n_moves"),
        expr(
          """aggregate(__ds, cast(0 as bigint),
            |  (acc, x) -> greatest(cast(0 as bigint), acc + x))""".stripMargin)
          .as("final_level"))
  }

  /** SEGMENTED twin of [[cappedRunningSum]] — the million-event-key
    * scale path. The clamp recurrence's step maps close under
    * composition: every composition of `L → max(0, L + d)` steps is of
    * the form `L → max(L + S, M)` (S = chunk delta sum; M = the
    * max-suffix after a clamp), and two such maps compose as
    * `(S₁,M₁)·(S₂,M₂) = (S₁+S₂, max(M₁+S₂, M₂))` — exact max-plus
    * algebra, no truncation anywhere, so the segmented fold equals the
    * sequential fold BIT-FOR-BIT for every chunk size (spec-pinned, and
    * q195's oracle replays the PLAIN fold against this path).
    *
    * Scale shape: one row_number window (per-key sort, linear state)
    * assigns chunk ids; per-(key, chunk) folds of ≤ `chunk` deltas run
    * in parallel with partial combining; the per-key reduction then
    * folds n/chunk summary structs — the aggregation buffer shrinks by
    * the chunk factor (1024 events/chunk → 1000× smaller buffer than
    * the plain fold's full-history list). Zero-floor only: a two-sided
    * cap `min(U, max(0, ·))` also composes (the 3-parameter clamp-map
    * family `L → min(u, max(L+s, m))` is closed), but has no windowed
    * closed form; the zero-floor case alternatively admits the Lindley
    * solution `yₙ = Sₙ − min(0, min prefix Sⱼ)` via two plain windows —
    * this fold is the form that generalizes.
    */
  def cappedRunningSumSegmented(df: DataFrame, keyCol: String,
      orderCols: Seq[String], deltaCol: String, chunk: Int): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    // -2^62: the pre-first-step "M = -inf" identity; the first step's
    // greatest(M + d, 0) lands exactly on the single-step map's M = 0.
    val negInf = -4611686018427387904L
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col) :+ col(deltaCol).cast("long"): _*)
    val chunked = df.filter(col(deltaCol).isNotNull)
      .withColumn("__d", col(deltaCol).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__ck", expr(s"cast((__rn - 1) div $chunk as bigint)"))
    val perChunk = chunked
      .groupBy(col(keyCol).as("key"), col("__ck"))
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(struct(
          orderCols.map(col) :+ col("__d"): _*))).as("__s"))
      .withColumn("__ds", expr("transform(__s, x -> x.__d)"))
      .withColumn("__sm", expr(
        s"""aggregate(__ds,
           |  named_struct('s', cast(0 as bigint), 'm', cast($negInf as bigint)),
           |  (acc, x) -> named_struct(
           |    's', acc.s + x,
           |    'm', greatest(acc.m + x, cast(0 as bigint))))""".stripMargin))
    perChunk
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n_moves"),
        sort_array(collect_list(struct(col("__ck"),
          col("__sm.s").as("s"), col("__sm.m").as("m")))).as("__maps"))
      .select(col("key"), col("n_moves"),
        expr(
          """aggregate(__maps, cast(0 as bigint),
            |  (acc, mm) -> greatest(acc + mm.s, mm.m))""".stripMargin)
          .as("final_level"))
  }

  /** Lagged cross-correlation between two aligned integer series —
    * "does x lead y by L steps?" for every lag 0..maxLag in one plan:
    * explode the lag range, self-join the (small, pre-aggregated)
    * series table on `day + lag`, and compute Pearson r per lag from
    * FIVE exact integer sufficient statistics (n, Σx, Σy, Σx², Σy²,
    * Σxy — the [[znSubsequenceTopK]] discipline): the only double is
    * the one shared-shape quotient, micro-rounded, so lags rank
    * identically in any engine. Products can exceed 64 bits only via
    * n·Σ terms — cast to double BEFORE multiplying, same shape both
    * engines.
    *
    * @param df one row per time point: (tCol, xCol, yCol) integer
    * @return (lag, n, r_micro) — r of (x at t, y at t+lag)
    */
  def lagCrossCorr(df: DataFrame, tCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, "maxLag must be >= 0")
    val base = df.select(col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val lagged = base.select(col("t"), col("x"))
      .withColumn("lag", explode(expr(s"sequence(0, $maxLag)")))
    lagged.as("a")
      .join(base.as("b"), col("b.t") === col("a.t") + col("a.lag"))
      .groupBy(col("a.lag").as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("a.x")).as("sx"), sum(col("b.y")).as("sy"),
        sum(col("a.x") * col("a.x")).as("sxx"),
        sum(col("b.y") * col("b.y")).as("syy"),
        sum(col("a.x") * col("b.y")).as("sxy"))
      // zero-variance guard (exact integers — both engines filter the
      // same lags; n·Σx² must fit 64 bits: n·max(x)² < 2^63)
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
        col("n") * col("syy") - col("sy") * col("sy") > 0)
      .select(col("lag").cast("long").as("lag"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
          * lit(1000000.0)
          / sqrt((col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * (col("n").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))), 0)
          .cast("long").as("r_micro"))
  }

  /** One-sided CUSUM change detection per key — `C_i = max(0, C_{i−1} +
    * (x_i − k))`, alarms when `C_i > h` — WITHOUT any fold: the clamped
    * recurrence is a Lindley equation whose solution is the closed form
    * `C_i = S_i − min(0, min_{j≤i} S_j)` over the prefix sums
    * `S_i = Σ(x−k)`, so two frames on ONE window sort (prefix sum +
    * running min) compute every per-row CUSUM value exactly — linear
    * state, no per-key list, no chunking, million-event keys for free.
    * (Contrast [[cappedRunningSumSegmented]]: the same recurrence
    * seeded at 0 — the closed form exists precisely because the floor
    * is at zero and there is no upper cap.) Exact signed-integer sums;
    * min/max only, no division, so the engines agree bit-for-bit.
    *
    * @param k drift allowance subtracted per observation
    * @param h alarm threshold on the CUSUM statistic
    * @return per key: (key, n, final_cusum, max_cusum, n_alarms)
    */
  def cusumStats(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valCol: String, k: Long, h: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = df.filter(col(valCol).isNotNull)
      .withColumn("__s", sum(col(valCol).cast("long") - k).over(w))
      .withColumn("__c", col("__s") - least(lit(0L), min(col("__s")).over(w)))
    // final C_n = S_n − min(0, min_j S_j); S_n = Σ(x−k) — aggregate
    // closed forms, no order-dependent "last row" pick needed
    staged.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        (sum(col(valCol).cast("long") - k)
          - least(lit(0L), min(col("__s")))).as("final_cusum"),
        max(col("__c")).as("max_cusum"),
        sum(when(col("__c") > h, 1L).otherwise(0L)).as("n_alarms"))
  }

  /** Maximum drawdown per key — `max_i (max_{j≤i} V_j − V_i)` over the
    * key's time-ordered cumulative value series (the running-peak
    * shortfall; risk metric for any monotone-resettable series). Same
    * one-sort shape as [[cusumStats]]: prefix sum → running max →
    * per-row drawdown → per-key aggregate. Exact signed integers.
    *
    * @param deltaCol signed per-event increment (cents); the series is
    *                 its cumulative sum from zero
    * @return (key, n, final_value, max_drawdown)
    */
  def maxDrawdown(df: DataFrame, keyCol: String, orderCols: Seq[String],
      deltaCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = df.filter(col(deltaCol).isNotNull)
      .withColumn("__v", sum(col(deltaCol).cast("long")).over(w))
      .withColumn("__dd", max(col("__v")).over(w) - col("__v"))
    // final value = total delta sum — no order-dependent pick needed
    staged.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col(deltaCol).cast("long")).as("final_value"),
        max(col("__dd")).as("max_drawdown"))
  }

  /** Rolling-median outlier screen per key: the EXACT median of each
    * trailing `w`-row frame (odd w — sorted-frame middle element, no
    * interpolation, pure integers) flags readings far from their local
    * level: `|x − med| · 2 > med · tol2` (tolerance = tol2/2 of the
    * median, division-free). Rows before a full frame are not judged.
    * Frame collect + sort is O(w log w) per row on bounded w — the
    * rolling-robust-screen regime (w ≤ ~100); an O(log w) indexable
    * skiplist would be the giant-window path, not needed at these
    * frame sizes.
    *
    * @return (key, n_judged, n_outliers)
    */
  def rollingMedianOutliers(df: DataFrame, keyCol: String,
      orderCols: Seq[String], valCol: String, w: Int, tol2: Long): DataFrame = {
    require(w % 2 == 1 && w > 1, "w must be odd > 1")
    val frame = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-(w - 1), Window.currentRow)
    val staged = df.filter(col(valCol).isNotNull)
      .withColumn("__x", col(valCol).cast("long"))
      .withColumn("__fr", collect_list(col("__x")).over(frame))
      .filter(size(col("__fr")) === w)
      .withColumn("__med", expr(s"element_at(array_sort(__fr), ${w / 2 + 1})"))
    staged.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_judged"),
        sum(when(abs(col("__x") - col("__med")) * 2 > col("__med") * tol2,
          1L).otherwise(0L)).as("n_outliers"))
  }

  /** SEGMENTED fixed-point EMA — the scale twin of [[emaFixedPoint]]
    * with ONE truncating division per CHUNK instead of per step. Each
    * length-c chunk's untruncated recurrence composes into the exact
    * affine map `L → (A·L + B) / D` with integer `A = (den−num)^c`,
    * `D = den^c`, `B = Σ num·xᵢ·(den−num)^{c−i}·den^{i−1}` (built by an
    * in-chunk integer fold); chunks then apply sequentially with one
    * `div` each. Deterministic, engine-portable semantics in its own
    * right (q196's oracle replays the identical chunked fold in DuckDB
    * with nested list_reduce) — NOT bit-equal to the per-step variant,
    * but strictly CLOSER to the real-valued EMA (n/c truncations
    * instead of n; divergence from per-step is < den/num absolute,
    * spec-pinned).
    *
    * Scale shape mirrors [[cappedRunningSumSegmented]]: window
    * row_number → per-(key, chunk) parallel folds of ≤ chunk values →
    * per-key fold over n/chunk (A, B, D) structs. Overflow discipline:
    * `den^chunk` is required ≤ 2^24 and values must fit
    * `maxVal·den^chunk < 2^62` — pick small den (e.g. den=8, num=3,
    * chunk=8) for cent-scale values.
    *
    * @return (key, n, ema_seg) — seeded with the key's first value
    */
  def emaSegmentedFixedPoint(df: DataFrame, keyCol: String,
      orderCols: Seq[String], valCol: String, num: Long, den: Long,
      chunk: Int): DataFrame = {
    require(num > 0 && den > num, "need 0 < num < den")
    require(chunk > 0 && math.pow(den.toDouble, chunk.toDouble) <= (1L << 24).toDouble,
      "den^chunk must stay <= 2^24 so A*L + B fits in 64 bits")
    val r = den - num
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col) :+ col(valCol).cast("long"): _*)
    // rn=1 is the seed row and forms its own chunk -1; rn>=2 chunk by
    // (rn-2) div c (non-negative, so truncating div == floor).
    val chunked = df.filter(col(valCol).isNotNull)
      .withColumn("__v", col(valCol).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__ck", when(col("__rn") === 1, lit(-1L))
        .otherwise(expr(s"cast((__rn - 2) div $chunk as bigint)")))
    val perChunk = chunked
      .groupBy(col(keyCol).as("key"), col("__ck"))
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(struct(
          orderCols.map(col) :+ col("__v"): _*))).as("__s"))
      .withColumn("__vals", expr("transform(__s, x -> x.__v)"))
      .withColumn("__map", expr(
        s"""aggregate(__vals,
           |  named_struct('a', cast(1 as bigint), 'b', cast(0 as bigint),
           |               'd', cast(1 as bigint)),
           |  (acc, x) -> named_struct(
           |    'a', $r * acc.a,
           |    'b', $r * acc.b + $num * x * acc.d,
           |    'd', $den * acc.d))""".stripMargin))
      .withColumn("__v1", expr("element_at(__vals, 1)"))
    perChunk
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"),
        sort_array(collect_list(struct(col("__ck"),
          col("__map.a").as("a"), col("__map.b").as("b"),
          col("__map.d").as("d"), col("__v1").as("v1")))).as("__m"))
      .select(col("key"), col("n"),
        expr(
          """aggregate(slice(__m, 2, size(__m) - 1),
            |  element_at(__m, 1).v1,
            |  (acc, mm) -> (mm.a * acc + mm.b) div mm.d)""".stripMargin)
          .as("ema_seg"))
  }

  /** SEGMENTED fixed-point HOLT LINEAR smoothing (level + trend): the
    * double-exponential extension of [[emaSegmentedFixedPoint]] —
    * `l' = α·x + (1−α)(l+b)`, `b' = β(l'−l) + (1−β)·b` with rational
    * α = na/da, β = nb/db. The per-step update is AFFINE in (l, b), so
    * a length-c chunk composes into one exact integer 2×2 map
    * `(l,b) → (A·(l,b) + c) / u^c` built by an in-chunk fold with NO
    * intermediate division; chunks then apply sequentially with one
    * shared-shape `round(double/d)` per component per chunk (round, not
    * `div`: the trend row's matrix entries go negative, and truncating
    * vs flooring division diverge across engines on negatives — the
    * q130 lesson).
    *
    * Overflow discipline: `(da·db)^chunk ≤ 2^24` (require-guarded) and
    * values must satisfy `maxVal·(da·db)^chunk < 2^53` so the closing
    * double conversion is exact — e.g. da=db=4, chunk=4 covers
    * cent-scale values to ~1e8.
    *
    * @return (key, n, level_end, trend_end) — level seeded with the
    *         key's first value, trend seeded 0
    */
  def holtSegmentedFixedPoint(df: DataFrame, keyCol: String,
      orderCols: Seq[String], valCol: String, na: Long, da: Long,
      nb: Long, db: Long, chunk: Int): DataFrame = {
    require(na > 0 && da > na && nb > 0 && db > nb,
      "need 0 < na < da and 0 < nb < db")
    val u = da * db
    require(chunk > 0 &&
      math.pow(u.toDouble, chunk.toDouble) <= (1L << 24).toDouble,
      "(da*db)^chunk must stay <= 2^24 so the chunk map fits in 64 bits")
    // per-step integer map over common denominator u = da·db:
    //   l' = (m11·l + m12·b + na·db·x) / u
    //   b' = (m21·l + m22·b + nb·na·x) / u
    val m11 = (da - na) * db
    val m12 = m11
    val m21 = -(nb * na)
    val m22 = nb * (da - na) + (db - nb) * da
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col) :+ col(valCol).cast("long"): _*)
    val chunked = df.filter(col(valCol).isNotNull)
      .withColumn("__v", col(valCol).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__ck", when(col("__rn") === 1, lit(-1L))
        .otherwise(expr(s"cast((__rn - 2) div $chunk as bigint)")))
    val perChunk = chunked
      .groupBy(col(keyCol).as("key"), col("__ck"))
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(struct(
          orderCols.map(col) :+ col("__v"): _*))).as("__s"))
      .withColumn("__vals", expr("transform(__s, x -> x.__v)"))
      .withColumn("__map", expr(
        s"""aggregate(__vals,
           |  named_struct(
           |    'a11', cast(1 as bigint), 'a12', cast(0 as bigint),
           |    'a21', cast(0 as bigint), 'a22', cast(1 as bigint),
           |    'b1', cast(0 as bigint), 'b2', cast(0 as bigint),
           |    'd', cast(1 as bigint)),
           |  (acc, x) -> named_struct(
           |    'a11', $m11 * acc.a11 + $m12 * acc.a21,
           |    'a12', $m11 * acc.a12 + $m12 * acc.a22,
           |    'a21', $m21 * acc.a11 + $m22 * acc.a21,
           |    'a22', $m21 * acc.a12 + $m22 * acc.a22,
           |    'b1', $m11 * acc.b1 + $m12 * acc.b2 + acc.d * ${na * db} * x,
           |    'b2', $m21 * acc.b1 + $m22 * acc.b2 + acc.d * ${nb * na} * x,
           |    'd', $u * acc.d))""".stripMargin))
      .withColumn("__v1", expr("element_at(__vals, 1)"))
    perChunk
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"),
        sort_array(collect_list(struct(col("__ck"),
          col("__map.a11").as("a11"), col("__map.a12").as("a12"),
          col("__map.a21").as("a21"), col("__map.a22").as("a22"),
          col("__map.b1").as("b1"), col("__map.b2").as("b2"),
          col("__map.d").as("d"), col("__v1").as("v1")))).as("__m"))
      .select(col("key"), col("n"),
        expr(
          """aggregate(slice(__m, 2, size(__m) - 1),
            |  named_struct('l', element_at(__m, 1).v1,
            |               'b', cast(0 as bigint)),
            |  (acc, mm) -> named_struct(
            |    'l', cast(round(cast(mm.a11 * acc.l + mm.a12 * acc.b + mm.b1
            |           as double) / cast(mm.d as double)) as bigint),
            |    'b', cast(round(cast(mm.a21 * acc.l + mm.a22 * acc.b + mm.b2
            |           as double) / cast(mm.d as double)) as bigint)))""".stripMargin)
          .as("__st"))
      .select(col("key"), col("n"),
        col("__st.l").as("level_end"), col("__st.b").as("trend_end"))
  }

  /** Classical additive seasonal decomposition of a regular per-key
    * series: trend = centered 2×`period` moving average (the textbook
    * `(S_{−p/2..p/2−1} + S_{−p/2+1..p/2}) / 2p`, exact integer
    * numerator, ONE shared milli division; defined only where the full
    * window exists), seasonal = month-of-period mean of the detrended
    * values (uncentered by convention here — a deterministic index,
    * not the sum-zero classical normalization; documented so the
    * oracle replays it), remainder = value − trend − seasonal.
    *
    * The series must be REGULAR (no gaps — feed it through a complete
    * grid first; a missing step would silently shift the rows-frame).
    * Windows run over per-key SERIES tables (months, not facts) —
    * bounded by the calendar.
    *
    * @param period seasonal period (12 for monthly data), must be even
    * @return (key, t, y, trend_milli, seasonal_milli, remainder_milli)
    */
  def classicalDecompose(df: DataFrame, keyCol: String, tCol: String,
                         yCol: String, period: Int = 12): DataFrame = {
    require(period >= 2 && period % 2 == 0, "period must be even, >= 2")
    val h = period / 2
    val w = Window.partitionBy(col("key")).orderBy(col("t"))
    val f1 = w.rowsBetween(-h, h - 1)
    val f2 = w.rowsBetween(-h + 1, h)
    val base = df.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
      col(yCol).cast("long").as("y"))
    val withTrend = base
      .withColumn("s1", sum(col("y")).over(f1))
      .withColumn("c1", count(col("y")).over(f1))
      .withColumn("s2", sum(col("y")).over(f2))
      .withColumn("c2", count(col("y")).over(f2))
      .withColumn("trend_milli",
        when(col("c1") === period && col("c2") === period,
          round((col("s1") + col("s2")).cast("double") * 1000.0
            / lit(2.0 * period), 0).cast("long")))
      .select(col("key"), col("t"), col("y"), col("trend_milli"))
    val seasonal = withTrend.filter(col("trend_milli").isNotNull)
      .groupBy(col("key"), pmod(col("t"), lit(period.toLong)).as("moy"))
      .agg(round(sum(col("y") * 1000L - col("trend_milli")).cast("double")
        / count(lit(1)).cast("double"), 0).cast("long").as("seasonal_milli"))
    withTrend
      .withColumn("moy", pmod(col("t"), lit(period.toLong)))
      .join(seasonal, Seq("key", "moy"), "left")
      .select(col("key"), col("t"), col("y"), col("trend_milli"),
        col("seasonal_milli"),
        when(col("trend_milli").isNotNull,
          col("y") * 1000L - col("trend_milli") - col("seasonal_milli"))
          .as("remainder_milli"))
  }

  /** Seasonal-naive forecast evaluation (MASE): forecast each series
    * value by its reading one season back, score MAE against it, and
    * scale by the one-step-naive MAE — Hyndman's scale-free accuracy
    * measure, the baseline every demand/traffic forecaster must beat.
    * Lags resolve by value JOIN on `t − season` / `t − 1` (not row
    * lag), so gaps in the series drop out of the evaluation instead of
    * silently comparing non-adjacent readings.
    *
    * Exact integer absolute-error sums per key; the two MAEs and their
    * ratio are the only shared-shape doubles.
    *
    * @return (key, n_eval, mae_seasonal_milli, mae_naive_milli,
    *         mase_milli — null when the naive MAE is 0)
    */
  def seasonalNaiveEval(df: DataFrame, keyCol: String, tCol: String,
                        yCol: String, season: Int = 7): DataFrame = {
    require(season >= 2, "season below 2 is the naive baseline itself")
    val base = df.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
      col(yCol).cast("long").as("y"))
    val eval = base.as("c")
      .join(base.select(col("key"), (col("t") + season).as("t"),
        col("y").as("y_season")), Seq("key", "t"))
      .join(base.select(col("key"), (col("t") + 1).as("t"),
        col("y").as("y_prev")), Seq("key", "t"))
    eval.groupBy(col("key"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("y") - col("y_season"))).as("ae_s"),
        sum(abs(col("y") - col("y_prev"))).as("ae_n"))
      .select(col("key"), col("n_eval"),
        round(col("ae_s").cast("double") * 1000.0
          / col("n_eval").cast("double"), 0).cast("long")
          .as("mae_seasonal_milli"),
        round(col("ae_n").cast("double") * 1000.0
          / col("n_eval").cast("double"), 0).cast("long")
          .as("mae_naive_milli"),
        when(col("ae_n") > 0L,
          round(col("ae_s").cast("double") * 1000.0
            / col("ae_n").cast("double"), 0).cast("long"))
          .otherwise(lit(null).cast("long")).as("mase_milli"))
  }

  /** Best single change-point per key (binary-segmentation step 1):
    * the split k maximizing the between-segment sum of squares,
    * equivalently `(n·S_k − k·S_n)² / (k·(n−k))` over prefix sums —
    * the location answer to CUSUM's drift alarm ([[cusumStats]]).
    * Scores are computed from exact integer prefix sums through ONE
    * shared double shape (the squared numerator can exceed 2^53 at
    * large n·ΣQ, where both engines make the identical nearest-double
    * conversion); ties break to the earliest split.
    *
    * Per-key windows only — the event log's natural partitioning; the
    * argmax is one more per-key window on the same sort.
    *
    * @return (key, n, split_pos, mean_pre_milli, mean_post_milli)
    */
  def bestSplit(df: DataFrame, keyCol: String, orderCols: Seq[String],
                valCol: String): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("key"))
    val scored = df
      .select((col(keyCol).as("key") +: orderCols.map(col) :+
        col(valCol).cast("long").as("v")): _*)
      .withColumn("k", row_number().over(Window.partitionBy(col("key"))
        .orderBy(orderCols.map(col): _*)).cast("long"))
      .withColumn("sk", sum(col("v")).over(w))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("sn", sum(col("v")).over(whole))
      .filter(col("k") < col("n"))
      .withColumn("d",
        (col("n") * col("sk") - col("k") * col("sn")).cast("double"))
      .withColumn("score",
        col("d") * col("d") / (col("k") * (col("n") - col("k"))).cast("double"))
    val pick = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("k").asc)
    scored.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
      .select(col("key"), col("n"), col("k").as("split_pos"),
        round(col("sk").cast("double") * 1000.0 / col("k").cast("double"), 0)
          .cast("long").as("mean_pre_milli"),
        round((col("sn") - col("sk")).cast("double") * 1000.0
          / (col("n") - col("k")).cast("double"), 0)
          .cast("long").as("mean_post_milli"))
  }

  /** Sample autocorrelation function r_k for lags 1..maxLag per keyed
    * series, plus the Ljung–Box portmanteau statistic
    * `Q = n(n+2)·Σ_k r_k²/(n−k)` — the "is this series white noise"
    * screen a forecasting pipeline runs before model fit.
    *
    * The caller supplies an integer time index `tCol` that is DENSE
    * per key (0,1,2,…): lag-k pairs come from an equi-join on
    * `t + k`, so gaps in the index silently shrink the pair sets —
    * index first (row_number or a completed calendar), then call.
    *
    * Exactness: the lag cross-moment `Σ x_t·x_{t+k}` and the head/tail
    * sums are exact integer sums (bound: |x| ≤ ~1e6 with series length
    * to ~1e6 keeps Σx·x inside signed-64 — pre-scale heavier series);
    * `c_k = Σx_t·x_{t+k} − x̄(Σ_head + Σ_tail) + m·x̄²` and
    * `c_0 = Σx² − n·x̄²` are shared-shape doubles over those integers;
    * each r_k is micro-rounded, each Ljung–Box term is pico-rounded and
    * integer-summed so the Q total is order-independent.
    *
    * Scale shape: per-key totals in one groupBy; the lag join fans each
    * row out maxLag times (explode of 1..K) into ONE equi-join on
    * (key, t) — volume n·K rows through a partial-combining aggregate,
    * no window over the raw series.
    *
    * @return (key, lag, m, r_micro, lb_q_milli) — lb_q_milli repeats
    *         the K-lag Ljung–Box statistic on every lag row of the key
    */
  def acfLjungBox(series: DataFrame, keyCol: String, tCol: String,
      valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 100, "lag budget out of range")
    val base = series.select(col(keyCol).as("key"),
      col(tCol).cast("long").as("t"), col(valCol).cast("long").as("x"))
    val stats = base.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
      .filter(col("n") > maxLag.toLong)
    val head = base
      .withColumn("k", explode(sequence(lit(1), lit(maxLag))))
      .select(col("key"), col("k"), (col("t") + col("k")).as("t2"),
        col("x").as("xh"))
    val pairs = head.join(
        base.select(col("key"), col("t").as("t2"), col("x").as("xt")),
        Seq("key", "t2"))
      .groupBy(col("key"), col("k"))
      .agg(count(lit(1)).as("m"), sum(col("xh") * col("xt")).as("sp"),
        sum(col("xh")).as("sh"), sum(col("xt")).as("st"))
    def d(c: String) = col(c).cast("double")
    val xb = d("s") / d("n")
    val c0 = d("ss") - d("s") * xb
    val ck = d("sp") - xb * (d("sh") + d("st")) + d("m") * xb * xb
    val perLag = pairs.join(broadcast(stats), "key")
      .withColumn("r_micro", round(ck / c0 * 1000000.0d, 0).cast("long"))
      .withColumn("term_pico",
        round(d("r_micro") / 1000000.0d * (d("r_micro") / 1000000.0d)
          / (d("n") - d("k")) * 1000000000000.0d, 0).cast("long"))
    val lb = perLag.groupBy(col("key"))
      .agg(sum(col("term_pico")).as("sum_pico"), max(col("n")).as("nk"))
      .select(col("key"),
        round(d("nk") * (d("nk") + 2.0d)
          * (d("sum_pico") / 1000000000000.0d) * 1000.0d, 0)
          .cast("long").as("lb_q_milli"))
    perLag.join(broadcast(lb), "key")
      .select(col("key"), col("k").as("lag"), col("m"), col("r_micro"),
        col("lb_q_milli"))
  }

  /** Partial autocorrelation function per keyed series via the
    * Durbin–Levinson recursion on [[acfLjungBox]]'s sample ACF — the
    * AR-order diagnostic that complements the ACF (an AR(p) series has
    * PACF ≈ 0 past lag p while its ACF decays slowly).
    *
    * D–L over r₁..r_K (doubles from the micro-int ACF):
    * `φ₁₁ = r₁, E₁ = 1 − r₁²`, then
    * `φ_mm = (r_m − Σ_{j<m} φ_{m−1,j}·r_{m−j}) / E_{m−1}`,
    * `φ_mj = φ_{m−1,j} − φ_mm·φ_{m−1,m−j}`,
    * `E_m = E_{m−1}(1 − φ_mm²)`. The whole recursion is ONE per-key
    * higher-order `aggregate` fold over the K-element ACF array —
    * lambdas touch only bound variables (the interpreted-HOF O(len²)
    * trap doesn't bite at K ≤ 100), left-fold sums in fixed j order so
    * a recursive-CTE oracle replays the identical double sequence.
    *
    * Scale shape: everything after the [[acfLjungBox]] aggregation
    * runs on the |keys| × K table.
    *
    * @return (key, lag, r_micro, pacf_micro)
    */
  def pacfDurbinLevinson(series: DataFrame, keyCol: String, tCol: String,
      valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 2 && maxLag <= 100, "lag budget out of range")
    val acf = acfLjungBox(series, keyCol, tCol, valCol, maxLag)
    val rl = acf.groupBy(col("key")).agg(
        array_sort(collect_list(struct(col("lag"), col("r_micro")))).as("lr"))
      .select(col("key"),
        expr("transform(lr, x -> cast(x.r_micro as double) / 1000000.0D)")
          .as("rs"))
      .filter(size(col("rs")) === maxLag)
    val pm = """(element_at(rs, m) - aggregate(sequence(1, m - 1), 0.0D,
               |  (s2, j) -> s2 + element_at(acc.phi, j)
               |    * element_at(rs, m - j))) / acc.e""".stripMargin
    val fold =
      s"""aggregate(
         |  sequence(2, $maxLag),
         |  named_struct(
         |    'phi', array(element_at(rs, 1)),
         |    'pacf', array(element_at(rs, 1)),
         |    'e', 1.0D - element_at(rs, 1) * element_at(rs, 1)),
         |  (acc, m) -> named_struct(
         |    'phi', concat(
         |      transform(acc.phi, (v, ji) ->
         |        v - ($pm) * element_at(acc.phi, m - 1 - ji)),
         |      array($pm)),
         |    'pacf', concat(acc.pacf, array($pm)),
         |    'e', acc.e * (1.0D - ($pm) * ($pm))),
         |  acc -> acc.pacf)""".stripMargin
    val exploded = rl.select(col("key"),
        posexplode(expr(fold)).as(Seq("pos", "pv")))
      .select(col("key"), (col("pos") + 1).cast("long").as("lag"),
        round(col("pv") * 1000000.0d, 0).cast("long").as("pacf_micro"))
    acf.select(col("key"), col("lag"), col("r_micro"))
      .join(exploded, Seq("key", "lag"))
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per keyed series —
    * level + trend + period-p seasonal state, the full triple to
    * [[holtSegmentedFixedPoint]]'s level/trend double:
    * `l_t = round((nα(x_t − s_{t−p}) + (dα−nα)(l+b)) / dα)`,
    * `b_t = round((nβ(l_t − l_{t−1}) + (dβ−nβ)b) / dβ)`,
    * `s_t = round((nγ(x_t − l_t) + (dγ−nγ)s_{t−p}) / dγ)` — every
    * step ONE shared `round(int/int)` double shape (operands can be
    * negative, so never a truncating div — the q130 lesson), state all
    * integers. Init: l = round(mean of the first p values), b = 0,
    * s_i = x_i − l.
    *
    * The recursion is inherently sequential per key; it runs as ONE
    * per-key higher-order fold over the collected series array
    * (bounded by the series length — the KM/EMA convention for
    * per-key recurrences), so a recursive-CTE oracle carrying
    * (l, b, s-list) replays it bit-for-bit.
    *
    * @param num/den α β γ as integer fractions (nα/dα, nβ/dβ, nγ/dγ)
    * @return (key, n, level_end, trend_end, forecast1) — forecast1 is
    *         the one-step-ahead `l + b + s_{n−p}`
    */
  def holtWintersAdditive(series: DataFrame, keyCol: String, tCol: String,
      valCol: String, p: Int, na: Long, da: Long, nb: Long, db: Long,
      ng: Long, dg: Long): DataFrame = {
    require(p >= 2 && p <= 366, "period out of range")
    require(da > na && na > 0 && db > nb && nb > 0 && dg > ng && ng > 0,
      "smoothing fractions must sit strictly inside (0, 1)")
    val rl = series
      .select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
        col(valCol).cast("long").as("x"))
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("tx"))
      .select(col("key"), expr("transform(tx, e -> e.x)").as("xs"))
      .filter(size(col("xs")) > p)
    val l0 = s"cast(round(cast(aggregate(slice(xs, 1, $p), 0L, " +
      s"(a, v) -> a + v) as double) / cast($p as double)) as bigint)"
    val lNew = s"""cast(round(cast($na * (element_at(xs, m)
                  |  - element_at(acc.s, ((m - 1) % $p) + 1))
                  |  + ${da - na} * (acc.l + acc.b) as double)
                  |  / cast($da as double)) as bigint)""".stripMargin
    val bNew = s"""cast(round(cast($nb * (($lNew) - acc.l)
                  |  + ${db - nb} * acc.b as double)
                  |  / cast($db as double)) as bigint)""".stripMargin
    val sUpd = s"""cast(round(cast($ng * (element_at(xs, m) - ($lNew))
                  |  + ${dg - ng} * element_at(acc.s, ((m - 1) % $p) + 1)
                  |  as double) / cast($dg as double)) as bigint)""".stripMargin
    val fold =
      s"""aggregate(
         |  sequence(${p + 1}, cast(size(xs) as int)),
         |  named_struct(
         |    'l', $l0,
         |    'b', 0L,
         |    's', transform(slice(xs, 1, $p), v -> v - ($l0))),
         |  (acc, m) -> named_struct(
         |    'l', $lNew,
         |    'b', $bNew,
         |    's', transform(acc.s, (v, ji) ->
         |      if(ji = (m - 1) % $p, $sUpd, v))),
         |  acc -> acc)""".stripMargin
    rl.select(col("key"), size(col("xs")).cast("long").as("n"),
        expr(fold).as("st"))
      .select(col("key"), col("n"),
        col("st.l").as("level_end"), col("st.b").as("trend_end"),
        (col("st.l") + col("st.b")
          + element_at(col("st.s"), (col("n") % p).cast("int") + 1))
          .as("forecast1"))
  }
}
