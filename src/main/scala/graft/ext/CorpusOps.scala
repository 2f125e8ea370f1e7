package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

import graft.functions.{GraftFunctions, PolyHash}

/** Corpus-preparation operators a training-data pipeline runs after
  * cleaning/dedup: deterministic train/val/test splitting, global
  * sequence packing (concat-and-chunk token budgeting), and
  * deterministic stratified sampling.
  *
  * All three are built on engine-portable arithmetic ([[PolyHash]] of
  * the id, integer folds, rank-by-hash) rather than `rand()` — the
  * assignment of a document is a pure function of its id, so it is
  * reproducible across runs, engines (DuckDB oracle-checkable), and
  * cluster sizes, and a re-run after appending new documents leaves
  * every existing document's split/sample membership unchanged.
  */
object CorpusOps {

  /** Deterministic hash split: bucket = polyHash(id as string) mod 100,
    * assigned to named ranges, e.g. `Seq("train" -> 90, "val" -> 5,
    * "test" -> 5)` → buckets [0,90) train, [90,95) val, [95,100) test.
    * Pure per-row projection — no shuffle, no state, trivially parallel
    * at any scale.
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    GraftFunctions.ensureRegistered(df.sparkSession)
    val bucket = pmod(PolyHash.polyHash(col(idCol).cast("string")), lit(100))
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    val assignment = splits.zip(cumulative).foldRight(lit(null).cast("string")) {
      case (((name, _), upper), els) => when(bucket < upper, lit(name)).otherwise(els)
    }
    df.withColumn("bucket", bucket).withColumn("split", assignment)
  }

  /** Global sequence packing (GPT-style concat-and-chunk): documents are
    * laid end to end in `idCol` order and cut into fixed `budget`-token
    * chunks; each document gets its global start offset and the range of
    * chunks it lands in (a document may straddle a boundary).
    *
    * The global prefix sum is TWO-PHASE, not a single global-order
    * window (`Window.orderBy(id)` with no partition key collapses the
    * whole table into one task — the canonical non-scalable plan):
    * range-partition by id, cumsum WITHIN each range partition, then
    * offset each partition by the running total of the partitions before
    * it — a tiny (#partitions rows) single-partition window joined back
    * by broadcast. Wall-clock is two linear passes + one O(#partitions)
    * step at any data size.
    *
    * The result does not depend on where the range boundaries fall
    * (`idCol` must be unique — duplicate ids have no defined global
    * order to pack in), but BOTH consumers of the partitioned rows (the
    * per-partition totals and the rank join) must see the SAME
    * boundaries: the range partitioner samples with an rdd-id-dependent
    * seed, so two independently planned exchanges could split rows
    * differently and silently misalign `part` between the branches.
    * The base is therefore persisted — not left to the optimizer's
    * optional exchange reuse — and released after the result
    * materializes (EAGER, local-checkpoint contract like
    * [[Dedup.minHashLshPairs]]).
    */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
                    budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val base = partitionedBy(df.select(col(idCol).as("id"),
        nTokens.cast("long").as("n_tokens")), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try packSequencesPlan(base, budget).checkpointEager()
    finally base.unpersist(false)
  }

  /** Range-partition by `key` and stamp the partition id — the shared
    * first phase of the two-phase global rank/cumsum operators. Callers
    * MUST persist the result before branching on it (see
    * [[packSequences]] scaladoc for why).
    */
  private def partitionedBy(df: DataFrame, key: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // spark_partition_id is evaluated on the range-partitioned rows;
    // nondeterministic flag keeps Catalyst from hoisting it above the
    // exchange
    df.repartitionByRange(p, key: _*)
      .withColumn("part", spark_partition_id())
  }

  /** Phase two of the two-phase global rank/cumsum: per-partition totals
    * of `perPartTotal` → exclusive running offsets (single-partition
    * window over one row PER PARTITION, ROWS frame), broadcast-joined
    * back as `poffset`. Shared by every prefix-sum operator here so a
    * frame or offset fix lands once, not per copy.
    */
  private def joinPartOffsets(base: DataFrame, perPartTotal: Column): DataFrame = {
    val totals = base.groupBy(col("part")).agg(perPartTotal.as("ptotal"))
    // ROWS frames everywhere: the default RANGE frame sums all ORDER-BY
    // peers, which double-counts under duplicate keys instead of
    // surfacing them
    val runTot = Window.orderBy(col("part"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = totals.select(col("part"),
      (sum(col("ptotal")).over(runTot) - col("ptotal")).as("poffset"))
    base.join(broadcast(offsets), "part")
  }

  /** Packing dataflow over a (persisted) partitioned base — split out so
    * a plan spec can assert the two-phase shape (partitioned big-side
    * window, single O(#partitions) global pass) under the checkpoint.
    */
  private[graft] def packSequencesPlan(base: DataFrame, budget: Int): DataFrame = {
    val local = Window.partitionBy(col("part")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joinPartOffsets(base, sum(col("n_tokens")))
      .withColumn("start_tok",
        col("poffset") + sum(col("n_tokens")).over(local) - col("n_tokens"))
      .withColumn("chunk_start", expr(s"start_tok div $budget"))
      .withColumn("chunk_end", expr(s"(start_tok + n_tokens - 1) div $budget"))
      .select(col("id"), col("n_tokens"), col("start_tok"),
        col("chunk_start"), col("chunk_end"))
  }

  /** Sliding token-window chunking (RAG/context-length prep): each
    * document is cut into `winSize`-token windows advancing by `step`
    * tokens (overlap = winSize - step); the last window is clipped to
    * the document end, and a document of at most `winSize` tokens
    * yields exactly one chunk. Emits one row per chunk with its token
    * range `[tok_start, tok_end)`.
    *
    * A pure per-row projection + Generate — no shuffle, no state,
    * embarrassingly parallel at any corpus size. The exploded
    * `sequence` child is cheap integer arithmetic (the Generate
    * re-evaluation hazard applies to EXPENSIVE derived arrays — see
    * [[Dedup.minHashLshPairs]]'s materialize-before-explode rule).
    */
  def chunkWindows(df: DataFrame, idCol: String, nTokens: Column,
                   winSize: Int, step: Int): DataFrame = {
    require(winSize > 0, "window size must be positive")
    require(step > 0 && step <= winSize, "step must be in (0, winSize]")
    df.select(col(idCol).as("id"), nTokens.cast("long").as("n_tokens"))
      // an empty (or sentinel-negative) document yields NO chunks —
      // without the guard it would emit one bogus [0, n) range
      .filter(col("n_tokens") > 0)
      .withColumn("n_chunks",
        when(col("n_tokens") <= winSize, lit(1L))
          .otherwise(expr(s"(n_tokens - $winSize + $step - 1) div $step + 1")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("id"), col("n_tokens"), col("chunk_idx"),
        (col("chunk_idx") * step).as("tok_start"),
        least(col("chunk_idx") * step + winSize, col("n_tokens")).as("tok_end"))
  }

  /** Deterministic per-epoch training shuffle: position = rank of
    * (h_e(id), id) where h_e(x) = (a_e·polyHash(x) + b_e) mod P — a
    * reproducible pseudo-random permutation of the corpus that changes
    * every epoch without any `rand()` or stored state. The epoch seeds
    * an AFFINE MIX over the base hash, not a string prefix: polyHash of
    * a short id never wraps the modulus, so a prefixed/suffixed epoch
    * tag is a monotone transform within each id-length class and epochs
    * would yield the SAME order (caught by the permutation spec); the
    * modular multiply wraps constantly and genuinely re-permutes. Same
    * universal family as the MinHash permutations — engine-portable.
    *
    * Two-phase global-rank shape as [[packSequences]] (same persisted-
    * base/eager contract — the branch-consistency argument there applies
    * verbatim): range-partition by the hash, rank WITHIN each partition,
    * offset by the preceding partitions' row counts (O(#partitions),
    * broadcast back). Never a global-order window over the corpus.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    val P = 1000000007L
    val a = 1103515245L * (epoch + 1) % P
    val b = (12345L * epoch + 7L) % P
    val base = partitionedBy(
      df.select(col(idCol).as("id"))
        // base hash < P and a < P keep the product inside signed-64
        .withColumn("h",
          (PolyHash.polyHash(col("id").cast("string")) * lit(a) + lit(b)) % lit(P)),
      col("h"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try epochShufflePlan(base).checkpointEager()
    finally base.unpersist(false)
  }

  private[graft] def epochShufflePlan(base: DataFrame): DataFrame = {
    val local = Window.partitionBy(col("part")).orderBy(col("h"), col("id"))
    joinPartOffsets(base, count(lit(1)))
      .withColumn("pos", col("poffset") + row_number().over(local) - 1)
      .select(col("id"), col("h"), col("pos"))
  }

  /** Quality-ordered selection under a token budget: documents are
    * ranked best-first by (`scoreCol` desc, id asc — deterministic
    * ties) and admitted while the running token total stays within
    * `budget`; the first document that crosses the budget line and
    * everything after it are cut. The data-mixing primitive: "take the
    * best N tokens", not "the best N documents".
    *
    * The running total is the same two-phase global prefix sum as
    * [[packSequences]] (range-partition on the ORDER key, cumsum within
    * partitions, O(#partitions) offset pass broadcast back) — the
    * ordering key is (-score, id) instead of id, nothing else changes,
    * and the same persisted-base contract applies (two branches must
    * see identical range boundaries).
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, nTokens: Column,
                        scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val base = partitionedBy(
      df.select(col(idCol).as("id"), nTokens.cast("long").as("n_tokens"),
        col(scoreCol).cast("double").as("score"))
        // a NULL score must rank WORST (score desc, nulls last — the
        // DuckDB/ANSI DESC default); a bare negate(score) is NULL and
        // ascending sorts put nulls FIRST, handing junk rows the budget
        .withColumn("ord",
          coalesce(negate(col("score")), lit(Double.PositiveInfinity))),
      col("ord"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try tokenBudgetSelectPlan(base, budget).checkpointEager()
    finally base.unpersist(false)
  }

  private[graft] def tokenBudgetSelectPlan(base: DataFrame, budget: Long): DataFrame = {
    val local = Window.partitionBy(col("part")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joinPartOffsets(base, sum(col("n_tokens")))
      .withColumn("cum_tokens", col("poffset") + sum(col("n_tokens")).over(local))
      .filter(col("cum_tokens") <= budget)
      .select(col("id"), col("score"), col("n_tokens"), col("cum_tokens"))
  }

  /** PER-STRATUM token-budget admission — every source/domain gets its
    * own budget (the per-domain cap of crawl curation), best-first
    * within the stratum until the cumulative token count would exceed
    * it. Unlike the GLOBAL [[tokenBudgetSelect]] (whose single total
    * order needs the two-phase range-partitioned prefix sum), the
    * per-stratum cumsum is a plain PARTITIONED window — strata sort in
    * parallel, a skewed stratum costs one fat partition bounded by the
    * stratum, and no global coordination exists at any scale.
    *
    * @param ord admission order (ascending; caller makes NULLs rank
    *            worst — see [[tokenBudgetSelect]]'s coalesce pattern)
    */
  def stratumBudgetSelect(df: DataFrame, stratumCol: String, idCol: String,
                          nTokens: Column, ord: Column,
                          budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col("stratum")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        nTokens.cast("long").as("n_tokens"), ord.as("ord"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("stratum"), col("id"), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic stratified sample: the k documents with the smallest
    * (polyHash(id), id) rank within each stratum — uniform-without-
    * replacement per stratum (the hash is the random draw), reproducible
    * and engine-portable. The window is PARTITIONED by stratum, so the
    * rank computation parallelizes across strata; a skewed stratum costs
    * one fat sort partition, bounded by the stratum, not the table.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("h"), col(idCol))
    df.withColumn("h", PolyHash.polyHash(col(idCol).cast("string")))
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= k)
  }

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis in its
    * exponential-jitter form): each row draws a deterministic
    * pseudo-uniform from the MIXED PolyHash of its id (the q122
    * square-then-affine mix — raw poly31 is near-order-preserving on
    * short numeric keys) and competes with key `−ln(u)/w`; the k
    * smallest keys per stratum win, so inclusion probability scales
    * with the weight. With `u = (h+1)/P` the key is
    * `(ln P − ln(h+1)) / w` — both ln arguments INTEGERS, so any engine
    * reproduces the micro-rounded key bit-for-bit; ties break on id.
    * One window per stratum, same scale shape as [[stratifiedSample]].
    *
    * A NULL or non-positive weight is excluded from the draw outright
    * (filtered, not documented away): a NULL weight would yield a NULL
    * key, and Spark's ascending window sorts NULLs FIRST while DuckDB
    * sorts them LAST — such rows would silently WIN rank 1 here and
    * lose it in the oracle. Zero/negative weights have no E–S meaning
    * (the key flips sign or divides by zero).
    *
    * @param weight positive integer column (e.g. token count); rows
    *               where it is NULL or ≤ 0 never enter the sample
    */
  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
                     weight: Column, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    val P = 1000000007L
    val h0 = PolyHash.polyHash(col(idCol).cast("string"))
    val h = pmod(pmod(h0 * h0, lit(P)) * 1103515245L + 12345L, lit(P))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("key_micro"), col(idCol))
    df.withColumn("w", weight)
      .filter(col("w").isNotNull && col("w") > 0)
      .withColumn("key_micro",
        round((log(lit(P.toDouble)) - log((h + 1L).cast("double"))) / col("w")
          * 1000000, 0).cast("long"))
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= k)
  }

  /** Deterministic source-mix rebalancing: stratum s contributes
    * floor(weight_s · total) documents, drawn as the quota smallest
    * (polyHash(id), id) ranks within the stratum — the same
    * reproducible draw as [[stratifiedSample]] with a PER-STRATUM quota
    * instead of one k. The data-mixing primitive: reweight sources
    * toward a training recipe without rand(), append-stable and
    * engine-portable. Quotas ride in as a tiny broadcast table; a
    * stratum absent from `weights` contributes nothing, a quota larger
    * than the stratum takes the whole stratum (floors are independent,
    * not normalized — the caller owns the recipe summing to 1).
    */
  def rebalanceToMix(df: DataFrame, stratumCol: String, idCol: String,
                     weights: Seq[(String, Double)], total: Long): DataFrame = {
    require(total > 0, "total must be positive")
    require(weights.forall(_._2 >= 0), "weights must be non-negative")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate stratum in weights (would double-join every row of it)")
    val spark = df.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // decimal floor, not double floor: 0.57*100 is 56.999… in IEEE
    // doubles and a naive floor under-allocates the recipe by one
    val quotas = weights.map { case (s, w) =>
      (s, (BigDecimal(w.toString) * total)
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    }.toDF(stratumCol, "quota")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("h"), col(idCol))
    df.withColumn("h", PolyHash.polyHash(col(idCol).cast("string")))
      .join(broadcast(quotas), stratumCol)
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= col("quota"))
  }

  /** Equal-frequency quantile bucketing (feature binning): every row is
    * assigned to one of `k` rank buckets by `orderCol` (ties broken by
    * id — fully deterministic, unlike SQL `ntile` over a non-unique
    * key). `bucket = ((rank-1)·k) div n`, so bucket sizes differ by at
    * most one and the mapping is a pure function of the sorted position.
    *
    * Global rank via the same two-phase shape as [[epochShuffle]]
    * (range-partition on the order key, rank within partitions,
    * O(#partitions) offset pass) — never a global-order window.
    */
  def quantileBuckets(df: DataFrame, idCol: String, orderCol: Column,
                      k: Int): DataFrame = {
    require(k > 1, "need at least 2 buckets")
    val base = partitionedBy(
      df.select(col(idCol).as("id"), orderCol.as("v")), col("v"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count() // materializes the persist; branch-consistent
      quantileBucketsPlan(base, n, k).checkpointEager()
    } finally base.unpersist(false)
  }

  private[graft] def quantileBucketsPlan(base: DataFrame, n: Long, k: Int): DataFrame = {
    val local = Window.partitionBy(col("part")).orderBy(col("v"), col("id"))
    joinPartOffsets(base, count(lit(1)))
      .withColumn("rn", col("poffset") + row_number().over(local))
      .withColumn("bucket", expr(s"((rn - 1) * $k) div ${n}"))
      .select(col("id"), col("v"), col("rn"), col("bucket"))
  }

  /** Per-stratum percentile normalization: each row's rank within its
    * stratum mapped to [0, 1e6] micro-units — the cross-source quality
    * calibration step of a mixing recipe (a raw quality of 0.7 means
    * different things from different scrapers; its within-source
    * percentile is comparable). Integer arithmetic end-to-end:
    * `pct_micro = (rank-1)·1e6 div (n-1)`, ties broken by id, and a
    * single-row stratum maps to 0.
    *
    * Both windows (rank, count) share one partitionBy(stratum)
    * exchange. Partitioned by stratum — fine while no single stratum
    * overwhelms an executor; a mega-stratum would call for the
    * [[packSequences]]-style two-phase rank within that stratum.
    */
  def percentileNormalize(df: DataFrame, stratumCol: String, idCol: String,
                          orderCol: Column): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(orderCol.asc, col(idCol).asc)
    val wc = Window.partitionBy(col(stratumCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(wc))
      .withColumn("pct_micro",
        when(col("n_stratum") === 1, lit(0L))
          .otherwise(expr("((rank - 1) * 1000000) div (n_stratum - 1)")))
  }

  /** Fixed-width histogram of a numeric column: one row per occupied
    * bin — (bin_lo, n, pct_micro). Pure groupBy on `floor(x / width)`
    * (single shuffle of one partial count per bin per task); the share
    * denominator is a global-window sum over the BIN table, which is
    * #bins-sized — never the data.
    */
  def histogram(df: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width > 0, "bin width must be positive")
    val bins = df
      .filter(col(valueCol).isNotNull)
      .groupBy((floor(col(valueCol) / width).cast("long") * width).as("bin_lo"))
      .agg(count(lit(1)).as("n"))
    bins
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("bin_lo"), col("n"),
        round(col("n").cast("double") / col("total") * 1000000, 0)
          .cast("long").as("pct_micro"))
  }

  /** Column-level dataset profile: for each named column, (col_name,
    * n_rows, n_nulls, n_distinct) — the pre-flight audit before a
    * corpus lands in training (null-rate spikes and cardinality
    * collapses are the two classic silent-ingest failures). One agg
    * pass; the multi-column exact `count(DISTINCT)` plans as a single
    * Expand (one replicated pass per column), then the tiny per-column
    * result unpivots driver-free via stack.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs =
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")) ++
      cols.map(c => countDistinct(col(c)).as(s"__dist_$c"))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr = cols
      .map(c => s"'$c', `__nulls_$c`, `__dist_$c`")
      .mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(col("__n"),
        expr(s"$stackExpr AS (col_name, n_nulls, n_distinct)"))
      .select(col("col_name"), col("__n").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }

  /** Temperature-based source rebalance (the multilingual-sampling
    * `p^α` recipe at α = 1/2): target share per stratum ∝ √count —
    * up-weights small sources relative to proportional sampling without
    * letting any source dominate — then a largest-remainder allocation
    * ([[graft.ops.Allocate.prorate]]) hands out exactly `budget` units.
    * Unlike [[rebalanceToMix]] (caller-given target mix), the mix here
    * is DERIVED from the counts. α is fixed at 1/2 because `sqrt` is
    * IEEE-exactly-rounded and therefore engine-portable; arbitrary
    * `pow(c, α)` can differ in the last ulp across libms and would
    * break the oracle's bit-equality.
    *
    * One count aggregation; everything after runs on the strata table
    * (bounded by the number of sources, never the corpus).
    *
    * @return (stratum, n_docs, weight, share_micro, alloc),
    *         Σ alloc = budget
    */
  def temperatureMix(df: DataFrame, stratumCol: String,
                     budget: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight",
        round(sqrt(col("n_docs").cast("double")) * 1000000, 0).cast("long"))
    val alloc = graft.ops.Allocate.prorate(
      counts.withColumn("__g", lit(1)), "__g", stratumCol, "weight", budget)
    counts
      .join(alloc.select(col(stratumCol), col("alloc")), stratumCol)
      .withColumn("share_micro",
        expr("weight * 1000000 div sum(weight) over ()"))
      .select(col(stratumCol), col("n_docs"), col("weight"),
        col("share_micro"), col("alloc"))
  }

  /** Sequential quality-filter FUNNEL report — the rule battery every
    * published curation pipeline documents (C4/Gopher-style): rules
    * evaluate in order, each document is charged to the FIRST rule it
    * fails (a NULL predicate counts as a fail), and the report gives
    * per-rule in/killed/out counts so the reader sees where the corpus
    * went. One linear pass computes each document's killing rule; the
    * funnel arithmetic runs on the RULES-sized table (the partition-
    * less window is bounded by the rule count, never the corpus).
    *
    * @param rules (name, keep-predicate) in evaluation order
    * @return (rule_ord, rule, n_in, n_killed, n_out) in rule order
    */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val spark = df.sparkSession
    import spark.implicits._
    val firstFail = rules.zipWithIndex.foldLeft(when(lit(false), lit(0L))) {
      case (acc, ((_, pred), i)) =>
        acc.when(!coalesce(pred, lit(false)), lit(i.toLong))
    }.otherwise(lit(-1L))
    val killed = df.select(firstFail.as("killer"))
      .groupBy(col("killer")).agg(count(lit(1)).as("n"))
    val ruleRows = rules.zipWithIndex
      .map { case ((name, _), i) => (i.toLong, name) }
      .toDF("rule_ord", "rule")
    val total = killed.agg(sum(col("n")).as("total"))
    val before = Window.orderBy(col("rule_ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ruleRows
      .join(killed, col("rule_ord") === col("killer"), "left")
      .crossJoin(broadcast(total))
      .withColumn("n_killed", coalesce(col("n"), lit(0L)))
      .withColumn("n_in", col("total") - coalesce(sum(col("n_killed")).over(before), lit(0L)))
      .select(col("rule_ord"), col("rule"), col("n_in"), col("n_killed"),
        (col("n_in") - col("n_killed")).as("n_out"))
  }

  /** Curriculum schedule head: documents staged by per-source quality
    * tier (ntile over the quality key within each source), sources
    * interleaved within each tier — the "best data first, no source
    * starves" training-order recipe. Returns only the first `take`
    * positions: the global order is realized as a TakeOrdered on
    * (tier, rank-within-tier, source), never a full sort; writing the
    * complete schedule at scale would instead range-partition on the
    * same key.
    *
    * @return (position, tier, rnk_tier, source, id)
    */
  def curriculumHead(df: DataFrame, idCol: String, srcCol: String,
                     qualityCol: String, tiers: Int, take: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("id").asc)
    val byTier = Window.partitionBy(col("source"), col("tier"))
      .orderBy(col("q").desc, col("id").asc)
    val staged = df.select(col(idCol).as("id"), col(srcCol).as("source"),
        col(qualityCol).as("q"))
      .withColumn("tier", ntile(tiers).over(bySrc).cast("long"))
      .withColumn("rnk_tier", row_number().over(byTier).cast("long"))
    val head = staged
      .orderBy(col("tier").asc, col("rnk_tier").asc, col("source").asc)
      .limit(take)
    // position over `take` rows — bounded by construction
    val wPos = Window.orderBy(col("tier").asc, col("rnk_tier").asc,
      col("source").asc)
    head.withColumn("position", row_number().over(wPos).cast("long"))
      .select(col("position"), col("tier"), col("rnk_tier"), col("source"),
        col("id"))
  }

  /** Quantile normalization of a numeric column across groups: each
    * row's value is replaced by the POOLED distribution's value at the
    * matching quantile (midpoint rank mapping `((2r−1)·N + n_g) //
    * (2·n_g)`), so every group ends up on one common scale — the
    * cross-source score-calibration step that makes per-source quality
    * thresholds comparable.
    *
    * Scale shape: the within-group rank is a partitioned window; the
    * pooled rank goes through [[graft.ops.Ranks.twoPhaseRank]]
    * (range-repartition + per-partition ranks + broadcast offsets —
    * no single-reducer global window); the final mapping is a join on
    * the pooled rank. Integer arithmetic throughout — `floor` of an
    * exact small-integer division on both engines.
    *
    * @return (id, grp, v, rnk_grp, n_grp, target_rank, norm_v)
    */
  def quantileNormalize(df: DataFrame, idCol: String, grpCol: String,
                        valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).as("id"), col(grpCol).as("grp"),
      col(valCol).cast("long").as("v"))
    val wg = Window.partitionBy(col("grp")).orderBy(col("v").asc, col("id").asc)
    val ranked = rows
      .withColumn("rnk_grp", row_number().over(wg).cast("long"))
      .withColumn("n_grp", count(lit(1))
        .over(Window.partitionBy(col("grp"))))
    val pooled = graft.ops.Ranks.twoPhaseRank(
      rows.withColumn("__g", lit(1)), "__g", Seq("v", "id"), "prank")
      .select(col("prank"), col("v").as("norm_v"))
    val total = rows.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .withColumn("target_rank",
        floor(((lit(2L) * col("rnk_grp") - 1L) * col("n_total") + col("n_grp"))
          .cast("double") / (lit(2L) * col("n_grp")).cast("double"))
          .cast("long"))
      .join(pooled, col("target_rank") === col("prank"))
      .select(col("id"), col("grp"), col("v"), col("rnk_grp"), col("n_grp"),
        col("target_rank"), col("norm_v"))
  }

  /** Deterministic token-dropout augmentation: each token survives iff
    * an LCG seeded on (doc id, 1-based position) clears the drop rate —
    * the seeded data-augmentation primitive (reproducible across runs,
    * engines, and re-partitions because the randomness is a pure
    * function of the row, never of execution order). Returns the kept
    * token count and the PolyHash fingerprint of the augmented text so
    * the oracle can certify the exact surviving sequence without
    * hauling the text through the compare.
    *
    * One pass, per-row array HOFs only — no shuffle at all.
    *
    * @param dropPct tokens dropped per hundred (expected)
    * @return (id, n_tokens, n_kept, aug_hash)
    */
  /** Balanced training-shard manifest: documents ranked by token count
    * (heaviest first) are dealt into `shards` by SNAKE order — block b
    * deals left-to-right when even, right-to-left when odd — the
    * classic deterministic LPT-like balancer (each shard gets one doc
    * per block, alternating which shard takes the block's heaviest).
    * Reports per-shard token mass and deviation from the ideal split.
    *
    * The global rank goes through [[graft.ops.Ranks.twoPhaseRank]];
    * everything after is a shards-sized aggregate.
    *
    * @return (shard, n_docs, sum_tokens, dev_milli)
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    shards: Int): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      size(graft.ext.TextAnalysis.tokens(col(textCol))).cast("long").as("ntok"))
    val ranked = graft.ops.Ranks.twoPhaseRank(
      docs.withColumn("__g", lit(1)).withColumn("negtok", -col("ntok")),
      "__g", Seq("negtok", "id"), "rnk")
    val pos = col("rnk") - 1L
    val block = floor(pos.cast("double") / shards.toDouble).cast("long")
    val within = pmod(pos, lit(shards.toLong))
    val shard = when(pmod(col("block"), lit(2L)) === 0L, col("within"))
      .otherwise(lit(shards.toLong - 1L) - col("within"))
    val assigned = ranked
      .withColumn("block", block).withColumn("within", within)
      .withColumn("shard", shard)
    val agg = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
    val total = agg.agg(sum(col("sum_tokens")).as("total"))
    agg.crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("sum_tokens"),
        round((col("sum_tokens").cast("double")
          - col("total").cast("double") / shards.toDouble)
          / (col("total").cast("double") / shards.toDouble) * 1000.0, 0)
          .cast("long").as("dev_milli"))
  }

  def tokenDropout(df: DataFrame, idCol: String, textCol: String,
                   dropPct: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = df.select(col(idCol).as("id"),
      graft.ext.TextAnalysis.tokens(col(textCol)).as("toks"))
    val kept = filter(col("toks"), (_, i) =>
      pmod((col("id") * 31 + (i + 1)) * 1103515245L + 12345L,
        lit(1000000007L)) % 100 >= dropPct)
    base
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("kept", kept)
      .select(col("id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        graft.functions.PolyHash.polyHash(array_join(col("kept"), " "))
          .as("aug_hash"))
  }

  /** Exponentiated-gradient mixing weights (DoReMi-style, static
    * excess loss): each source's difficulty is its mean per-token NLL
    * under the FULL-corpus Laplace unigram model; `rounds` EG updates
    * tilt the uniform mix toward the hard domains,
    * `w'_i = normalize(w_i · exp(η · (ℓ_i − ℓ̄)/ℓ̄))`, with every exp
    * micro-rounded and the normalization a floor div — so both engines
    * replay identical integers. The proper DoReMi inner loop retrains
    * the proxy model per round; this fixes the reference losses (one
    * corpus pass) and runs the reweighting exactly — the mixing-table
    * operator, not the trainer.
    *
    * One exploded-token aggregation (corpus-wide shuffle) to the
    * (source, token) counts; the model join is vocab-sized; everything
    * after runs on the sources-sized table.
    *
    * @return (source, n_tokens, nll_micro, w_micro) after `rounds`
    */
  def doremiMixWeights(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String, rounds: Int = 3,
                       eta: Double = 1.0): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "unrolled rounds out of range")
    val tok = docs.select(col(srcCol).as("source"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val sc = tok.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
      .persist()
    val glob = sc.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val consts = glob.agg(sum(col("c_t")).as("nn"),
      count(lit(1)).as("v"))
    // per-(source, token) micro-nats term against the global model,
    // integer-summed; mean per token via one shared-shape double
    val terms = sc.join(glob, "tok").crossJoin(broadcast(consts))
      .withColumn("t_micro",
        col("c_st") * round(-log((col("c_t") + 1L).cast("double")
          / (col("nn") + col("v")).cast("double")) * 1000000.0, 0).cast("long"))
    val losses = terms.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_tokens"), sum(col("t_micro")).as("t_sum"))
      .select(col("source"), col("n_tokens"),
        round(col("t_sum").cast("double") / col("n_tokens").cast("double"), 0)
          .cast("long").as("nll_micro"))
    // integer sum then ONE divide — avg() would sum doubles in
    // partition order, which neither engine replays deterministically
    val lBar = losses.agg(
      round(sum(col("nll_micro")).cast("double")
        / count(lit(1)).cast("double"), 0).cast("long").as("l_bar"))
    val seeded = losses.crossJoin(broadcast(lBar))
      .withColumn("w", lit(1000000L))
    val mixed = (1 to rounds).foldLeft(seeded) { (cur, _) =>
      val raw = cur.withColumn("raw",
        round(col("w").cast("double")
          * exp(lit(eta) * (col("nll_micro") - col("l_bar")).cast("double")
            / col("l_bar").cast("double")), 0).cast("long"))
      raw.withColumn("w",
        expr("raw * 1000000 div sum(raw) over ()"))
        .drop("raw")
    }
    mixed.select(col("source"), col("n_tokens"), col("nll_micro"),
      col("w").as("w_micro"))
  }

  /** Length-bucket padding-waste report: each sequence rounds up to
    * the smallest bucket boundary that holds it (power-of-two ladders
    * are the convention), and the report prices what dynamic batching
    * actually pays — padded token slots vs real tokens per bucket.
    * Sequences longer than the last bucket clamp into it (truncation
    * accounting is the chunker's job, q84).
    *
    * One projection + one hash aggregation; buckets are a literal
    * CASE ladder, so the pass is map-side combinable at any size.
    *
    * @param buckets ascending bucket capacities
    * @return (bucket, n_seqs, sum_tokens, padded_tokens, waste_micro)
    */
  def paddingWasteReport(df: DataFrame, idCol: String, nTokens: Column,
                         buckets: Seq[Long]): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted,
      "buckets must be ascending")
    val n = nTokens.cast("long")
    val bucket = buckets.init.reverse.foldLeft(lit(buckets.last)) {
      (acc, b) => when(n <= b, lit(b)).otherwise(acc)
    }
    df.select(col(idCol).as("id"), n.as("n_tok"), bucket.as("bucket"))
      .withColumn("n_pad", least(col("n_tok"), col("bucket")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_pad")).as("sum_tokens"))
      .withColumn("padded_tokens", col("n_seqs") * col("bucket"))
      .withColumn("waste_micro",
        round((col("padded_tokens") - col("sum_tokens")).cast("double")
          * 1000000.0 / col("padded_tokens").cast("double"), 0).cast("long"))
  }

  /** Corpus DATA CARD — the one-row-per-source manifest a dataset
    * release ships: volume (docs, whitespace tokens), length profile
    * (mean chars in milli + exact lower-median token count via the
    * bounded-value histogram trick — token counts are capped by the
    * ingest contract, so the cumulative-histogram median is exact and
    * cheap), hygiene (exact-duplicate rate by full-text equality,
    * URL-bearing doc rate). Every number exact-integer or one shared
    * division; one scan plus per-source aggregations.
    *
    * @return (source, n_docs, n_tokens, mean_chars_milli,
    *         p50_tokens, dup_milli, url_milli)
    */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               srcCol: String, nCharsCol: String): DataFrame = {
    val base = docs.select(col(srcCol).as("source"),
      col(nCharsCol).cast("long").as("n_chars"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"),
      col(textCol).as("text"))
    val agg = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("text")).as("n_distinct"),
        sum(when(col("text").contains("http"), 1L).otherwise(0L))
          .as("n_url"))
    // exact lower median of the bounded token-count value domain
    val hist = base.groupBy(col("source"), col("n_tok"))
      .agg(count(lit(1)).as("m"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_tok"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    val med = hist
      .withColumn("cum", sum(col("m")).over(wc))
      .withColumn("tot", sum(col("m")).over(wt))
      .filter(col("cum") * 2 >= col("tot") + 1)
      .groupBy(col("source")).agg(min(col("n_tok")).as("p50_tokens"))
    agg.join(med, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("sum_chars").cast("double") * 1000.0
          / col("n_docs").cast("double"), 0).cast("long")
          .as("mean_chars_milli"),
        col("p50_tokens"),
        round((col("n_docs") - col("n_distinct")).cast("double") * 1000.0
          / col("n_docs").cast("double"), 0).cast("long").as("dup_milli"),
        round(col("n_url").cast("double") * 1000.0
          / col("n_docs").cast("double"), 0).cast("long").as("url_milli"))
  }

  /** UniMax-style token allocation (Chung et al., 2023 shape): spread a
    * training budget as UNIFORMLY as possible across sources, capping
    * each source at `maxEpochsMilli/1000` passes over its own tokens —
    * the mixing rule that avoids both upsampling tiny sources past
    * their epoch cap and tilting to giant ones.
    *
    * Exact integer water-filling: sort sources by cap ascending; for
    * each candidate boundary j (first j sources capped), the water
    * level is `λ_j = (B − Σ_{i≤j} cap_i) div (k − j)`; the unique
    * feasible boundary is the SMALLEST j with `cap_j ≤ λ_j` and
    * `cap_{j+1} > λ_j` (all capped when `B ≥ Σcap`). Uncapped sources
    * get λ, with the integer remainder distributed one token each to
    * the smallest-cap uncapped sources — fully deterministic, no
    * doubles anywhere.
    *
    * Scale shape: one groupBy to |sources| rows; every window below
    * runs on that bounded table.
    *
    * @param perSource (source, tokens) rows
    * @return (source, tokens, cap, alloc, epochs_milli)
    */
  def unimaxAllocate(perSource: DataFrame, budget: Long,
                     maxEpochsMilli: Long): DataFrame = {
    require(budget >= 0 && maxEpochsMilli > 0, "bad budget/cap")
    val w = org.apache.spark.sql.expressions.Window
    val s = perSource.select(col("source"), col("tokens").cast("long"))
      .withColumn("cap", expr(s"tokens * $maxEpochsMilli div 1000"))
    val ordered = s
      .withColumn("j", row_number()
        .over(w.orderBy(col("cap"), col("source"))).cast("long"))
      .withColumn("p", sum(col("cap"))
        .over(w.orderBy(col("cap"), col("source"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("k", count(lit(1)).over(w.partitionBy()))
      .withColumn("nextcap", lead(col("cap"), 1)
        .over(w.orderBy(col("cap"), col("source"))))
    // candidate boundaries: j = 0 (nothing capped) plus each sorted row
    val cands = ordered.select(col("j"), col("cap"), col("p"), col("k"),
        col("nextcap"))
      .unionByName(ordered.groupBy(col("k"))
        .agg(min(col("cap")).as("nextcap"))
        .select(lit(0L).as("j"), lit(0L).as("cap"), lit(0L).as("p"),
          col("k"), col("nextcap")))
      // p > B → λ = −1 sentinel: keeps every div on NON-NEGATIVE
      // operands (Spark div truncates, DuckDB // floors — they only
      // agree on non-negatives)
      .withColumn("lam", when(col("k") === col("j"),
          when(col("p") <= budget, Long.MaxValue).otherwise(lit(-1L)))
        .otherwise(when(col("p") > budget, lit(-1L))
          .otherwise(expr(s"(${budget}L - p) div (k - j)"))))
      .filter(col("cap") <= col("lam")
        && (col("nextcap").isNull || col("nextcap") > col("lam")))
    val jstar = cands.agg(min(col("j")).as("jstar"),
      min_by(col("lam"), col("j")).as("lam"),
      min_by(col("p"), col("j")).as("pstar"))
    ordered.crossJoin(broadcast(jstar))
      .withColumn("rem", when(col("k") === col("jstar"), lit(0L))
        .otherwise(expr(s"(${budget}L - pstar) % (k - jstar)")))
      .withColumn("alloc", when(col("j") <= col("jstar"), col("cap"))
        .otherwise(least(col("cap"),
          col("lam") + when(col("j") - col("jstar") <= col("rem"), 1L)
            .otherwise(0L))))
      .select(col("source"), col("tokens"), col("cap"), col("alloc"),
        expr("alloc * 1000 div tokens").as("epochs_milli"))
  }

  /** Consistent-hash ring sharding audit: assign every doc to its
    * successor virtual node on a [[graft.functions.PolyHash]] ring,
    * under `nShards` and again under `nShards + 1`, and report the
    * per-shard movement — the "how much data rebalances when we add a
    * node" certificate (expected moved share ≈ 1/(n+1), versus ~100%
    * for mod-n sharding).
    *
    * Fully deterministic integers: ring positions are
    * `mix(polyHash("s:<shard>:<vnode>"))` and doc keys
    * `mix(polyHash(id))`, where `mix(x) = (x·2654435761 + 987654321)
    * mod (2^31 − 1)` — the LCG avalanche matters because raw polyHash
    * of strings differing only in the trailing char is
    * near-consecutive, which would collapse the whole ring into one
    * narrow arc (every doc lands on the first shard). The successor
    * pick is `min(pos·100 + shard)` over ring rows with `pos ≥ h`
    * (wrapping to the global min) — the scaled composite key makes
    * position ties break on the lower shard id identically in any
    * engine.
    *
    * Scale shape: the ring collapses to ONE sorted LITERAL array of
    * composite keys (`pos·100 + shard`, ≤ 6,272 longs — a bounded
    * single-row head() over a generated table, baked into the plan);
    * each doc's successor under BOTH ring sizes is an O(ring) scalar
    * HOF (`array_min(filter(ring, p ≥ h·100))` with wraparound to
    * `ring[0]`) inside one projection — no join at all, no row
    * amplification, no shuffle of the docs by key.
    *
    * @return (shard, n_docs, n_moved, moved_milli) under the OLD
    *         numbering, ordered by shard
    */
  def consistentHashRebalance(docs: DataFrame, idCol: String,
      nShards: Int, vnodes: Int): DataFrame = {
    require(nShards >= 1 && nShards < 99 && vnodes >= 1 && vnodes <= 64,
      "ring size out of range")
    val spark = docs.sparkSession
    GraftFunctions.ensureRegistered(spark)
    // LCG avalanche over the polyHash: spreads near-consecutive raw
    // hashes across the full [0, 2^31-1) ring. polyHash < 1e9+7, so
    // the multiply stays far inside signed-64.
    def mix(c: Column): Column =
      pmod(c * lit(2654435761L) + lit(987654321L), lit(2147483647L))
    def ring(n: Int): DataFrame = spark.range(n.toLong)
      .select(col("id").as("sh"))
      .crossJoin(spark.range(vnodes.toLong).select(col("id").as("v")))
      .select(col("sh"), mix(PolyHash.polyHash(
        concat_ws(":", lit("s"), col("sh"), col("v")))).as("pos"))
    val keyed = docs.select(col(idCol).as("id"),
      mix(PolyHash.polyHash(col(idCol).cast("string"))).as("h"))
    // ring as ONE sorted composite-key literal (pos·100 + shard keeps
    // the lower-shard tie-break); pos ≥ h ⟺ composite ≥ h·100 since
    // shard < 100. The head() is a bounded one-row collect over the
    // ≤ 6,272-row generated ring — the same PolyHash expression the
    // docs use, so engine and literal can never drift.
    def ringLit(n: Int): Column = lit(ring(n)
      .agg(sort_array(collect_list(col("pos") * 100L + col("sh"))))
      .head().getSeq[Long](0).toArray)
    // successor = min surviving composite, wrapping to ring[0] (the
    // sorted head) when h exceeds every position
    def assign(r: Column): Column = pmod(coalesce(
      array_min(filter(r, p => p >= col("h") * 100L)),
      get(r, lit(0))), lit(100L))
    keyed
      .select(col("id"),
        assign(ringLit(nShards)).as("shard"),
        assign(ringLit(nShards + 1)).as("shard_new"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard") =!= col("shard_new"), 1L).otherwise(0L))
          .as("n_moved"))
      .select(col("shard"), col("n_docs"), col("n_moved"),
        round(col("n_moved").cast("double") * 1000.0
          / col("n_docs").cast("double"), 0).cast("long").as("moved_milli"))
  }

  /** Deterministic per-stratum hash reservoir — the SCALE TWIN of
    * [[stratifiedSample]] (q77): same k-lowest-hash-per-stratum
    * semantics, two upgrades for the 100-TB regime. (1) SKEW-SAFE
    * top-k: [[stratifiedSample]]'s whole-stratum rank window sorts each
    * stratum in one task — a 90%-hot source serializes the cluster;
    * here phase 1 takes a local top-k per (input partition, stratum) —
    * input splits are balanced regardless of stratum skew — and phase 2
    * ranks only the ≤ k·P survivors. (2) SALTED redraws: hashing
    * `salt|id` yields fresh independent samples per salt (audit panel
    * vs eval carve-out vs spot-check) with no RNG state — the same
    * discipline as the q235 bootstrap's PolyHash-indexed draws.
    *
    * Only (strata, id, hash) columns flow through either exchange; the
    * document text never shuffles.
    *
    * @return strataCols :+ idCol :+ (sample_hash, rnk), rnk ≤ k
    */
  def hashReservoir(df: DataFrame, strataCols: Seq[String], idCol: String,
                    k: Int, salt: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val sc = strataCols.map(col)
    // square-then-affine avalanche over the poly hash (the q122 /
    // [[weightedSample]] mix): raw poly31 is near-order-preserving on
    // short numeric keys, which would make every salt draw the same
    // lowest-id rows instead of a fresh sample
    val P = 1000000007L
    val h0 = PolyHash.polyHash(
      concat(lit(salt + "|"), col(idCol).cast("string")))
    val withH = df
      .withColumn("__h", pmod(pmod(h0 * h0, lit(P)) * 1103515245L + 12345L,
        lit(P)))
      .select(sc ++ Seq(col(idCol), col("__h")): _*)
      .withColumn("__part", spark_partition_id())
    val wLocal = Window.partitionBy((col("__part") +: sc): _*)
      .orderBy(col("__h"), col(idCol))
    val wGlob = Window.partitionBy(sc: _*)
      .orderBy(col("__h"), col(idCol))
    withH.withColumn("__ln", row_number().over(wLocal))
      .filter(col("__ln") <= k)
      .withColumn("rnk", row_number().over(wGlob).cast("long"))
      .filter(col("rnk") <= k)
      .select(sc ++ Seq(col(idCol), col("__h").as("sample_hash"),
        col("rnk")): _*)
  }
}
