package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), n-gram Jaccard (blocked pair join), MinHash+LSH
  * (shingle → signature → band buckets → candidate join → exact verify),
  * and SimHash.
  *
  * Scale design:
  *  - Exact dedup shuffles on a 64-bit text hash, never the text itself.
  *  - Exact pair-wise Jaccard is quadratic per block — only valid behind
  *    a blocking key; the unblocked path at 100 TB is MinHash/LSH, whose
  *    cost is linear in (docs × shingles) plus bucket-local joins.
  *  - All stages are DataFrame ops (explode/groupBy/join); nothing
  *    collects to the driver.
  */
object Dedup {

  /** Word n-gram shingle set (distinct, SORTED ascending) from an
    * ALREADY-MATERIALIZED token-array column. Ops project the token
    * array in a separate step first: referencing a bound attribute
    * inside the lambda instead of the `split(...)` tree avoids Catalyst
    * inlining the split once per `get` reference (measured ~10× on the
    * shingle stage). The one-time sort is what lets the verify stages
    * intersect with the allocation-free two-pointer kernel
    * ([[graft.functions.SortedIntersectSize]]) instead of a per-pair
    * hash set; MinHash signatures and band buckets are order-
    * independent, so every other consumer is unaffected.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_sort(array_distinct(TextAnalysis.gramsFromTokens(toks, n)))

  /** Word n-gram shingle set (distinct) per document. */
  def shingles(textCol: Column, n: Int): Column =
    shinglesFromTokens(TextAnalysis.tokens(textCol), n)

  /** Parallelism floor for the compute-heavy stages below — conditional
    * (no-op when scan parallelism already meets the target); see
    * [[Exec.widen]] for the full contract.
    */
  private[ext] def widen(df: DataFrame): DataFrame = Exec.widen(df)

  /** Smallest `maxDf` for which the stop-shingle HOT set (bounded by
    * |postings| / maxDf rows) is treated as broadcastable in
    * [[ngramContainmentPairsBanded]]; below it the anti-join falls back
    * to a shuffle so a tiny cap over a huge corpus can't OOM the driver.
    */
  private[ext] val HotSetBroadcastMinDf = 16

  /** Exact duplicate groups on arbitrary key columns: groups with >1 row,
    * keeping the minimum id as the canonical representative.
    */
  def exactDupGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** All pairs (a < b) within the same `blockCols` whose n-gram Jaccard
    * similarity ≥ threshold. Exact — the oracle-checkable ground truth
    * for the approximate variants, quadratic per block BY DESIGN (the
    * unblocked scale path is [[minHashLshPairs]]).
    *
    * Shape: SALTED block self-join + the allocation-free two-pointer
    * intersection kernel. A plain self-join on the block key alone has
    * as many join partitions as blocks — five lang blocks serialize a
    * 32-core machine to five tasks (measured) and one hot block would
    * do the same to a 1000-executor cluster. Salting the left side by
    * `id mod salts` and replicating the right side per salt value
    * spreads every block over `salts` tasks while generating each pair
    * exactly once. The size-ratio prune (J ≥ τ forces min(sz) ≥
    * τ·max(sz)) drops hopeless pairs before the kernel runs.
    *
    * A PPJoin-style rare-first prefix filter was tried here and REMOVED:
    * on high-vocabulary-overlap corpora (like this one — median shingle
    * doc-freq ~15 %) the prefix join still emits nearly all block pairs,
    * so its two extra window shuffles, candidate distinct, and verify
    * joins cost more than they prune. Revisit only for corpora where
    * candidates ≪ block pairs.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        blockCols: Seq[String], salts: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val bc = blockCols.map(col)
    val toks = widen(df.select(
      (col(idCol).as("id") +: bc) :+
        TextAnalysis.tokens(col(textCol)).as("toks"): _*))
    val withSh = toks.select(
      (col("id") +: bc) :+ shinglesFromTokens(col("toks"), n).as("sh"): _*)
    // salt from a hash of the id, not the id itself: pmod on a
    // string/UUID id column would cast to NULL and silently join to
    // nothing. The hash is engine-internal but never oracle-visible —
    // it only routes rows; every pair is still emitted exactly once.
    val a = withSh.select((bc :+ col("id").as("id_a") :+ col("sh").as("sh_a")): _*)
      .withColumn("salt", pmod(xxhash64(col("id_a")), lit(salts.toLong)))
    val b = withSh.select((bc :+ col("id").as("id_b") :+ col("sh").as("sh_b")): _*)
      .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    a.join(b, blockCols :+ "salt")
      .filter(col("id_a") < col("id_b") &&
        lit(threshold) * greatest(size(col("sh_a")), size(col("sh_b"))) <=
          least(size(col("sh_a")), size(col("sh_b"))))
      .withColumn("inter",
        graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
      // |A ∪ B| = |A| + |B| - |A ∩ B| — no union array materialized
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Screen-quality certification: precision/recall of the banded
    * MinHash screen against exhaustive n-gram Jaccard ground truth on
    * the SAME corpus — the measurement that justifies (or rejects) a
    * (bands, rowsPerBand) configuration before a 100 TB dedup run
    * commits to it. Run on a bounded audit SLICE (the ground truth is
    * the quadratic all-pairs join); the certified screen then runs on
    * the full corpus.
    *
    *  - truth     = all pairs with exact Jaccard ≥ threshold;
    *  - screen    = banded candidates (any shared band bucket), each
    *                verified with the same exact Jaccard;
    *  - tp        = screen pairs that are truth pairs (same shingle
    *                definition on both paths, so tp ⊆ truth exactly);
    *  - precision = tp / screen size (how much verify work the bands
    *                waste), recall = tp / truth (what the screen
    *                misses — LSH's only source of false negatives).
    *
    * One row: (n_truth, n_screen, tp, fp, fn, precision_micro,
    * recall_micro), integer micro-units, NULL when a denominator is 0.
    */
  def screenQualityReport(df: DataFrame, idCol: String, textCol: String,
                          n: Int, threshold: Double,
                          bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val truth = ngramJaccardPairs(df, idCol, textCol, n, threshold,
      blockCols = Seq.empty)
    val screen = minHashLshPairs(df, idCol, textCol, n, threshold = 0.0,
      bands, rowsPerBand)
    val s = screen.agg(
      count(lit(1)).as("n_screen"),
      coalesce(sum(when(col("jaccard") >= threshold, 1L).otherwise(0L)),
        lit(0L)).as("tp"))
    val t = truth.agg(count(lit(1)).as("n_truth"))
    s.crossJoin(t).select(
      col("n_truth"), col("n_screen"), col("tp"),
      (col("n_screen") - col("tp")).as("fp"),
      (col("n_truth") - col("tp")).as("fn"),
      when(col("n_screen") > 0, expr("tp * 1000000 div n_screen"))
        .as("precision_micro"),
      when(col("n_truth") > 0, expr("tp * 1000000 div n_truth"))
        .as("recall_micro"))
  }

  /** The threshold SWEEP of [[screenQualityReport]]: one row per
    * candidate verification threshold τ, from ONE pass over each pair
    * set — the curve that picks the dedup operating point (τ low =
    * recall-heavy, τ high = precision-heavy) instead of certifying a
    * single pre-chosen τ. The banded candidate set does not depend on
    * τ (bands screen, τ verifies), so `n_screen` is constant along the
    * curve, `tp(τ)` counts screen pairs whose exact Jaccard reaches τ,
    * and `n_truth(τ)` counts all-pairs truth at τ. Jaccards compare in
    * micro units through the shared `round(double · 1e6)` shape.
    *
    * Same audit-slice contract as the report: ground truth is the
    * quadratic all-pairs join — bound the input.
    */
  def screenQualityCurve(df: DataFrame, idCol: String, textCol: String,
                         n: Int, tausMicro: Seq[Long],
                         bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    require(tausMicro.nonEmpty, "need at least one threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val jm = round(col("jaccard") * 1000000, 0).cast("long").as("jm")
    val truthAll = ngramJaccardPairs(df, idCol, textCol, n, threshold = 0.0,
      blockCols = Seq.empty).select(jm)
    val screen = minHashLshPairs(df, idCol, textCol, n, threshold = 0.0,
      bands, rowsPerBand).select(jm)
    val taus = broadcast(tausMicro.toDF("tau_micro"))
    val truthC = taus.join(truthAll, col("jm") >= col("tau_micro"), "left")
      .groupBy(col("tau_micro")).agg(count(col("jm")).as("n_truth"))
    val screenC = taus.join(screen, col("jm") >= col("tau_micro"), "left")
      .groupBy(col("tau_micro")).agg(count(col("jm")).as("tp"))
    val nScreen = screen.agg(count(lit(1)).as("n_screen"))
    truthC.join(screenC, "tau_micro").crossJoin(broadcast(nScreen))
      .select(col("tau_micro"), col("n_truth"), col("n_screen"), col("tp"),
        when(col("n_screen") > 0, expr("tp * 1000000 div n_screen"))
          .as("precision_micro"),
        when(col("n_truth") > 0, expr("tp * 1000000 div n_truth"))
          .as("recall_micro"))
      .orderBy(col("tau_micro"))
  }

  /** Directed n-gram CONTAINMENT pairs: `C(A→B) = |A∩B| / |A|` ≥
    * threshold within a block — the subset-relation detector Jaccard
    * misses by construction (a quote, excerpt, or near-complete copy
    * inside a much longer document scores near-zero Jaccard but
    * containment ≈ 1; the MinHash-era literature treats containment as
    * its own primitive for exactly this reason). Same salted block
    * self-join + two-pointer kernel as [[ngramJaccardPairs]]; each
    * unordered candidate pair evaluates ONE intersection and emits up
    * to two directed rows. No size-ratio prune exists for containment —
    * the small side may always be fully contained — so the block is the
    * only candidate bound (documented quadratic-per-block ground
    * truth).
    *
    * @return (contained_id, container_id, containment)
    */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            n: Int, threshold: Double,
                            blockCols: Seq[String], salts: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val bc = blockCols.map(col)
    val toks = widen(df.select(
      (col(idCol).as("id") +: bc) :+
        TextAnalysis.tokens(col(textCol)).as("toks"): _*))
    val withSh = toks.select(
      (col("id") +: bc) :+ shinglesFromTokens(col("toks"), n).as("sh"): _*)
    val a = withSh.select((bc :+ col("id").as("id_a") :+ col("sh").as("sh_a")): _*)
      .withColumn("salt", pmod(xxhash64(col("id_a")), lit(salts.toLong)))
    val b = withSh.select((bc :+ col("id").as("id_b") :+ col("sh").as("sh_b")): _*)
      .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    a.join(b, blockCols :+ "salt")
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter",
        graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .select(explode(array(
        struct(col("id_a").as("contained_id"), col("id_b").as("container_id"),
          (col("inter").cast("double") / size(col("sh_a"))).as("containment")),
        struct(col("id_b").as("contained_id"), col("id_a").as("container_id"),
          (col("inter").cast("double") / size(col("sh_b"))).as("containment"))))
        .as("p"))
      .select(col("p.contained_id"), col("p.container_id"), col("p.containment"))
      .filter(col("containment") >= threshold)
  }

  /** Banded (screened) containment: the 100-TB path for
    * [[ngramContainmentPairs]], whose exact form is quadratic per block
    * by construction. Asymmetric minwise screen:
    *
    *  1. hash every shingle; drop shingles whose document frequency in
    *     the block exceeds `maxDf` (a stop-shingle in half the corpus
    *     would alone generate quadratic candidates — the df cap is the
    *     documented scale lever, same as tfidfCosineTopK's);
    *  2. each document PROBES with the `probes` smallest kept hashes —
    *     a minwise sample of its shingle set, so if C(A→B) ≥ τ each
    *     probe independently hits B with probability ≈ C, and the
    *     screen misses a true pair with probability ≲ (1−τ)^probes
    *     (τ=0.6, probes=8 → ~6.5e-4);
    *  3. candidates = probe ⋈ inverted-index on (block, hash) — per-doc
    *     candidate count bounded by probes·maxDf, never block-quadratic;
    *  4. exact two-pointer intersection verifies every candidate, so
    *     emitted rows are exact containments — the screen only bounds
    *     RECALL, never precision.
    *
    * The exact twin stays the oracle; MiningSpec pins banded ≡ exact on
    * the test corpus so any recall loss from the cap/probe budget shows
    * up as a named assertion, not silent undercounting.
    *
    * @return (contained_id, container_id, containment), directed
    */
  def ngramContainmentPairsBanded(df: DataFrame, idCol: String, textCol: String,
                                  n: Int, threshold: Double,
                                  blockCols: Seq[String], probes: Int = 8,
                                  maxDf: Int = 200): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bc = blockCols.map(col)
    // Materialized shingle projection: feeds the posting explode and
    // both verify-join sides. Two house lessons apply at once: Generate
    // re-evaluates a DERIVED array child per emitted row (the
    // contaminationCounts 7× explode tax), and Spark has no cross-
    // branch CSE, so every un-persisted consumer re-runs the tokenize
    // chain (the q47 lesson — an unpersisted first cut of this operator
    // benched 13.7 s vs q146's 3.6 s from exactly these two taxes).
    val withSh = widen(df.select(
        (col(idCol).as("id") +: bc) :+
          TextAnalysis.tokens(col(textCol)).as("toks"): _*))
      .select((col("id") +: bc) :+ shinglesFromTokens(col("toks"), n).as("sh"): _*)
      .persist(lvl)
    // hashed postings (block..., id, h) — longs join cheaper than grams
    val posts = withSh.select(
        (col("id") +: bc) :+ explode(col("sh")).as("s"): _*)
      .withColumn("h", xxhash64(col("s"))).drop("s")
      .persist(lvl)
    try {
      // document frequency per (block, hash); hot shingles leave BOTH
      // the index and the probe pool (symmetric drop — a capped posting
      // list that kept "the first maxDf docs" would make recall depend
      // on partition order). The drop is a broadcast ANTI-join against
      // the HOT set, not an equi-join against the kept set: the hot
      // side is bounded by |postings| / maxDf rows (every hot shingle
      // costs > maxDf postings), so it broadcasts where the kept set —
      // nearly all distinct shingles — would shuffle the posting table
      // a second time.
      val hot = posts.groupBy(bc :+ col("h"): _*)
        .agg(count(lit(1)).as("dfc"))
        .filter(col("dfc") > maxDf).drop("dfc")
      // The |postings|/maxDf size bound only keeps the hot set
      // driver-broadcastable when maxDf is comfortably large; a tiny
      // cap (maxDf=2 over a billion-posting corpus) makes it hundreds
      // of millions of rows. Below the floor, drop the hint and let
      // the planner (AQE) pick a shuffle anti-join instead of OOMing.
      // The floor is a coarse proxy for hot-set ROW COUNT, not a size
      // estimate — maxDf just above it over a vast corpus can still
      // yield a large hot set, which is why the hint stays advisory
      // (Spark falls back to shuffle when the build side exceeds the
      // driver/broadcast limits) rather than a forced broadcast plan.
      val hotSide = if (maxDf >= HotSetBroadcastMinDf) broadcast(hot) else hot
      val kept = posts.join(hotSide, blockCols :+ "h", "left_anti")
        .persist(lvl)
      try {
        // minwise probe sample: the `probes` smallest kept hashes per doc
        val probeSide = kept
          .groupBy(col("id") +: bc: _*)
          .agg(slice(array_sort(collect_list(col("h"))), 1, probes).as("ph"))
          .select((col("id").as("id_a") +: bc) :+ explode(col("ph")).as("h"): _*)
        // candidates are a small fraction of the corpus by design
        // (bounded by probes·df per doc) — broadcast them so the cached
        // shingle side is probed in place (the minHashLshPairs shape)
        val cand = broadcast(probeSide
          .join(kept.select((col("id").as("id_b") +: bc) :+ col("h"): _*),
            blockCols :+ "h")
          .filter(col("id_a") =!= col("id_b"))
          .select(col("id_a").as("contained_id"), col("id_b").as("container_id"))
          .distinct())
        // exact verify on candidates only
        val shA = withSh.select(col("id").as("contained_id"), col("sh").as("sh_a"))
        val shB = withSh.select(col("id").as("container_id"), col("sh").as("sh_b"))
        cand.join(shA, "contained_id").join(shB, "container_id")
          .withColumn("inter",
            graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
          .withColumn("containment", col("inter").cast("double") / size(col("sh_a")))
          .filter(col("containment") >= threshold)
          .select(col("contained_id"), col("container_id"), col("containment"))
          .checkpointEager()
      } finally kept.unpersist(false)
    } finally { posts.unpersist(false); withSh.unpersist(false) }
  }

  /** Cross-split near-duplicate LEAKAGE report — the "is my eval split
    * contaminated by train?" audit every pipeline runs after splitting:
    * for each eval-side document, its closest train-side document by
    * n-gram Jaccard (within `blockCols`), the candidate count, and a
    * leaked flag at `threshold`.
    *
    * Asymmetric exact screen: eval docs are salted, train docs
    * replicated per salt (the [[ngramJaccardPairs]] skew treatment),
    * so cost is |eval_block|·|train_block| per block — bounded by the
    * eval fraction, NOT corpus-quadratic, but still the exact twin; at
    * web scale the candidate step is the banded MinHash screen
    * ([[minHashLshPairs]] probing an indexed train side) feeding this
    * same verify. Ties on max Jaccard break to the larger train id
    * (struct-max lexicographic order ≡ the oracle's `ORDER BY jac
    * DESC, train_id DESC` window).
    *
    * @return (eval_id, n_candidates, max_jaccard, nearest_train_id,
    *         leaked) — one row per eval doc sharing ≥1 shingle with
    *         any same-block train doc
    */
  def splitLeakageReport(df: DataFrame, idCol: String, textCol: String,
                         splitCol: Column, trainName: String,
                         n: Int, threshold: Double,
                         blockCols: Seq[String], salts: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val bc = blockCols.map(col)
    val toks = widen(df.select(
      (col(idCol).as("id") +: splitCol.as("split") +: bc) :+
        TextAnalysis.tokens(col(textCol)).as("toks"): _*))
    val withSh = toks.select(
      (col("id") +: col("split") +: bc) :+
        shinglesFromTokens(col("toks"), n).as("sh"): _*)
    val ev = withSh.filter(col("split") =!= trainName)
      .select((col("id").as("eval_id") +: bc) :+ col("sh").as("sh_a"): _*)
      .withColumn("salt", pmod(xxhash64(col("eval_id")), lit(salts.toLong)))
    val tr = withSh.filter(col("split") === trainName)
      .select((col("id").as("train_id") +: bc) :+ col("sh").as("sh_b"): _*)
      .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    ev.join(tr, blockCols :+ "salt")
      .withColumn("inter",
        graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .filter(col("inter") > 0)
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_candidates"),
        max(col("jaccard")).as("max_jaccard"),
        max(struct(col("jaccard"), col("train_id")))
          .getField("train_id").as("nearest_train_id"))
      .withColumn("leaked", col("max_jaccard") >= threshold)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS local-fingerprinting scheme): hash every token k-gram
    * ([[graft.functions.PolyHash]] — oracle-reproducible), slide a
    * window of `w` consecutive hashes, keep each window's MINIMUM, and
    * fingerprint the document with the distinct selected hashes. The
    * guarantee that makes it the standard excerpt detector: any shared
    * run of at least w+k-1 tokens between two documents selects at
    * least one IDENTICAL fingerprint in both — detection without
    * comparing documents pairwise. Expected density ~2/(w+1), so
    * fingerprints are a small sample of the gram stream.
    *
    * Pure per-row array expressions (no shuffle, no UDF): the whole
    * selection stays inside whole-stage codegen.
    *
    * @return (id, carryCols..., fp) — one row per distinct selected
    *         hash per doc
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int, w: Int,
                            carryCols: Seq[String] = Nil): DataFrame = {
    val arrs = winnowingFingerprintArrays(df, idCol, textCol, k, w, carryCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try arrs.select((col("id") +: carryCols.map(col)) :+
        explode(col("fps")).as("fp"): _*).checkpointEager()
    finally arrs.unpersist(false)
  }

  /** Per-doc fingerprint ARRAYS (id, carryCols..., fps). Split out so
    * callers explode a MATERIALIZED attribute, never a derived
    * expression (Generate re-evaluates a derived array child per
    * emitted row — the contaminationCounts lesson). The selection runs
    * through the [[graft.functions.WinnowingMins]] codegen kernel: the
    * `transform(sequence, i -> array_min(slice(hs, i, w)))` formulation
    * allocates a w-array per window — O(grams·w) — and benched 19.5 s
    * for the sf0.1 corpus vs ~1 s for the O(grams) deque kernel.
    */
  private def winnowingFingerprintArrays(df: DataFrame, idCol: String,
                                         textCol: String, k: Int, w: Int,
                                         carryCols: Seq[String]): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val cc = carryCols.map(col)
    val hs = transform(
      TextAnalysis.gramsFromTokens(TextAnalysis.tokens(col(textCol)), k),
      g => graft.functions.PolyHash.polyHash(g))
    df.select((col(idCol).as("id") +: cc) :+ hs.as("hs"): _*)
      .filter(size(col("hs")) >= w)
      .select((col("id") +: cc) :+ array_distinct(
        graft.functions.WinnowingMins.winnowingMins(col("hs"), lit(w))).as("fps"): _*)
  }

  /** Shared-fingerprint pair report over [[winnowingFingerprints]]:
    * documents in the same block sharing at least `minShared` selected
    * fingerprints, with the shared count — the winnowing paper's
    * "matches above noise" screen. One inverted-index self-join on the
    * fingerprint hash (shuffle-parallel, join fan-out bounded by
    * fingerprint density ~2/(w+1) per doc and per-hash doc frequency);
    * never a doc-pair cross product.
    */
  def winnowingSharedPairs(df: DataFrame, idCol: String, textCol: String,
                           k: Int, w: Int, minShared: Long,
                           blockCols: Seq[String]): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bc = blockCols.map(col)
    val arrs = winnowingFingerprintArrays(df, idCol, textCol, k, w, blockCols)
      .persist(lvl)
    // exploded fingerprint table feeds BOTH self-join sides — persist
    // (no cross-branch CSE; the arrays cache protects the explode)
    val fps = arrs.select((col("id") +: bc) :+ explode(col("fps")).as("fp"): _*)
      .persist(lvl)
    try {
      val a = fps.select((col("id").as("id_a") +: bc) :+ col("fp"): _*)
      val b = fps.select((col("id").as("id_b") +: bc) :+ col("fp"): _*)
      a.join(b, blockCols :+ "fp")
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .checkpointEager()
    } finally { fps.unpersist(false); arrs.unpersist(false) }
  }

  private val P = 2038074743L // prime > 2^30, products stay well under 2^63

  /** Universal-family multipliers for permutation i (i ≥ 0):
    * h_i(x) = (a_i·x + b_i) mod P. Base values are < 1e9+7 < P, so
    * a_i·x < P·P ≈ 4.15e18 stays inside signed-64.
    */
  private def hashA(i: Int): Long = 1103515245L * (i + 1) % P
  private def hashB(i: Int): Long = (12345L * (i + 1) + 7L) % P

  /** MinHash signature column: `numHashes` permutations of the base
    * shingle hash via a universal family h_i(x) = (a_i·x + b_i) mod p,
    * over the engine-portable [[graft.functions.PolyHash]] of the
    * shingle (NOT xxhash64 — the portable base is what lets an external
    * SQL oracle recompute the whole signature). Returns array<long> of
    * length `numHashes`; an empty shingle set yields sentinel -1 in
    * every slot (array_min of empty is null, and null band keys join
    * differently across engines). Input: the shingle array column.
    */
  def minHashSignature(sh: Column, numHashes: Int): Column =
    minHashSignatureFromHashes(
      transform(sh, s => graft.functions.PolyHash.polyHash(s)), numHashes)

  /** Signature from a MATERIALIZED base-hash array column. One-shot
    * `minHashSignature(sh, n)` hands every permutation the
    * `transform(sh, poly_hash)` TREE, which Catalyst duplicates into
    * each of the n mins — re-hashing every shingle once per permutation
    * and bloating the codegen unit n-fold (the shinglesFromTokens
    * lesson, third appearance). The signature stage projects the hash
    * array as a column and calls this instead.
    */
  def minHashSignatureFromHashes(hs: Column, numHashes: Int): Column = {
    val mins = (0 until numHashes).map { i =>
      coalesce(array_min(transform(hs, h =>
        pmod(h * hashA(i) + hashB(i), lit(P)))), lit(-1L))
    }
    array(mins: _*)
  }

  /** LSH candidate pairs from MinHash signatures: band the signature
    * (bands × rowsPerBand = signature length), bucket on the band hash,
    * and emit distinct id pairs sharing any bucket. Probabilistic recall:
    * P(candidate | jaccard=j) = 1-(1-j^r)^b.
    */
  /** (id, sh) shingle-set projection shared by the signature and verify
    * stages.
    */
  private[graft] def shingleDf(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = widen(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
    toks.select(col("id"), shinglesFromTokens(col("toks"), n).as("sh"))
  }

  def minHashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    candidatesFromShingles(shingleDf(df, idCol, textCol, n), bands, rowsPerBand)
  }

  /** Per-document LSH index STATE — `(id, sh, sig)`: the sorted shingle
    * set (for exact verification of screened candidates) plus the
    * minhash signature (for band bucketing). Everything 64-bit-integer
    * or sorted-string deterministic, so the row round-trips a parquet
    * store bit-exactly — the unit [[graft.pipeline.Incremental
    * .lshDedupCycle]] versions so a delta batch probes YESTERDAY'S
    * signatures instead of re-hashing the whole corpus.
    */
  def signatureState(df: DataFrame, idCol: String, textCol: String,
                     n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val sh = shingleDf(df, idCol, textCol, n)
    val hs = sh.select(col("id"), col("sh"),
      transform(col("sh"), s => graft.functions.PolyHash.polyHash(s)).as("hs"))
    hs.select(col("id"), col("sh"),
      minHashSignatureFromHashes(col("hs"), bands * rowsPerBand).as("sig"))
  }

  /** Band rows `(id, band, bucket)` from a [[signatureState]] table —
    * derivable from the state alone, no corpus scan.
    */
  def bandRowsFromState(state: DataFrame, bands: Int,
                        rowsPerBand: Int): DataFrame =
    state.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), bI =>
        slice(col("sig"), bI * rowsPerBand + 1, lit(rowsPerBand))))
      .as(Seq("band", "bucket")))

  private def candidatesFromShingles(sh: DataFrame, bands: Int,
                                     rowsPerBand: Int): DataFrame = {
    // hash array materialized as a column so the bands·rows permutation
    // mins share ONE PolyHash pass (and one codegen'd hashing loop)
    val hs = sh.select(col("id"),
      transform(col("sh"), s => graft.functions.PolyHash.polyHash(s)).as("hs"))
    val sig = hs.select(col("id"),
      minHashSignatureFromHashes(col("hs"), bands * rowsPerBand).as("sig"))
    // bucket key = the band's signature slice itself (array<long>), not a
    // hash of it: the equi-join on (band, slice) is exact in any engine,
    // where hashing the slice would reintroduce an engine-internal hash
    val bandRows = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), bI =>
        slice(col("sig"), bI * rowsPerBand + 1, lit(rowsPerBand)))).as(Seq("band", "bucket")))
    val x = bandRows.withColumnRenamed("id", "id_a")
    val y = bandRows.withColumnRenamed("id", "id_b")
    x.join(y, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification of the
    * candidates (the standard shape: cheap recall stage, exact precision
    * stage over the tiny candidate set).
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double,
                      bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    // The shingle projection feeds the candidate stage and both verify-
    // join sides. Spark has no cross-branch common-subexpression
    // elimination, so without an explicit persist the tokenize+shingle
    // stage executes once per consumer (~3×; measured 25% of the whole
    // sf0.1 bench in round 1). persist + eager localCheckpoint of the
    // (tiny) verified pair set lets us release the shingle cache before
    // returning — nothing stays pinned in executor storage.
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val sh = shingleDf(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try minHashLshPairsPlan(sh, threshold, bands, rowsPerBand).checkpointEager()
    finally sh.unpersist(false)
  }

  /** Candidate + verify dataflow over a (persisted) shingle projection —
    * split out so a spec can assert the physical plan reads the cache
    * (InMemoryTableScan) everywhere and never re-derives the shingles.
    */
  private[graft] def minHashLshPairsPlan(sh: DataFrame, threshold: Double,
                                         bands: Int, rowsPerBand: Int): DataFrame = {
    // candidate pairs are a tiny fraction of the corpus by design —
    // broadcast them so the fat cached shingle side is probed in place
    // (never shuffled, and never itself broadcast by a misestimate)
    val cands = broadcast(candidatesFromShingles(sh, bands, rowsPerBand))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter",
        graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Incremental MinHash+LSH: near-dup candidates of a NEW BATCH
    * against the standing corpus (the ingestion-time shape — a day's
    * crawl screens against the accumulated store without re-pairing
    * the corpus with itself), with exact Jaccard verification. The
    * MinHash twin of [[simHashPairsAgainst]]: one shingle/signature
    * pass over the union (split by the flag, the contaminationCounts-
    * Split discipline), band buckets joined batch→corpus only — the
    * candidate volume scales with the BATCH, not corpus².
    *
    * @param isBatch boolean column marking new-batch rows (null =
    *                corpus)
    * @return (batch_id, corpus_id, jaccard)
    */
  def minHashPairsAgainst(docs: DataFrame, isBatch: Column, idCol: String,
                          textCol: String, n: Int, threshold: Double,
                          bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val toks = widen(docs.select(col(idCol).as("id"),
      coalesce(isBatch, lit(false)).as("is_batch"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
    val sh = toks.select(col("id"), col("is_batch"),
        shinglesFromTokens(col("toks"), n).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hs = sh.select(col("id"), col("is_batch"),
        transform(col("sh"), x => graft.functions.PolyHash.polyHash(x)).as("hs"))
      val sig = hs.select(col("id"), col("is_batch"),
        minHashSignatureFromHashes(col("hs"), bands * rowsPerBand).as("sig"))
      val bandRows = sig.select(col("id"), col("is_batch"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), bI =>
          slice(col("sig"), bI * rowsPerBand + 1, lit(rowsPerBand))))
        .as(Seq("band", "bucket")))
      val cands = bandRows.filter(col("is_batch"))
        .select(col("band"), col("bucket"), col("id").as("batch_id"))
        .join(bandRows.filter(!col("is_batch"))
          .select(col("band"), col("bucket"), col("id").as("corpus_id")),
          Seq("band", "bucket"))
        .select(col("batch_id"), col("corpus_id")).distinct()
      broadcast(cands)
        .join(sh.select(col("id").as("batch_id"), col("sh").as("sh_a")), "batch_id")
        .join(sh.select(col("id").as("corpus_id"), col("sh").as("sh_b")), "corpus_id")
        .withColumn("inter",
          graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("batch_id"), col("corpus_id"), col("jaccard"))
        .checkpointEager()
    } finally sh.unpersist(false)
  }

  /** Benchmark decontamination: for each corpus document, the number of
    * distinct n-gram shingles it shares with ANY document of an eval/
    * benchmark set — the pretraining-hygiene check that a training
    * corpus does not contain the benchmark. One exploded shingle
    * semi-ish join: benchmark shingles are deduplicated to a distinct
    * set (its size is the small side — benchmarks are tiny next to the
    * corpus — so Catalyst broadcasts it), each corpus document then
    * counts its hits. Linear in corpus shingles; no pair blowup of any
    * kind.
    */
  def contaminationCounts(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String, n: Int): DataFrame = {
    // materialize the shingle arrays BEFORE exploding: Generate
    // re-evaluates a derived-array child per EMITTED row, so exploding
    // the raw tokenize→shingle→sort expression re-runs it once per
    // shingle (~7× measured at sf0.1 — 11 s vs 0.3 s from a
    // materialized table). Same lesson as the q47 persist, explode
    // flavor.
    val cSh = shingleDf(corpus, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bSh = shingleDf(benchmark, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try contaminationCountsPlan(cSh, bSh).checkpointEager()
    finally { cSh.unpersist(false); bSh.unpersist(false) }
  }

  /** [[contaminationCounts]] for the common case where corpus and
    * benchmark are SLICES OF ONE TABLE (a source/split flag): tokenizes
    * and shingles the table once behind a single persist instead of
    * running the shingle pipeline — scan, tokenize, gram, distinct,
    * sort, cache fill — separately per side. Same result as calling
    * [[contaminationCounts]] with the two filtered slices; one pass
    * over the data instead of two (and at bench scale, one codegen
    * shape + cache fill instead of two — measured ~3 s of the q72
    * wall time at sf0.1).
    */
  def contaminationCountsSplit(docs: DataFrame, isBench: Column,
                               idCol: String, textCol: String, n: Int): DataFrame = {
    // NULL flags count as corpus side — `!NULL` is NULL, which would
    // silently drop the row from BOTH sides of the split
    val toks = widen(docs.select(col(idCol).as("id"),
      coalesce(isBench, lit(false)).as("is_bench"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
    val sh = toks
      .select(col("id"), col("is_bench"), shinglesFromTokens(col("toks"), n).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try contaminationCountsPlan(sh.filter(!col("is_bench")).select(col("id"), col("sh")),
                                sh.filter(col("is_bench")).select(col("id"), col("sh")))
      .checkpointEager()
    finally sh.unpersist(false)
  }

  /** Semi-join dataflow over (persisted) shingle projections — split out
    * so a spec can assert the physical shape (broadcast semi-join)
    * underneath the eager checkpoint.
    */
  private[graft] def contaminationCountsPlan(cSh: DataFrame, bSh: DataFrame): DataFrame = {
    val c = cSh.select(col("id"), size(col("sh")).as("n_shingles"),
      explode(col("sh")).as("s"))
    val b = bSh.select(explode(col("sh")).as("s")).distinct()
    c.join(b, Seq("s"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_contaminated"), min(col("n_shingles")).as("n_shingles"))
  }

  /** Within-corpus repeated-span detection (the substring-level dedup
    * signal of "Deduplicating Training Data Makes Language Models
    * Better"): hash every n-token window of every document and report,
    * per document, how many of its distinct windows also occur in at
    * least one OTHER document (or again in itself under a different
    * window — any hash held by ≥2 (doc, window) entries). Two linear
    * passes + one aggregation — no pair join of any kind, so corpus
    * size only ever enters linearly. Window hashes are
    * [[graft.functions.PolyHash]] of the window text — engine-portable,
    * and hash collisions (astronomically rare) reproduce identically in
    * the oracle because it recomputes the same fold.
    *
    * EAGER (persist + local-checkpoint contract): the distinct-window
    * arrays feed an explode AND the per-doc window counts, so they are
    * materialized once and released.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val toks = widen(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
    val grams = toks
      .select(col("id"), array_distinct(TextAnalysis.gramsFromTokens(col("toks"), n)).as("gs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = grams.select(col("id"), explode(col("gs")).as("g"))
        .withColumn("h", graft.functions.PolyHash.polyHash(col("g")))
        .select(col("id"), col("h"))
      // (id, h) rows are distinct per doc (array_distinct upstream), so
      // a plain count per hash IS the number of holding documents
      val byH = pairs.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      val shared = pairs.join(byH.filter(col("n_docs") >= 2), Seq("h"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
      grams.select(col("id"), size(col("gs")).cast("long").as("n_windows"))
        .join(shared, Seq("id"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .checkpointEager()
    } finally grams.unpersist(false)
  }

  /** Connected components of the near-duplicate pair graph — the step
    * that turns pairwise matches (from any of the pair operators) into
    * dedup GROUPS with a canonical representative (minimum id), the way
    * a training-data pipeline actually applies them: keep one document
    * per component, drop the rest.
    *
    * Iterative min-label propagation WITH pointer jumping, as pure
    * DataFrame ops: each round every node takes the min of its own
    * label and its neighbors' labels (one equi-join + one groupBy),
    * then follows its label's own label one hop (`label(label(x))` —
    * path halving, a broadcast lookup of the tiny id→label map).
    * Labels decrease monotonically toward the component minimum;
    * converged when a full round changes nothing. The jump is what
    * bounds the rounds: plain propagation needs diameter rounds
    * (measured 10 on the sf0.1 simhash graph — near-dup CHAINS are
    * long even when clusters are dense), halving converges in
    * ~log(diameter). Eager localCheckpoints truncate lineage — no
    * driver-side graph state at any size.
    *
    * Returns (id, label) for EVERY id in `ids` — singletons keep their
    * own id as the label.
    */
  def duplicateComponents(pairs: DataFrame, ids: DataFrame, idCol: String,
                          maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .checkpointEager()
    // iterate ONLY over pair-touched nodes: an isolated node keeps
    // label = id forever, so hauling the whole corpus through every
    // round's joins and checkpoints buys nothing — touched nodes are
    // typically a small fraction of `ids` (the dup graph is sparse).
    // Isolated nodes are attached back after convergence.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .checkpointEager()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("id").as("src"), col("label").as("nl")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("nl")).as("nmin"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("mid"))
      // pointer jump: mid -> its own current label. A shuffle join on
      // the (one row per node) map — NOT a broadcast, which would
      // collect every node's label to the driver each round and cap the
      // operator at driver memory. The join key is skewed (every member
      // of a big component shares one label) — AQE's skew split handles
      // the fat partition.
      val ptr = stepped.select(col("id").as("pid"), col("mid").as("plabel"))
      val jumped = stepped.join(ptr, stepped("mid") === ptr("pid"), "left")
        .select(col("id"), col("old"),
          least(col("mid"), coalesce(col("plabel"), col("mid"))).as("label"))
        .checkpointEager()
      changed = jumped.filter(col("label") < col("old")).count()
      labels = jumped.select(col("id"), col("label"))
      it += 1
    }
    require(changed == 0, s"duplicateComponents did not converge in $maxIters rounds")
    ids.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** One row per member of each multi-document component: (id,
    * canonical id, component size). The dedup decision table — filter
    * `id != canonical_id` against the corpus to drop duplicates.
    */
  def duplicateGroups(pairs: DataFrame, ids: DataFrame, idCol: String): DataFrame = {
    val comp = duplicateComponents(pairs, ids, idCol)
    val sized = comp.groupBy(col("label")).agg(count(lit(1)).as("n_group"))
    comp.join(sized, "label")
      .filter(col("n_group") > 1)
      .select(col("id"), col("label").as("canonical_id"), col("n_group"))
  }

  /** Quality-aware canonical selection: per near-duplicate component,
    * keep the HIGHEST-scoring member (ties → smallest id) instead of
    * the smallest-id member — the SemDeDup/FineWeb curation rule
    * ("keep best", not "keep first"). `scored` must hold one row per
    * document: (idCol, scoreCol). Returns one row per multi-member
    * component: (canonical_id, keep_id, n_group, best_score).
    *
    * One shuffle join (id → score) + one groupBy(label); `min_by` over
    * a (-score, id) struct gives the deterministic argmax with partial
    * (map-side) aggregation, so a skewed giant component costs one fat
    * reduce key, not a whole-group buffer. The id rides in the ordering
    * struct UN-NEGATED so the tie rule holds for any orderable id type
    * (negating a string id would cast it to NULL double and leave ties
    * nondeterministic).
    */
  def keepBestByScore(pairs: DataFrame, scored: DataFrame, idCol: String,
                      scoreCol: String): DataFrame = {
    val comp = duplicateComponents(pairs, scored.select(col(idCol)), idCol)
    comp.join(scored.select(col(idCol).as("id"), col(scoreCol).as("score")), "id")
      .groupBy(col("label").as("canonical_id"))
      .agg(count(lit(1)).as("n_group"),
        // NULL scores sort LAST (+inf sentinel), matching max(score)'s
        // null-skipping — otherwise negate(NULL) sorts first and the
        // keep decision contradicts best_score
        min_by(col("id"), struct(
          coalesce(negate(col("score")).cast("double"), lit(Double.PositiveInfinity)),
          col("id"))).as("keep_id"),
        max(col("score")).as("best_score"))
      .filter(col("n_group") > 1)
      .select(col("canonical_id"), col("keep_id"), col("n_group"), col("best_score"))
  }

  /** 63-bit SimHash over portable token hashes: bit i of the result is
    * the sign of the sum over tokens of (parity of h_i(token) ? +1 : -1)
    * where h_i is the same universal family the MinHash permutations
    * use, over [[graft.functions.PolyHash]] of the token.
    *
    * 63 bits, not 64 — the top bit would make the value negative, and
    * signed-overflow behavior (shifts, sums) differs across engines;
    * every value here stays in [0, 2^63), where all engines agree.
    */
  def simHash(textCol: Column): Column =
    simHashFromHashes(transform(TextAnalysis.tokens(textCol),
      t => graft.functions.PolyHash.polyHash(t)))

  /** SimHash over a MATERIALIZED token-hash array column. The 63 bit-sum
    * folds each reference the array; if the argument were the
    * `transform(tokens(...))` tree instead of a bound attribute, every
    * fold would re-tokenize and re-hash the document (63×). Ops project
    * the hash array first.
    */
  def simHashFromHashes(hashes: Column): Column = {
    val bitSums = (0 until 63).map { i =>
      aggregate(hashes, lit(0), (acc, h) =>
        acc + when(pmod(h * hashA(i) + hashB(i), lit(P)) % 2 === 1, 1).otherwise(-1))
    }
    (0 until 63).map { i =>
      when(bitSums(i) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** (id, simhash) projection for `df`. */
  private def simHashDf(df: DataFrame, idCol: String, textCol: String,
                        extraCols: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val hashed = widen(df.select(
      (col(idCol).as("id") +: extraCols.map(col)) :+
        transform(TextAnalysis.tokens(col(textCol)),
          t => graft.functions.PolyHash.polyHash(t)).as("th"): _*))
    hashed.select(
      (col("id") +: extraCols.map(col)) :+ simHashFromHashes(col("th")).as("sh"): _*)
  }

  /** SimHash near-dup pairs within a caller-provided blocking column:
    * hamming ≤ maxDist, pairs compared only inside a block. Exact within
    * the block but quadratic in the block size — a scale hazard when the
    * blocking key is coarse (one hot key ≈ one giant task). The
    * scale-safe global search is [[simHashPairsBanded]].
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], maxDist: Int): DataFrame = {
    val h = simHashDf(df, idCol, textCol, blockCols)
    val a = h.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
    val b = h.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Global SimHash near-dup pairs via lossless pigeonhole banding: the
    * 63-bit simhash is split into `maxDist + 1` contiguous chunks; a
    * pair within hamming distance maxDist differs in at most maxDist
    * chunks, so at least one chunk matches EXACTLY — candidates are the
    * pairs sharing any (chunk index, chunk value), an equi-join, and the
    * exact hamming filter then removes false candidates. No caller
    * blocking key, no quadratic block: the only joins are bucket-local.
    *
    * The simhash rides along on the chunk rows (it is one long), so
    * verification needs no join back to the documents.
    */
  def simHashPairsBanded(df: DataFrame, idCol: String, textCol: String,
                         maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 63, s"maxDist must be in [0, 62], got $maxDist")
    val h = simHashDf(df, idCol, textCol, Nil)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chunkRows = bandChunkRows(h, maxDist)
      val a = chunkRows.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("chunk"), col("v"))
      val b = chunkRows.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("chunk"), col("v"))
      a.join(b, Seq("chunk", "v"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist", hamming(col("sh_a"), col("sh_b")).cast("long"))
        .filter(col("dist") <= maxDist)
        .select(col("id_a"), col("id_b"), col("dist"))
        .dropDuplicates("id_a", "id_b")
        .checkpointEager()
    } finally h.unpersist(false)
  }

  /** One row per (doc, pigeonhole chunk): the banded bucket key shared
    * by [[simHashPairsBanded]] (self-join) and [[simHashPairsAgainst]]
    * (batch-vs-corpus). Chunk widths partition the 63 bits into
    * maxDist+1 slices, so two docs within maxDist bits agree exactly on
    * at least one slice. Input must be a PERSISTED simHashDf frame —
    * the explode children are cheap shifts over `sh`, but `sh` itself
    * is the expensive column.
    */
  private def bandChunkRows(h: DataFrame, maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val base = 63 / nChunks
    val widths = Seq.tabulate(nChunks)(c => if (c < 63 % nChunks) base + 1 else base)
    val starts = widths.scanLeft(0)(_ + _)
    h.select(col("id"), col("sh"), posexplode(
      array((0 until nChunks).map(c =>
        shiftright(col("sh"), starts(c)).bitwiseAND(lit((1L << widths(c)) - 1))): _*))
      .as(Seq("chunk", "v")))
  }

  /** Incremental near-dup screen: batch documents within `maxDist` sign
    * bits of ANY corpus document — the ingestion-time filter that dedups
    * a new crawl against an existing corpus WITHOUT re-pairing the
    * corpus with itself. The corpus side never self-joins: cost is one
    * linear SimHash pass per side plus bucket-local batch×corpus
    * equi-joins, so re-running on each new batch is O(batch) work
    * against stable corpus buckets (at 100 TB the corpus chunk rows
    * would be written once and reused per batch; here both sides derive
    * from their persisted hash frames). Returns (batch_id, corpus_id,
    * dist) — anti-join the batch against `batch_id` to admit only
    * novel documents.
    */
  def simHashPairsAgainst(corpus: DataFrame, batch: DataFrame, idCol: String,
                          textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 63, s"maxDist must be in [0, 62], got $maxDist")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val hc = simHashDf(corpus, idCol, textCol, Nil).persist(lvl)
    val hb = simHashDf(batch, idCol, textCol, Nil).persist(lvl)
    try {
      val c = bandChunkRows(hc, maxDist).select(col("id").as("corpus_id"),
        col("sh").as("sh_c"), col("chunk"), col("v"))
      val b = bandChunkRows(hb, maxDist).select(col("id").as("batch_id"),
        col("sh").as("sh_b"), col("chunk"), col("v"))
      b.join(c, Seq("chunk", "v"))
        .withColumn("dist", hamming(col("sh_b"), col("sh_c")).cast("long"))
        .filter(col("dist") <= maxDist)
        .select(col("batch_id"), col("corpus_id"), col("dist"))
        .dropDuplicates("batch_id", "corpus_id")
        .checkpointEager()
    } finally { hc.unpersist(false); hb.unpersist(false) }
  }

  /** MinHash estimator calibration over the LSH candidate pairs: for
    * each candidate, the signature-agreement estimate of Jaccard
    * (`n_match / numHashes` — P(h_a = h_b) = J per permutation) next to
    * the exact shingle Jaccard, both in integer micro-units. The
    * monitoring view that tells you whether the (bands, rows) recall
    * curve still matches reality on YOUR corpus — estimator drift here
    * is how silent dedup-quality regressions get caught.
    *
    * Same persisted-shingle + persisted-signature dataflow as
    * [[minHashLshPairs]]; candidates broadcast, both probe joins hit
    * the cached frames.
    */
  def minHashCalibration(df: DataFrame, idCol: String, textCol: String,
                         n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val numHashes = bands * rowsPerBand
    val sh = shingleDf(df, idCol, textCol, n).persist(lvl)
    try {
      val sig = sh
        .select(col("id"), transform(col("sh"), s =>
          graft.functions.PolyHash.polyHash(s)).as("hs"))
        .select(col("id"), minHashSignatureFromHashes(col("hs"), numHashes).as("sig"))
        .persist(lvl)
      try {
        val bandRows = sig.select(col("id"), posexplode(
          transform(sequence(lit(0), lit(bands - 1)), bI =>
            slice(col("sig"), bI * rowsPerBand + 1, lit(rowsPerBand)))).as(Seq("band", "bucket")))
        val x = bandRows.withColumnRenamed("id", "id_a")
        val y = bandRows.withColumnRenamed("id", "id_b")
        val cands = broadcast(x.join(y, Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct())
        cands
          .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
          .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
          .withColumn("n_match",
            expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").cast("long"))
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("inter",
            graft.functions.SortedIntersectSize.sortedIntersectSize(col("sh_a"), col("sh_b")))
          .select(col("id_a"), col("id_b"), col("n_match"),
            expr(s"n_match * 1000000 div $numHashes").as("est_micro"),
            expr("inter * 1000000 div (size(sh_a) + size(sh_b) - inter)").as("exact_micro"))
          .checkpointEager()
      } finally sig.unpersist(false)
    } finally sh.unpersist(false)
  }

  /** SimHash estimator calibration — the [[minHashCalibration]] twin
    * for the banded SimHash screen: for every banded candidate pair
    * (hamming ≤ `maxDist` over the 63-bit simhash) emit the hamming
    * distance, the angular similarity that distance IMPLIES
    * (`round(cos(π·dist/63)·1e6)` — dist is a small integer, so any
    * engine evaluates cos on the identical double; the shared-shape
    * transcendental discipline), and the exact n-gram Jaccard in
    * micro-units. The hamming-vs-Jaccard cloud is the drift monitor
    * for choosing maxDist on a given corpus: a cloud sagging below the
    * expected curve means the screen needs a tighter threshold.
    *
    * Shared persisted dataflow (the q121 discipline): ONE tokens
    * projection feeds both the token-hash array (simhash side) and the
    * sorted shingle set (exact side); candidates ride the banded
    * bucket join and verify with the two-pointer kernel. Banding is
    * lossless, so the candidate set equals ALL pairs within maxDist —
    * which is what an oracle recomputes exhaustively.
    */
  def simHashCalibration(df: DataFrame, idCol: String, textCol: String,
                         n: Int, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 63, s"maxDist must be in [0, 62], got $maxDist")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val toks = widen(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
    val base = toks
      .select(col("id"),
        transform(col("toks"), t => graft.functions.PolyHash.polyHash(t)).as("th"),
        shinglesFromTokens(col("toks"), n).as("shg"))
      .select(col("id"), simHashFromHashes(col("th")).as("sim"), col("shg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chunkRows = bandChunkRows(
        base.select(col("id"), col("sim").as("sh")), maxDist)
      val cands = broadcast(chunkRows
        .select(col("id").as("id_a"), col("sh").as("sh_a"), col("chunk"), col("v"))
        .join(chunkRows.select(col("id").as("id_b"), col("sh").as("sh_b"),
          col("chunk"), col("v")), Seq("chunk", "v"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist", hamming(col("sh_a"), col("sh_b")).cast("long"))
        .filter(col("dist") <= maxDist)
        .select(col("id_a"), col("id_b"), col("dist"))
        .distinct())
      cands
        .join(base.select(col("id").as("id_a"), col("shg").as("shg_a")), "id_a")
        .join(base.select(col("id").as("id_b"), col("shg").as("shg_b")), "id_b")
        .withColumn("inter",
          graft.functions.SortedIntersectSize.sortedIntersectSize(col("shg_a"), col("shg_b")))
        .select(col("id_a"), col("id_b"), col("dist"),
          round(cos(lit(math.Pi) * col("dist") / 63.0) * 1000000, 0)
            .cast("long").as("cos_est_micro"),
          expr("inter * 1000000 div (size(shg_a) + size(shg_b) - inter)").as("exact_micro"))
        .checkpointEager()
    } finally base.unpersist(false)
  }

  /** Cross-document boilerplate removal (the CCNet/RefinedWeb paragraph
    * dedup): cut each document into consecutive `segTokens`-token
    * segments, count how many DISTINCT documents contain each segment,
    * and strip every segment that appears in `maxDocs`-or-more documents
    * — headers, footers, navigation chrome, license blurbs. Returns one
    * row per document: `(id, n_segs, n_removed, clean_text)` where
    * `clean_text` is the surviving segments rejoined in original order
    * (whitespace normalized to single spaces — segmentation tokenizes).
    *
    * Scale shape: one linear segmentation pass (persisted before the
    * positional explode — the Generate re-evaluation lesson; deriving
    * the segment array in the exploding stage re-slices the whole array
    * once per emitted row), one hash-keyed count (map-side partial agg
    * after the per-doc distinct), and a BROADCAST join of the common-
    * segment set — above any useful threshold that set is tiny (it's
    * the boilerplate, not the corpus). Reassembly is a single groupBy
    * per document collecting its own bounded segment list; no global
    * state, no driver collection.
    */
  def stripCommonSegments(df: DataFrame, idCol: String, textCol: String,
                          segTokens: Int, maxDocs: Long): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    require(maxDocs >= 2, "maxDocs below 2 would strip every segment")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // tokens() never yields an empty array today (split on trim leaves
    // [""]), but guard anyway: size 0 would make the slice sequence
    // below sequence(0, -1), which Spark evaluates DESCENDING to
    // [0, -1] (two phantom "" segments) while DuckDB's
    // generate_series(0, -1) yields none — dropping empty docs is the
    // cross-engine-consistent behavior under any future tokenizer
    val toks = widen(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
      .filter(size(col("toks")) > 0)
    // consecutive fixed-width slices; the trailing segment may be short
    val nSegs = expr(s"(size(toks) + $segTokens - 1) div $segTokens")
    val segRows = toks
      .select(col("id"), transform(sequence(lit(0), nSegs - 1), i =>
        array_join(slice(col("toks"), i * segTokens + 1, lit(segTokens)), " ")).as("segs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seg = segRows.select(col("id"),
          posexplode(col("segs")).as(Seq("seg_idx", "seg_text")))
        .withColumn("h", graft.functions.PolyHash.polyHash(col("seg_text")))
      // a segment repeated WITHIN one doc counts that doc once
      val common = seg.select(col("h"), col("id")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= maxDocs)
      val flagged = seg.join(broadcast(common), Seq("h"), "left")
        .withColumn("removed", col("n_docs").isNotNull)
      flagged.groupBy(col("id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"),
          array_join(transform(
            array_sort(collect_list(when(!col("removed"),
              struct(col("seg_idx"), col("seg_text"))))),
            s => s.getField("seg_text")), " ").as("clean_text"))
        .checkpointEager()
    } finally segRows.unpersist(false)
  }

  /** Source-level token-set overlap map: exact Jaccard between every
    * group pair PLUS the bottom-k minwise estimate and its error — the
    * vocabulary-overlap complement of [[graft.ext.LangModel.jsDivergencePico]]
    * (set overlap vs distribution divergence), with the sketch column
    * certifying on real data how much fidelity the constant-size
    * summary would give up at a scale where the exact pair join is no
    * longer affordable.
    *
    * Bottom-k estimator: J ≈ |S_k(A∪B) ∩ S_k(A) ∩ S_k(B)| / |S_k(A∪B)|
    * where S_k = the k smallest distinct [[graft.functions.PolyHash]]
    * values — engine-portable, so the oracle replays the sketch too.
    *
    * Scale shape: the exact side is one (grp, tok)-distinct projection,
    * one self-join on `tok` (fan-out bounded by groups per token), and
    * group-sized aggregates; the sketch side ranks hashes within each
    * group (vocabulary-sized window per group) and every array after
    * that is exactly k elements. Output is (groups choose 2) rows.
    *
    * @return (grp_a, grp_b, n_a, n_b, inter, jaccard_micro, est_micro,
    *         err_micro), grp_a < grp_b
    */
  def groupTokenOverlap(df: DataFrame, grpCol: String, textCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, "sketch size must be positive")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val st = widen(df.select(col(grpCol).as("grp"),
        TextAnalysis.tokens(col(textCol)).as("toks")))
      .select(col("grp"), explode(col("toks")).as("tok")).distinct()
      .persist(lvl)
    try {
      val sizes = st.groupBy(col("grp")).agg(count(lit(1)).as("n"))
      val inter = st.select(col("grp").as("grp_a"), col("tok"))
        .join(st.select(col("grp").as("grp_b"), col("tok")), "tok")
        .filter(col("grp_a") < col("grp_b"))
        .groupBy(col("grp_a"), col("grp_b")).agg(count(lit(1)).as("inter"))
      val hs = st.select(col("grp"),
        graft.functions.PolyHash.polyHash(col("tok")).as("h")).distinct()
      val sig = hs
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("h"))))
        .filter(col("rn") <= k)
        .groupBy(col("grp")).agg(array_sort(collect_list(col("h"))).as("sig"))
      val pairs = sig.select(col("grp").as("grp_a"), col("sig").as("sa"))
        .join(broadcast(sig.select(col("grp").as("grp_b"), col("sig").as("sb"))),
          col("grp_a") < col("grp_b"))
        .withColumn("uk", slice(array_sort(array_union(col("sa"), col("sb"))), 1, k))
        .withColumn("est_micro", expr(
          "size(array_intersect(array_intersect(uk, sa), sb)) * 1000000L div size(uk)"))
      pairs
        .join(broadcast(sizes.select(col("grp").as("grp_a"), col("n").as("n_a"))), "grp_a")
        .join(broadcast(sizes.select(col("grp").as("grp_b"), col("n").as("n_b"))), "grp_b")
        .join(inter, Seq("grp_a", "grp_b"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .withColumn("jaccard_micro",
          expr("inter * 1000000 div (n_a + n_b - inter)"))
        .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
          col("inter"), col("jaccard_micro"), col("est_micro"),
          abs(col("est_micro") - col("jaccard_micro")).as("err_micro"))
        .checkpointEager()
    } finally st.unpersist(false)
  }

  /** Duplicated-SPAN extraction — the removal signal of substring-level
    * training-data dedup (/root/reference has no text ops; the design
    * follows the published ExactSubstr procedure): hash every SLIDING
    * n-token window, mark windows whose hash occurs ≥ 2 times anywhere
    * in the corpus (other documents or elsewhere in the same one), and
    * merge each document's marked windows into MAXIMAL token intervals.
    * Unlike [[stripCommonSegments]] (disjoint fixed segments, stripped
    * only at a high document-frequency threshold — boilerplate), this
    * finds every once-repeated run at sliding granularity, the way
    * suffix-array dedup does, and reports exact token extents.
    *
    * Interval merge is gaps-and-islands per document: windows at
    * positions p, q (p < q) cover a contiguous token run iff q ≤ p + n,
    * so an island breaks where the position gap exceeds n. The window
    * functions partition by document id — never a global order.
    *
    * Scale shape: two linear passes (position explode → hash count →
    * semi-join back) + per-doc windows. Window hashes are
    * [[graft.functions.PolyHash]] so the oracle reproduces collisions.
    *
    * @return (id, span_start, span_end, span_len) — 0-based inclusive
    *         token extents, one row per maximal duplicated span
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    require(n >= 1, "window length must be positive")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val toks = widen(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks")))
    // persist the position rows: they feed the hash count AND the
    // dup-join probe (no cross-branch CSE), and the gram array must be
    // materialized before the positional explode (the Generate
    // re-evaluation lesson)
    val grams = toks
      .select(col("id"), TextAnalysis.gramsFromTokens(col("toks"), n).as("gs"))
      .select(col("id"), posexplode(col("gs")).as(Seq("pos", "g")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        graft.functions.PolyHash.polyHash(col("g")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dupH = grams.groupBy(col("h")).agg(count(lit(1)).as("occ"))
        .filter(col("occ") >= 2).select(col("h"))
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      grams.join(dupH, Seq("h"), "left_semi")
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(w) > n, 1L).otherwise(0L))
        .withColumn("island", sum(col("brk")).over(w))
        .groupBy(col("id"), col("island"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + (n - 1)).as("span_end"))
        .select(col("id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_len"))
        .checkpointEager()
    } finally grams.unpersist(false)
  }

  /** Per-document coverage report over [[duplicatedSpans]]: how much of
    * each document sits inside a duplicated run — the threshold key for
    * "drop documents that are mostly copies" curation. One row per input
    * document (zero-span documents report zero coverage).
    *
    * @return (id, n_tokens, n_spans, covered_tokens, coverage_micro)
    */
  def duplicatedSpanCoverage(df: DataFrame, idCol: String, textCol: String,
                             n: Int): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, n)
    val perDoc = spans.groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("covered_tokens"))
    df.select(col(idCol).as("id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        expr("coalesce(covered_tokens, 0L) * 1000000 div n_tokens")
          .as("coverage_micro"))
  }

  /** Scrub pass over [[duplicatedSpans]]: cut every duplicated span out
    * of its document and emit the surviving REMNANT segments of at
    * least `minTokens` tokens, re-joined as text — what actually ships
    * to training after substring dedup (short remnants between two cut
    * spans are noise and are dropped, per the published procedure).
    *
    * Remnants are the per-document complement intervals of the span
    * set: the run before the first span (`lag` with a -1 sentinel makes
    * it uniform), the gaps between consecutive spans, and the tail run
    * — plus the whole document when it has no spans at all (anti-join).
    * All windows partition by document id; remnant text is a bounded
    * per-row `slice` of the document's own token array.
    *
    * @return (id, seg_index, seg_start, seg_len, seg_text), seg_index
    *         numbered per document in token order from 1
    */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int, minTokens: Int): DataFrame = {
    require(minTokens >= 1, "minTokens must be positive")
    val toks = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    val spans = duplicatedSpans(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Window.partitionBy(col("id")).orderBy(col("span_start"))
      // gap candidates: [prev_end+1, span_start-1] per span (the first
      // span's sentinel prev_end = -1 yields the head run), plus the
      // tail run after the last span
      val gaps = spans
        .withColumn("prev_end", lag(col("span_end"), 1, -1L).over(w))
        .select(col("id"), (col("prev_end") + 1).as("seg_start"),
          (col("span_start") - col("prev_end") - 1).as("seg_len"))
      val tails = spans.groupBy(col("id"))
        .agg(max(col("span_end")).as("last_end"))
        .join(toks.select(col("id"), col("n_tokens")), "id")
        .select(col("id"), (col("last_end") + 1).as("seg_start"),
          (col("n_tokens") - col("last_end") - 1).as("seg_len"))
      val clean = toks.join(spans.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(0L).as("seg_start"), col("n_tokens").as("seg_len"))
      val segs = gaps.unionByName(tails).unionByName(clean)
        .filter(col("seg_len") >= minTokens)
      val wIdx = Window.partitionBy(col("id")).orderBy(col("seg_start"))
      segs
        .join(toks.select(col("id"), col("toks")), "id")
        .withColumn("seg_index", row_number().over(wIdx).cast("long"))
        .select(col("id"), col("seg_index"), col("seg_start"), col("seg_len"),
          array_join(slice(col("toks"), (col("seg_start") + 1).cast("int"),
            col("seg_len").cast("int")), " ").as("seg_text"))
        .checkpointEager()
    } finally spans.unpersist(false)
  }

  /** Per-document n-gram novelty against everything EARLIER in the
    * corpus order: the fraction of a document's distinct n-grams whose
    * first occurrence (minimum id) is the document itself — the
    * "marginal new content" curve that decides when additional
    * crawl/source data stops paying for itself.
    *
    * Shape: one (gram → min id) shuffle (partial-aggregated map-side)
    * plus one join back — linear in total grams, no pair joins; the
    * id-order is the corpus order, so the operator streams at any
    * scale.
    *
    * @return (id, n_grams, n_novel, novelty_milli)
    */
  def ngramNoveltyByOrder(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val grams = widen(df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks")))
      .select(col("id"), shinglesFromTokens(col("toks"), n).as("sh"))
      .select(col("id"), explode(col("sh")).as("g"))
    val first = grams.groupBy(col("g")).agg(min(col("id")).as("first_id"))
    grams.join(first, "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_milli",
        round((col("n_novel") * 1000L).cast("double")
          / col("n_grams").cast("double"), 0).cast("long"))
  }

  /** Cross-source duplicate FLOW matrix: after exact-hash dedup keeps
    * the minimum-id row of every duplicate group, which source's rows
    * survive at which source's expense — the "who wins canonicalization"
    * audit that decides whether a dedup pass silently drains one
    * provenance into another. One hash groupBy, one join back, one
    * pair count; linear.
    *
    * @param key the canonicalization key (full-text hash for strict
    *            exact dedup, a prefix/normalized key for the fuzzier
    *            passes — same contract as [[exactDupGroups]])
    * @return (src_keep, src_dup, n_docs) — dropped rows only, keyed by
    *         (keeper's source, dropped row's source)
    */
  def dedupFlowMatrix(df: DataFrame, idCol: String,
                      key: org.apache.spark.sql.Column,
                      srcCol: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val rows = df.select(col(idCol).as("id"), col(srcCol).as("src"),
      key.as("h"))
    val keep = rows.groupBy(col("h"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val keepSrc = rows.select(col("id").as("keep_id"), col("src").as("src_keep"))
    rows.join(keep, "h")
      .filter(col("id") =!= col("keep_id"))
      .join(keepSrc, "keep_id")
      .groupBy(col("src_keep"), col("src").as("src_dup"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Content-defined chunking dedup report per source: documents are
    * cut where the rolling `w`-char window's PolyHash hits `0 mod
    * mask` (expected chunk ≈ mask chars), chunks are keyed by their
    * own hash, and each source reports its chunk-level duplication —
    * the storage-side dedup estimate (CDC is what makes chunk stores
    * resilient to insertions: an edit reshuffles only the chunks it
    * touches, unlike fixed-size blocks).
    *
    * Boundaries and chunk keys are pure integer PolyHash folds —
    * engine-exact. One linear pass (O(chars·w) hashing per document),
    * one (src) aggregation; no pair joins.
    *
    * @return (source, n_docs, n_chunks, n_distinct, dup_milli,
    *         mean_len_milli)
    */
  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String,
                    srcCol: String, w: Int = 8, mask: Int = 32): DataFrame = {
    import graft.functions.PolyHash
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = widen(df.select(col(idCol).as("id"), col(srcCol).as("src"),
      col(textCol).as("text")))
    val ln = length(col("text"))
    // the O(n) rolling-hash kernel already emits the leading 1 and the
    // in-bounds `b + w` cut positions (graft.functions.CdcCutpoints)
    val withStarts = base
      .withColumn("starts", graft.functions.CdcCutpoints.cdcCutpoints(
        col("text"), lit(w), lit(mask)))
      .withColumn("ends", concat(
        slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
        array(ln + 1)))
    val chunks = withStarts
      .withColumn("chunks", zip_with(col("starts"), col("ends"),
        (s, e) => col("text").substr(s, e - s)))
      .select(col("id"), col("src"), explode(col("chunks")).as("chunk"))
      .select(col("id"), col("src"),
        PolyHash.polyHash(col("chunk")).as("h"),
        length(col("chunk")).cast("long").as("len"))
    chunks.groupBy(col("src"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct"),
        sum(col("len")).as("sum_len"))
      .select(col("src").as("source"), col("n_docs"), col("n_chunks"),
        col("n_distinct"),
        round(((col("n_chunks") - col("n_distinct")) * 1000L).cast("double")
          / col("n_chunks").cast("double"), 0).cast("long").as("dup_milli"),
        round(col("sum_len").cast("double") * 1000.0
          / col("n_chunks").cast("double"), 0).cast("long").as("mean_len_milli"))
  }

  /** Distributed Merkle root per corpus slice: leaves are the
    * engine-portable poly_hash of each document's text, ranked by id
    * within the slice; `rounds` pairing rounds fold adjacent nodes
    * (`(left·8191 + right) mod 1e9+7`, odd node promotes unchanged)
    * until one root remains — the integrity manifest a snapshot store
    * publishes next to the versioned parquet (io/Versioned, q132's
    * diff): two slices share a root iff they hold the same texts in
    * the same id order.
    *
    * log₂-depth tree as `rounds` keyed aggregations, each halving the
    * table — no per-slice collect, no sequential fold over an
    * unbounded list. `rounds` must cover the largest slice
    * (2^rounds ≥ max docs per slice): a slice the folds failed to
    * collapse to one node gets a NULL `root_hash` (its `n_nodes` > 1),
    * never a silently-wrong partial root.
    *
    * @return (source, n_docs, root_hash)
    */
  def merkleRootBySlice(docs: DataFrame, idCol: String, textCol: String,
                        srcCol: String, rounds: Int = 12): DataFrame = {
    require(rounds >= 1 && rounds <= 40, "rounds out of range")
    val w = Window.partitionBy(col("src")).orderBy(col("id"))
    val leaves = docs.select(col(srcCol).as("src"), col(idCol).as("id"),
        graft.functions.PolyHash.polyHash(col(textCol)).as("h"))
      .withColumn("idx", (row_number().over(w) - 1).cast("long"))
      .select(col("src"), col("idx"), col("h"))
    val folded = (1 to rounds).foldLeft(leaves) { (cur, r) =>
      val stepped = cur.groupBy(col("src"), expr("idx div 2").as("idx"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("idx"), col("h"))).as("lo"),
          max(struct(col("idx"), col("h"))).as("hi"))
        .select(col("src"), col("idx"),
          when(col("n") === 2L,
            (col("lo.h") * 8191L + col("hi.h")) % 1000000007L)
            .otherwise(col("lo.h")).as("h"))
      if (r % 4 == 0) Exec.checkpointEager(stepped) else stepped
    }
    val roots = folded.groupBy(col("src")).agg(count(lit(1)).as("n_nodes"),
      min(col("h")).as("root_hash"))
    val sizes = docs.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("n_docs"))
    sizes.join(roots, "src")
      .select(col("src").as("source"), col("n_docs"),
        // incomplete fold (slice bigger than 2^rounds) must not publish a
        // plausible-but-wrong root: surface NULL, keep n_nodes as the why
        when(col("n_nodes") === 1L, col("root_hash")).as("root_hash"),
        col("n_nodes"))
  }
}
