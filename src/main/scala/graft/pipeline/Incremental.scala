package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Versioned
import graft.ops.IncrementalAgg

/** Incremental (delta) pipeline mode — the capability the reference
  * lacks: every reference run re-reads the FULL raw snapshot
  * (R/preprocessing-surveys.R:69-74 re-downloads and reprocesses the
  * entire versioned object each time). At the 100 TB north star that
  * full reprocess is the dominant recurring cost; the nightly delta is
  * GBs while the history is the lake.
  *
  * This module composes the engine's existing seams into one cycle:
  * [[graft.io.Versioned]] resolves the newest raw DELTA object and the
  * newest prior STATE object; [[graft.ops.IncrementalAgg]] folds the
  * delta's rollup into the state (a commutative-monoid merge — counts
  * and exact integer-cent sums add, so merge(state(prior),
  * state(delta)) ≡ state(full) bit-for-bit at any parallelism); the
  * merged state is published as the next version for the following
  * cycle. The run touches O(|state| + |delta|) rows and the plan scans
  * ONLY the two versioned objects — never the full raw history
  * (IncrementalSpec pins the scan set; the q340 oracle is the full
  * reprocess, so the gate itself proves incremental ≡ full).
  *
  * Late-arriving data needs no special path: a delta row landing in an
  * old (key, month) group simply adds to that group's state components.
  * The state is algebraic by design — medians and other holistic
  * aggregates stay in the full-reprocess lane (Export.monthlyMetrics);
  * the incremental lane carries what folds.
  */
object Incremental {

  /** One delta cycle over a versioned store rooted at `dir`:
    *
    *  1. resolve + read the newest `statePrefix` object (prior state:
    *     `keys :+ (n, sum_cents)`),
    *  2. resolve + read the newest `rawPrefix` object (the new delta
    *     rows only),
    *  3. merge the delta's rollup into the state,
    *  4. publish the merged state under `statePrefix + "_next"` with
    *     `newTag` (a distinct prefix keeps the cycle idempotent under
    *     re-runs in one process — the prior-state resolution never
    *     picks up this cycle's own output),
    *  5. return the merged state LAZILY — its plan reads exactly the
    *     two versioned parquet objects, which is the property the spec
    *     audits.
    */
  def deltaCycle(spark: SparkSession, dir: String, statePrefix: String,
                 rawPrefix: String, keys: Seq[String], valueCol: Column,
                 newTag: String): DataFrame = {
    val prior = Versioned.readLatest(spark, dir, statePrefix)
    val delta = Versioned.readLatest(spark, dir, rawPrefix)
    val merged = IncrementalAgg.mergeStates(keys,
      prior, IncrementalAgg.rollupState(delta, keys, valueCol))
    Versioned.write(merged, dir, statePrefix + "_next", newTag)
    merged
  }

  /** Incremental LSH deduplication cycle — the delta lane for the
    * MinHash screen ([[graft.ext.Dedup.minHashPairsAgainst]] proved the
    * batch-vs-corpus JOIN shape; this adds the missing piece: the
    * corpus side comes from a VERSIONED SIGNATURE STATE, so a nightly
    * delta batch re-hashes only ITSELF — the prior corpus contributes
    * its stored `(id, sh, sig)` rows, never a re-tokenize of the lake).
    *
    *  1. resolve + read the newest signature state and the newest raw
    *     delta object;
    *  2. compute the delta's own [[graft.ext.Dedup.signatureState]]
    *     (the only text-processing in the cycle);
    *  3. candidates = delta band rows ⋈ state band rows (cross-version
    *     dups) ∪ delta ⋈ delta with `id_a < id_b` (intra-batch dups);
    *  4. verify every candidate exactly (sorted-intersection Jaccard ≥
    *     `threshold`) against the stored shingle sets;
    *  5. publish state ∪ delta-signatures as the next version.
    *
    * @return (batch_id, corpus_id, jaccard) — every NEW duplicate pair
    *         this delta introduces (batch-vs-prior and batch-vs-batch);
    *         prior-vs-prior pairs were reported by earlier cycles
    */
  def lshDedupCycle(spark: SparkSession, dir: String, statePrefix: String,
                    rawPrefix: String, idCol: String, textCol: String,
                    n: Int, threshold: Double, bands: Int, rowsPerBand: Int,
                    newTag: String): DataFrame = {
    import graft.ext.Dedup
    val state = Versioned.readLatest(spark, dir, statePrefix)
    val delta = Versioned.readLatest(spark, dir, rawPrefix)
    val dState = graft.ext.Exec.checkpointEager(
      Dedup.signatureState(delta, idCol, textCol, n, bands, rowsPerBand))
    val sBand = Dedup.bandRowsFromState(state, bands, rowsPerBand)
    val dBand = Dedup.bandRowsFromState(dState, bands, rowsPerBand)
    val crossVer = dBand.select(col("band"), col("bucket"),
        col("id").as("batch_id"))
      .join(sBand.select(col("band"), col("bucket"), col("id").as("corpus_id")),
        Seq("band", "bucket"))
      .select(col("batch_id"), col("corpus_id"))
    val intraBatch = dBand.select(col("band"), col("bucket"),
        col("id").as("batch_id"))
      .join(dBand.select(col("band"), col("bucket"), col("id").as("corpus_id")),
        Seq("band", "bucket"))
      .filter(col("batch_id") < col("corpus_id"))
      .select(col("batch_id"), col("corpus_id"))
    val cands = crossVer.unionAll(intraBatch).distinct()
    val allSh = state.select(col("id"), col("sh"))
      .unionByName(dState.select(col("id"), col("sh")))
    val pairs = cands
      .join(dState.select(col("id").as("batch_id"), col("sh").as("sh_a")),
        "batch_id")
      .join(allSh.select(col("id").as("corpus_id"), col("sh").as("sh_b")),
        "corpus_id")
      .withColumn("inter", graft.functions.SortedIntersectSize
        .sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
    Versioned.write(state.unionByName(dState), dir, statePrefix + "_next",
      newTag)
    pairs
  }

  /** Incremental SCD2 append — extend a versioned interval table
    * ([[graft.ops.Scd2.fromChangeLog]]) with a new change-log delta
    * WITHOUT replaying the full log. Contract: the log is append-only
    * in time — every delta row's effective instant is strictly after
    * the prior state's open versions (enforced by construction when
    * deltas are time-partitioned).
    *
    * Per touched key, the OPEN version re-enters the collapse as the
    * earliest synthetic log row (sentinel tie-break `Long.MinValue`):
    * the run-merge then sees exactly what the full rebuild's lag
    * compare sees — the last prior value — so a delta row repeating
    * the open value collapses, a change closes the open interval at
    * the change's instant, and version numbers continue from the
    * key's prior maximum. Untouched keys and closed versions pass
    * through by reference. Work is O(|state| + |delta| · log-ops),
    * never O(|history log|).
    *
    * @return the merged interval table ≡ `fromChangeLog(full log)`
    *         (the q344 oracle IS the full rebuild)
    */
  def scd2DeltaCycle(spark: SparkSession, dir: String, statePrefix: String,
                     rawPrefix: String, keyCols: Seq[String],
                     valueCols: Seq[String], effectiveCol: String,
                     tieBreakCol: String, newTag: String): DataFrame = {
    val state = Versioned.readLatest(spark, dir, statePrefix)
    val delta = Versioned.readLatest(spark, dir, rawPrefix)
    val keys = keyCols.map(col)
    val touched = delta.select(keys: _*).distinct()
    val openAsLog = state.join(touched, keyCols, "left_semi")
      .filter(col("is_current"))
      .select((keys ++ valueCols.map(col))
        :+ col("effective_from").as(effectiveCol)
        :+ lit(Long.MinValue).as(tieBreakCol): _*)
    val deltaLog = delta.select((keys ++ valueCols.map(col))
      :+ col(effectiveCol) :+ col(tieBreakCol).cast("long"): _*)
    val synth = graft.ops.Scd2.fromChangeLog(
      openAsLog.unionByName(deltaLog), keyCols, valueCols, effectiveCol,
      Seq(tieBreakCol))
    val priorMax = state.join(touched, keyCols, "left_semi")
      .groupBy(keys: _*).agg(max(col("version")).as("__vmax"))
    val renumbered = synth
      .join(priorMax, keyCols, "left")
      .withColumn("version", col("version") + coalesce(col("__vmax"), lit(1L)) - 1L)
      .drop("__vmax", tieBreakCol)
    val carried = state.join(touched, keyCols, "left_anti")
      .unionByName(state.join(touched, keyCols, "left_semi")
        .filter(!col("is_current")))
    val merged = carried.unionByName(
      renumbered.select(carried.columns.map(col): _*))
    Versioned.write(merged, dir, statePrefix + "_next", newTag)
    merged
  }
}
