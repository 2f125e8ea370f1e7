package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Design notes (100 TB target):
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting
  *    replace any hand-tuned partition counts when the same plans run on a
  *    real cluster.
  *  - `spark.sql.shuffle.partitions` defaults to the local core count; on a
  *    cluster this is expected to be overridden (or left to AQE's
  *    coalescing with a high initial value).
  *  - Session time zone is pinned to UTC so timestamp arithmetic matches
  *    the DuckDB oracle byte-for-byte.
  *  - `parquet.nanosAsLong` lets us read TIMESTAMP(NANOS) parquet columns
  *    (Spark has no nanos type); [[Tables.events]] converts to micros.
  */
object Sessions {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // default-on in current Spark, pinned EXPLICITLY: the engine's
      // skew posture (SkewSpec) assumes hot-key probe rows in shuffle
      // joins get runtime-split — a deployment override turning AQE
      // skew handling off would silently reintroduce the straggler
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let AQE re-plan under caching (Spark 3.2+): by default a cached
      // plan pins its output partitioning and compiles without adaptive
      // execution. NOTE the measured limitation: persist()/checkpoint
      // MATERIALIZATION of a deep fold still runs without runtime
      // coalescing even with this on (markov fold: 0.9 s action vs
      // ~4-5 s eager materialization at sf0.1) — hence the engine's
      // pattern of checkpointing shallow shared INPUTS and returning
      // fold results LAZILY so the caller's action gets full AQE.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ContextCleaner only reclaims dereferenced checkpoint/broadcast
      // blocks after a DRIVER GC; a long-running driver (Bench/Verify
      // here, any resident pipeline service at 100 TB) can go 30+ min
      // without one, so eagerly-checkpointed frames from finished
      // queries pile up in the block manager and squeeze execution
      // memory (measured: late-suite queries 4-5x their standalone
      // medians). One periodic GC per minute bounds that drift.
      .config("spark.cleaner.periodicGC.interval", "1min")
      // Partition discovery: above this many paths Spark launches a
      // DISTRIBUTED listing job (~100 ms scheduling floor) instead of
      // listing on the driver. The engine's snapshot/bucket roots
      // routinely assemble 80–200 pinned leaf paths per read, and on a
      // local (or any low-latency) filesystem the driver lists those in
      // microseconds per path — probe-measured 5–16 listing JOBS per
      // lake query, 0.7–2.1 s each query, pure scheduling overhead
      // (guide §6 "file listing"). Parameterized: object-store
      // deployments whose per-path LIST RPC is tens of ms should set
      // SPARK_GRAFT_LIST_JOB_THRESHOLD back down (e.g. 32–64) so
      // thousands-of-partitions reads fan the RPCs out to executors;
      // the default keeps O(100)-path reads on the driver.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_JOB_THRESHOLD", "512"))
      .config("spark.ui.enabled", "false")

  /** Silence two benign but PROLIFIC warning sources that flood stderr
    * during a full Bench/Verify run and push the one-line JSON summary
    * out of any bounded log tail a harness might read:
    *  - `WindowExec: No Partition Defined` — every partition-less
    *    window in the suite is over a provably bounded table (the
    *    two-phase offset/decile/calendar pattern; see the bound notes
    *    at each site), so the warning is expected and repeats hundreds
    *    of times;
    *  - `rdd.*: RDD was locally checkpointed` — emitted once per
    *    unpersist of an eagerly-checkpointed frame (the Bench
    *    inter-query block cleanup does this ~40× per query).
    * Errors still surface; only these WARN loggers drop to ERROR.
    */
  def quietKnownWarnings(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
  }
}
