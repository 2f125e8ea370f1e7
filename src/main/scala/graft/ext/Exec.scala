package graft.ext

import org.apache.spark.sql.DataFrame

/** Execution-posture helpers shared across the engine's operators: the
  * eager-checkpoint contract for iterative/fan-out dataflows and the
  * parallelism floor for compute-heavy per-row stages.
  *
  * Both exist to make the SAME operator code correct in two regimes:
  * local[32] over small fixtures (where inputs arrive as one scan
  * partition and executor loss cannot happen) and a 1000-executor
  * cluster over ~100 TB (where a gratuitous shuffle is a full extra
  * pass over the corpus and executor loss is routine).
  */
object Exec {

  /** Spark conf key: when set to a filesystem path (HDFS/S3/local), all
    * eager checkpoints taken via [[checkpointEager]] go through Spark's
    * RELIABLE checkpoint mechanism (`sparkContext.setCheckpointDir` +
    * `Dataset.checkpoint`) instead of `localCheckpoint`.
    *
    * `localCheckpoint` truncates lineage into executor-LOCAL blocks: on
    * a real cluster, losing one executor mid-job makes the checkpointed
    * RDD unrecoverable (the Spark docs warn exactly this). It is the
    * right default for single-JVM local mode — no replication cost, no
    * distributed filesystem needed — but a cluster deployment sets this
    * key once and every iterative operator (connected components,
    * PageRank, label propagation, the eager ext results) becomes
    * fault-tolerant with no code change.
    */
  val CheckpointDirKey = "graft.checkpoint.dir"

  /** Eagerly materialize `df` and truncate its lineage — the contract
    * every iterative operator relies on to keep per-step plans O(1)
    * instead of O(steps). Local blocks by default; reliable checkpoint
    * files when [[CheckpointDirKey]] is set (first caller to see the
    * key installs the directory on the SparkContext; changing it
    * afterwards requires a new context).
    */
  def checkpointEager(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // label carries the first non-Exec graft call site so a probe/UI
    // job listing attributes each checkpoint to its operator
    val site = Thread.currentThread.getStackTrace.iterator
      .map(_.toString)
      .find(s => s.startsWith("graft.") && !s.contains(".Exec") &&
        !s.contains("core.Jobs"))
      .map(_.takeWhile(_ != '(')).getOrElse("?")
    graft.core.Jobs.describe(spark, s"exec.checkpointEager $site") {
      spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          df.checkpoint(eager = true)
        case None =>
          df.localCheckpoint(eager = true)
      }
    }
  }

  /** Chained form: `df.filter(...).checkpointEager()`. */
  implicit class EagerDf(private val df: DataFrame) extends AnyVal {
    def checkpointEager(): DataFrame = Exec.checkpointEager(df)
  }

  /** Raise `df` to the session's default parallelism ONLY when its scan
    * parallelism is deficient. Local-mode fixture files often arrive as
    * one parquet row group = ONE partition, which would serialize every
    * compute-heavy per-row expression and quadratic pair stage
    * downstream; the one small shuffle is noise next to the work it
    * parallelizes. On a real cluster with splittable inputs the
    * partition count already meets the target, and this returns `df`
    * UNCHANGED — an unconditional `repartition(n)` would insert a full
    * round-robin Exchange even then, i.e. one gratuitous extra pass
    * over the raw corpus at the head of every dedup/similarity/ANN
    * operator.
    *
    * Call this on shuffle-free projections of source tables only: the
    * partition probe resolves from file splits without running jobs
    * there; probing a post-shuffle plan under AQE could force stage
    * execution.
    */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
