package graft.core

import org.apache.spark.sql.SparkSession

/** Job labelling at the engine's eager choke points (guide §1.5: label
  * your jobs). Every fixture/maintenance action the io/pipeline layers
  * run — versioned writes, sidecar derivations, checkpoints, GC
  * listings — sets a thread-local job description for its duration, so
  * the Spark UI (and the Probe listener) attribute wall time to the
  * operator that spent it instead of an anonymous thread-pool call
  * site. Descriptions nest: the previous value is restored on exit, so
  * a labelled composite (e.g. a compaction) keeps its own label around
  * the labelled primitives it calls unless they override it.
  */
object Jobs {
  def describe[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
