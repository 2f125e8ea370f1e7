package graft.core

/** Per-JVM scratch space for queries that stage intermediate files
  * (versioned writes, CSV/parquet round-trips, partitioned layouts).
  *
  * One temp ROOT per JVM, removed by a shutdown hook; each named query
  * gets a FIXED subdirectory under it, so repeated Bench/Verify
  * invocations in the same process overwrite one copy (every caller
  * writes with `mode("overwrite")`) instead of leaking a fresh
  * gzip'd/parquet copy of its tables per run. Concurrent processes
  * stay isolated because the root itself is process-unique.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p
  }

  /** Depth-first delete — also the rerun-hygiene tool for fixtures
    * whose cycle PUBLISHES new object versions (a later rep's
    * `readLatest` would resolve the prior rep's output as fixture
    * state; wiping the prefix restores a deterministic start).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** Stable scratch directory for `name` within this JVM. */
  def dir(name: String): String = {
    val p = root.resolve(name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
