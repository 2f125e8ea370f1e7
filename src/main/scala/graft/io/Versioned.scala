package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet staging — the reference's GCS object versioning
  * (`add_version`, reference R/utils.R:30-52: objects named
  * `prefix__<timestamp>_<sha>__.parquet`, stages always read the newest
  * matching object, R/preprocessing-surveys.R:69-73).
  *
  * Re-expressed for a distributed store: each write lands in a
  * `prefix__<versionTag>__.parquet` directory; `resolveLatest` lists the
  * prefix (a driver-side metadata operation, O(versions)) and reads the
  * lexicographically newest tag — timestamps are zero-padded so
  * lexicographic == chronological. On object stores the same naming
  * works over a bucket listing.
  */
object Versioned {

  def versionTag(sha: String = "local"): String =
    f"${System.currentTimeMillis()}%020d_$sha"

  def write(df: DataFrame, dir: String, prefix: String, tag: String): String = {
    val path = s"$dir/${prefix}__${tag}__.parquet"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** lz4-compressed variant (S5: arrow::write_parquet(compression="lz4"),
    * reference R/api.R:133-138).
    */
  def writeLz4(df: DataFrame, dir: String, prefix: String, tag: String): String = {
    val path = s"$dir/${prefix}__${tag}__.parquet"
    df.write.mode("overwrite").option("compression", "lz4_raw").parquet(path)
    path
  }

  def resolveLatest(dir: String, prefix: String): Option[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName)
      .filter(n => n.startsWith(s"${prefix}__") && n.endsWith("__.parquet"))
      .sorted(Ordering[String].reverse)
      .headOption
      .map(n => s"$dir/$n")
  }

  def readLatest(spark: SparkSession, dir: String, prefix: String): DataFrame =
    spark.read.parquet(resolveLatest(dir, prefix).getOrElse(
      throw new IllegalArgumentException(s"no versioned object for prefix '$prefix' in $dir")))

  /** S13 — local fallback source: try the primary loader, fall back to a
    * bundled fixture (packaged lw_coeffs snapshot,
    * R/preprocessing-surveys.R:1221-1236).
    */
  def withFallback(primary: => DataFrame, fallback: => DataFrame): DataFrame =
    scala.util.Try(primary).getOrElse(fallback)
}
