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

  /** Snapshot diff between two versions of a keyed table — the audit a
    * versioned store runs between [[write]]s: which keys were added,
    * removed, or changed. One full-outer equi-join on the key plus
    * null-safe column compares; unchanged keys are filtered out, so the
    * output is O(churn), not O(table). At scale both sides would be
    * bucketed on the key and the join exchange-free — the operator is a
    * single shuffle either way.
    *
    * Both frames must share a schema; keys are assumed non-null (they
    * identify rows). Returns `keyCols :+ change` with
    * `change ∈ {added, removed, changed}`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"schema mismatch: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valueCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    def side(df: DataFrame, suffix: String) =
      valueCols.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffix))
        .withColumn(s"__present$suffix", lit(true))
    val joined = side(oldDf, "__old")
      .join(side(newDf, "__new"), keyCols, "full_outer")
    val anyChanged = valueCols
      .map(c => !(col(c + "__old") <=> col(c + "__new")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change",
        when(col("__present__old").isNull, "added")
          .when(col("__present__new").isNull, "removed")
          .when(anyChanged, "changed"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** [[snapshotDiff]] with payload: changed/added rows carry the NEW
    * value columns (removed rows carry nulls) — the O(churn) artifact a
    * versioned store ships downstream instead of the full snapshot.
    * Inverse is [[applyPatch]].
    */
  def snapshotPatch(oldDf: DataFrame, newDf: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val valueCols = newDf.columns.filterNot(keyCols.contains).toSeq
    snapshotDiff(oldDf, newDf, keyCols)
      .join(newDf, keyCols, "left")
      .select(keyCols.map(col) ++ (col("change") +: valueCols.map(col)): _*)
  }

  /** Replay a [[snapshotPatch]] onto the old snapshot: drop removed and
    * changed keys, append the patch's added/changed payloads. One
    * anti-join plus a union — `applyPatch(old, snapshotPatch(old, new))
    * == new` row-for-row (the q138 oracle checks exactly that).
    */
  def applyPatch(oldDf: DataFrame, patch: DataFrame,
                 keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val touched = patch.select(keyCols.map(col): _*)
    val incoming = patch.filter(col("change").isin("added", "changed"))
      .select(oldDf.columns.map(col): _*)
    oldDf.join(touched, keyCols, "left_anti").unionByName(incoming)
  }

  /** S13 — local fallback source: try the primary loader, fall back to a
    * bundled fixture (packaged lw_coeffs snapshot,
    * R/preprocessing-surveys.R:1221-1236).
    */
  def withFallback(primary: => DataFrame, fallback: => DataFrame): DataFrame =
    scala.util.Try(primary).getOrElse(fallback)
}
