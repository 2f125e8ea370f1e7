package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store sink/source (S6/S7): the reference pushes tibbles to
  * MongoDB collections (R/export.R:401-413, R/validation.R:1298-1318)
  * and pulls the manual-validation flags back. The seam is the FORMAT
  * STRING: `pushTo`/`pullFrom` take any DataSource name + options, so a
  * deployment passes `"mongodb"` with connection options while this
  * zero-egress environment exercises the identical code path through
  * [[MemDocStore]] (a real V2 connector) and JSON-lines directories —
  * the swap is asserted in MemDocStoreSpec, not just claimed.
  */
object DocumentSink {

  /** Overwrite `collection` through an arbitrary connector. */
  def pushTo(df: DataFrame, format: String, options: Map[String, String]): Unit =
    df.write.format(format).options(options).mode("overwrite").save()

  def pullFrom(spark: SparkSession, format: String, options: Map[String, String]): DataFrame =
    spark.read.format(format).options(options).load()

  /** JSON-lines convenience (offline parity with a directory-per-
    * collection document model).
    */
  def push(df: DataFrame, baseDir: String, collection: String): Unit =
    pushTo(df, "json", Map("path" -> s"$baseDir/$collection"))

  def pull(spark: SparkSession, baseDir: String, collection: String): DataFrame =
    pullFrom(spark, "json", Map("path" -> s"$baseDir/$collection"))

  /** S9 — upsert diff: split incoming rows into creates (left_anti on the
    * key vs existing) and updates (left_semi), the reference's
    * device_sync diff (R/airtable.R:324-420). The batched HTTP PATCH/POST
    * loop is the caller's transport concern; this is the dataflow half.
    */
  def upsertDiff(incoming: DataFrame, existing: DataFrame,
                 key: String): (DataFrame, DataFrame) = {
    val creates = incoming.join(existing.select(key), Seq(key), "left_anti")
    val updates = incoming.join(existing.select(key), Seq(key), "left_semi")
    (creates, updates)
  }

  /** S8 — multi-valued REST fields collapsed to a comma string
    * (airtable_to_df, R/airtable.R:74-77).
    */
  def collapseListColumn(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, array_join(col(c), ", "))
}
