package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store sink/source (S6/S7) in offline-parity form: the
  * reference pushes tibbles to MongoDB collections
  * (R/export.R:401-413, R/validation.R:1298-1318) and pulls the
  * manual-validation flags back. With no connector in this environment,
  * collections are JSON-lines directories — the same document model,
  * swap `format("json")` for `format("mongodb")` on a real deployment.
  */
object DocumentSink {

  def push(df: DataFrame, baseDir: String, collection: String): Unit =
    df.write.mode("overwrite").json(s"$baseDir/$collection")

  def pull(spark: SparkSession, baseDir: String, collection: String): DataFrame =
    spark.read.json(s"$baseDir/$collection")

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
