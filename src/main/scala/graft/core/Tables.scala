package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic star-schema tables (see TESTDATA.md).
  *
  * All loaders are plain `spark.read.parquet` so Catalyst's column pruning
  * and filter pushdown reach the scan (`PushedFilters` / `ReadSchema` in
  * `.explain`). At 100 TB these files become partitioned directories; the
  * loaders are the single seam where partition-pruning predicates would be
  * injected.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * We read nanos as long (legacy conf, set defensively here in case the
    * session was built elsewhere) and truncate to microseconds —
    * the same truncation DuckDB applies on `CAST(ts_ns AS TIMESTAMP)`,
    * so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
