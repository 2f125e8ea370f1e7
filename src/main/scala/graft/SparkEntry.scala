package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into packs, one per operator family of
  * SURVEY.md §2; each pack pairs the Spark dataflow with its DuckDB
  * oracle SQL (where SQL-expressible).
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    AggQueries,
    JoinQueries,
    FilterQueries,
    ReshapeQueries,
    ScalarQueries,
    ExtQueries,
    IoQueries)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * The §7.2 minimum slice: per-trip rollup → robust per-group medians →
    * deterministic ordering (monthly median CPUE by district, re-expressed
    * on the synthetic star schema).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (probabilistic LSH candidates, greedy fixpoints on general inputs).
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
