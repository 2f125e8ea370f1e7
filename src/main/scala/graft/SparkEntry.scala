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
    MiningQueries,
    AnalyticsQueries,
    StatQueries,
    TemporalQueries,
    CurationQueries,
    EvalQueries,
    VectorQueries,
    ValuationQueries,
    StructureQueries,
    IoQueries)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    *
    * The SURVEY.md §7.2 minimum slice — "monthly median CPUE by
    * district" — composed from the pipeline modules over the synthetic
    * star schema: per-trip rollup with deterministic firsts (A1/A7) →
    * cpue/rpue/price ratios → monthly median per district (A3) →
    * month-grid complete (R9) → unpivot long (R4). Touches scan,
    * broadcast join, two shuffles (rollup + monthly agg), a scaffold
    * cross join, and a Generate — the engine's whole vertical in one
    * plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val o = graft.core.Tables.orders(spark, d)
    val li = graft.core.Tables.lineitem(spark, d)
    // trips ≙ orders; catch rows ≙ lineitems; district ≙ orderpriority
    val trips = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(o("o_orderkey").as("submission_id"))
      .agg(
        min_by(struct(o("o_orderdate"), o("o_orderpriority")), li("l_linenumber")).as("f"),
        sum(li("l_quantity")).as("catch_kg"),
        count(lit(1)).as("n_items"))
      .select(col("submission_id"),
        to_date(col("f.o_orderdate")).as("landing_date"),
        col("f.o_orderpriority").as("district"),
        (col("catch_kg") / col("n_items")).as("cpue"),
        col("catch_kg").as("rpue"),
        (col("catch_kg") * 2).as("price_kg"),
        col("n_items").cast("double").as("n_fishers"))
    graft.pipeline.Export.monthlyMetrics(trips)
  }

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
