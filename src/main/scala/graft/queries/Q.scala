package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One conformance query: a Spark dataflow plus (when SQL-expressible) an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Conventions that keep the hash compare stable:
  *  - every output column is explicitly aliased, lower_snake_case, and the
  *    oracle uses the identical alias;
  *  - every query ends in a total deterministic ORDER BY;
  *  - money sums use exact integer cents ([[graft.core.Exact]]), counts and
  *    ranks are 64-bit, interpolated/transcendental values are rounded.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
