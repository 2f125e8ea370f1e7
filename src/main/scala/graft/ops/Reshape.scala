package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators (SURVEY.md §2.8) — the reference's signature
  * workload (pivot_longer/pivot_wider/complete/separate,
  * R/survey-reshaping.R, R/export.R:189-198).
  *
  * All are expressed on built-in generators/aggregates so they stay
  * inside whole-stage codegen: `stack` for unpivot (a Generate node, no
  * shuffle), `groupBy().pivot()` for widening (one shuffle), and a
  * sequence-explode cross join for the month scaffold (the sequence side
  * is O(months) rows — broadcast, never shuffled).
  */
object Reshape {

  /** pivot_longer: wide value columns → (var, value) rows. Value columns
    * must share a common type (cast first if not).
    */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              varName: String = "metric", valueName: String = "value"): DataFrame = {
    val stackArgs = valueCols.map(c => s"'$c', `$c`").mkString(", ")
    df.selectExpr(idCols.map(c => s"`$c`") :+
      s"stack(${valueCols.size}, $stackArgs) as (`$varName`, `$valueName`)": _*)
  }

  /** tidyr::complete for a month grid (R/export.R:189-198): scaffold =
    * distinct keys × calendar-month sequence spanning [mn, mx] (a one-row
    * bounds DataFrame with DateType `mn`/`mx`), left-joined back so
    * missing combinations surface as null rows. No driver collect: the
    * bounds row stays a DataFrame and the cross join broadcasts it.
    */
  def completeMonths(agg: DataFrame, keyCols: Seq[String], monthCol: String,
                     bounds: DataFrame): DataFrame = {
    val months = bounds.select(
      explode(sequence(col("mn"), col("mx"), expr("interval 1 month"))).as(monthCol))
    val keys = agg.select(keyCols.map(col): _*).distinct()
    keys.crossJoin(broadcast(months))
      .join(agg, keyCols :+ monthCol, "left")
  }

  /** tidyr::separate with a fixed delimiter: returns the i-th piece
    * (0-based); missing pieces → null (too_few = "align_start"; `get`
    * rather than `getItem` because the latter throws under ANSI mode).
    */
  def separatePiece(c: Column, sep: String, i: Int): Column =
    get(split(c, sep), lit(i))

  /** tidyr::separate_rows: one row per delimited element. */
  def separateRows(df: DataFrame, colName: String, sepRegex: String,
                   outName: String): DataFrame =
    df.withColumn(outName, explode(split(col(colName), sepRegex)))

  /** janitor::clean_names (reference R/merge-trips.R:40): lower
    * snake_case column names (camelCase boundaries split, collisions
    * uniquified with _2-style suffixes) — one metadata-only Project via
    * toDF, no per-column rename passes.
    */
  def cleanNames(df: DataFrame): DataFrame = {
    val cleaned = df.columns.map { c =>
      c.trim
        .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
        .replaceAll("[^A-Za-z0-9]+", "_")
        .replaceAll("_+", "_").stripPrefix("_").stripSuffix("_").toLowerCase
    }
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val unique = cleaned.map { n =>
      val k = seen.getOrElse(n, 0) + 1
      seen(n) = k
      if (k == 1) n else s"${n}_$k"
    }
    df.toDF(unique.toIndexedSeq: _*)
  }
}
