package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Wide positional-name reshaping — the reference's RAW survey shape.
  *
  * Kobo exports encode repeat groups in column NAMES:
  * `species_group.K.species_group/field` (position K, field `field`),
  * length bins as `...species_group/no_fish_by_length_group/
  * no_individuals_A_B`. The reference reshapes by splitting names
  * (reference R/survey-reshaping.R:25-86: per-position column slices,
  * prefix strip at :57-59, `n_catch = pos + 1` at :62-63, bind_rows,
  * all-NA row filter at :73-80; same pattern with `/`-separated names
  * at R/preprocessing-surveys.R:482-617, name-split at :525-531).
  *
  * Spark-first: the positions are known at PLAN time from the schema, so
  * the reshape is a pure projection — per position K, a struct of that
  * position's columns (missing fields null-filled, as bind_rows does)
  * with `n_catch = K + 1` riding along — then ONE `posexplode`
  * (Generate). No shuffle, no union of N scans: one pass over the wide
  * rows inside whole-stage codegen, at any number of positions. The
  * all-NA group filter is a codegen'd OR over the struct fields.
  */
object WideReshape {

  private val PosCol = "^species_group\\.([0-9]+)\\.(.+)$".r

  /** `species_group.K.<rest>` columns → long rows (one per non-empty
    * position), `n_catch = K + 1`. Field names keep the reference's
    * post-strip form: the `species_group/` prefix is removed, deeper
    * path segments (e.g. `no_fish_by_length_group/no_individuals_5_10`)
    * are kept verbatim (survey-reshaping.R:83 removes only
    * `species_group/`).
    */
  def reshapeSpeciesGroups(df: DataFrame, idCol: String = "submission_id"): DataFrame = {
    val posCols: Seq[(Int, String, String)] = df.columns.toSeq.collect {
      case c @ PosCol(k, rest) => (k.toInt, rest.stripPrefix("species_group/"), c)
    }
    require(posCols.nonEmpty, "no species_group.K.* columns to reshape")
    val positions = posCols.map(_._1).distinct.sorted
    // first-seen field order (bind_rows semantics); missing fields in a
    // position null-fill with the type seen elsewhere
    val fields: Seq[String] = posCols.sortBy(_._1).map(_._2).distinct
    val typeOf = posCols.map { case (_, f, c) => f -> df.schema(c).dataType }.toMap
    val byPos = posCols.map { case (k, f, c) => (k, f) -> c }.toMap
    val groups = positions.map { k =>
      struct((lit(k + 1).cast("long").as("n_catch") +:
        fields.map { f =>
          byPos.get((k, f))
            .map(c => col(s"`$c`").as(f))
            .getOrElse(lit(null).cast(typeOf.getOrElse(f, StringType)).as(f))
        }): _*)
    }
    val anyDetail: Column => Column = g =>
      fields.map(f => g.getField(f).isNotNull).reduce(_ || _)
    df.select(col(idCol), explode(array(groups: _*)).as("g"))
      .filter(anyDetail(col("g")))
      .select(col(idCol) +: col("g.n_catch") +: fields.map(f => col(s"g.`$f`").as(f)): _*)
  }
}
