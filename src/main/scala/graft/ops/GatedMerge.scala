package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gated 1:1 full merge — the reference's `merge_trips()` semantics
  * (`R/merge-trips.R:44-73`): rows join full-outer on `keys` ONLY for key
  * groups that have exactly one row on each side independently; ambiguous
  * keys (duplicates on either side) pass through unjoined, columns from
  * the other side null.
  *
  * Spark-first execution: a count window per side (one shuffle each on the
  * join keys), a split by the `n == 1` gate, a full-outer join of the
  * unique halves (hash join, same key partitioning reused), and a
  * `unionByName(allowMissingColumns = true)` of the ambiguous remainders —
  * no driver materialization, scales linearly in both inputs. The
  * reference instead splits the tibble in memory
  * (`split(.$unique_trip_per_day)`).
  */
object GatedMerge {
  def gatedOneToOne(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val wl = Window.partitionBy(keyCols: _*)
    val lc = left.withColumn("__n", count(lit(1)).over(wl))
    val rc = right.withColumn("__n", count(lit(1)).over(wl))
    val lUniq = lc.filter(col("__n") === 1).drop("__n")
    val lDup = lc.filter(col("__n") > 1).drop("__n")
    val rUniq = rc.filter(col("__n") === 1).drop("__n")
    val rDup = rc.filter(col("__n") > 1).drop("__n")
    lUniq.join(rUniq, keys, "full")
      .unionByName(lDup, allowMissingColumns = true)
      .unionByName(rDup, allowMissingColumns = true)
  }
}
