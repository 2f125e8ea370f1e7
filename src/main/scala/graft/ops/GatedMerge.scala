package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gated 1:1 full merge — the reference's `merge_trips()` semantics
  * (`R/merge-trips.R:44-73`): rows join full-outer on `keys` ONLY for key
  * groups that have exactly one row on each side independently; ambiguous
  * keys (duplicates on either side) pass through unjoined, columns from
  * the other side null.
  *
  * Spark-first execution: a per-side keyed count AGGREGATION joined back
  * on the keys (NOT a `count(*) over (partition by keys)` window: the
  * window form buffers each key's whole row group in one task, so a hot
  * key with 20% of the table becomes a straggler/OOM — the aggregation
  * partial-combines map-side and the join back streams, and AQE's
  * skew-join split can further divide the hot key's probe rows; SkewSpec
  * certifies this on a 60%-hot fixture), a split by the `n == 1` gate, a
  * full-outer join of the unique halves (hash join, same key partitioning
  * reused), and a `unionByName(allowMissingColumns = true)` of the
  * ambiguous remainders — no driver materialization, scales linearly in
  * both inputs. The reference instead splits the tibble in memory
  * (`split(.$unique_trip_per_day)`).
  */
object GatedMerge {
  def gatedOneToOne(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    def withCount(df: DataFrame) = df.join(
      df.groupBy(keyCols: _*).agg(count(lit(1)).as("__n")), keys)
    val lc = withCount(left)
    val rc = withCount(right)
    val lUniq = lc.filter(col("__n") === 1).drop("__n")
    val lDup = lc.filter(col("__n") > 1).drop("__n")
    val rUniq = rc.filter(col("__n") === 1).drop("__n")
    val rDup = rc.filter(col("__n") > 1).drop("__n")
    lUniq.join(rUniq, keys, "full")
      .unionByName(lDup, allowMissingColumns = true)
      .unionByName(rDup, allowMissingColumns = true)
  }
}
