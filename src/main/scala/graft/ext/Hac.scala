package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Agglomerative clustering over a SMALL item table — the dendrogram
  * head for group-level structure (merging label/source centroids into
  * a hierarchy: "which slices are really one slice"). Weighted-centroid
  * linkage: each round joins the closest pair by cosine distance and
  * replaces it with the size-weighted integer-mean centroid.
  *
  * Exact integer state end-to-end (micro centroids, micro distances,
  * one shared round-of-double per merged component), every round's
  * argmin a total order (dist asc, id_a, id_b) — so the oracle unrolls
  * the same rounds bit-for-bit.
  *
  * Scale note: the item table is GROUPS-sized by contract (labels,
  * sources, clusters) — every round runs on ≤ items² local rows; the
  * corpus-sized work is producing the centroids upstream (one linear
  * pass, see [[Similarity.groupCentroidCosines]]).
  */
object Hac {

  /** @param items (id: long, cent: array<long> micro, size: long)
    * @return merge log (rnd, cid_a, cid_b, dist_micro, new_size)
    */
  def mergeLog(spark: SparkSession, items: DataFrame, rounds: Int): DataFrame = {
    var state = IvfIndex.materializeLocal(spark,
      items.select(col("id"), col("cent"), col("size")))
    var logs = Seq.empty[DataFrame]
    for (r <- 1 to rounds) {
      val a = state.select(col("id").as("id_a"), col("cent").as("ca"),
        col("size").as("sa"))
      val b = state.select(col("id").as("id_b"), col("cent").as("cb"),
        col("size").as("sb"))
      val pairs = a.join(b, col("id_a") < col("id_b"))
        .withColumn("dist_micro", lit(1000000L) -
          round(Similarity.cosine(col("ca").cast("array<double>"),
            col("cb").cast("array<double>")) * 1000000, 0).cast("long"))
      val best = IvfIndex.materializeLocal(spark,
        pairs.orderBy(col("dist_micro").asc, col("id_a").asc, col("id_b").asc)
          .limit(1))
      logs = logs :+ best.select(lit(r.toLong).as("rnd"),
        col("id_a").as("cid_a"), col("id_b").as("cid_b"), col("dist_micro"),
        (col("sa") + col("sb")).as("new_size"))
      val merged = best.select(col("id_a").as("id"),
        zip_with(col("ca"), col("cb"), (x, y) =>
          round((col("sa") * x + col("sb") * y).cast("double")
            / (col("sa") + col("sb")).cast("double"), 0).cast("long")).as("cent"),
        (col("sa") + col("sb")).as("size"))
      state = IvfIndex.materializeLocal(spark,
        state.join(broadcast(best.select(col("id_a"), col("id_b"))),
            col("id") === col("id_a") || col("id") === col("id_b"), "left_anti")
          .unionByName(merged))
    }
    logs.reduce(_ unionByName _)
  }

  /** Label centroids of an embedding column in the [[Hac]] item shape
    * (exact micro-int means — the q250 discipline).
    */
  def labelCentroidItems(df: DataFrame, labelCol: String,
                         embCol: String): DataFrame = {
    val dims = df
      .select(col(labelCol).cast("long").as("id"),
        posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("id"), col("pos"))
      .agg(sum(round(col("x").cast("double") * 1000000, 0).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("c", round(col("s").cast("double") / col("n"), 0).cast("long"))
    dims.groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cent"),
        min(col("n")).as("size"))
  }
}
