package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Isolation-forest-style density outlier scoring with HASH-built
  * trees: every tree is a depth-`depth` axis-aligned partition of the
  * feature box whose (feature, split) choices are pure integer hashes
  * of (tree, node) — no sampling, no training state, so the forest is
  * a deterministic function both engines replay exactly (the rand()-
  * free discipline of [[CorpusOps.hashSplit]]). A point's outlier
  * score is its mean leaf occupancy across trees: sparse leaves ≈
  * isolated points — the density reading of the isolation idea, exact
  * and integer-only (splits are integer micro positions inside the
  * global min/max box; no doubles anywhere until the final ratio).
  *
  * Scale shape: one min/max aggregation over the data, a broadcast
  * (trees × nodes) table, `depth` per-row joins on that table, one
  * (tree, leaf) count aggregation, one join back. Row volume is
  * points × trees — the fan-out is by the FOREST size, never points².
  */
object HashForest {

  /** @param features micro-int feature column names (bounded, ≤ 8)
    * @return (id, density_milli, rnk) the `k` lowest-density points
    */
  def outliers(df: DataFrame, idCol: String, features: Seq[String],
               trees: Int = 8, depth: Int = 4, k: Int = 20): DataFrame = {
    require(features.nonEmpty && features.size <= 8, "1..8 features")
    require(trees >= 1 && trees <= 64 && depth >= 1 && depth <= 8,
      "forest shape out of range")
    val spark = df.sparkSession
    import spark.implicits._
    val nf = features.size

    val pts = df.select(col(idCol).as("id") +:
      features.zipWithIndex.map { case (f, i) => col(f).cast("long").as(s"x$i") }: _*)
      .persist()
    try {
    val boxAggs = features.indices.flatMap(i => Seq(
      min(col(s"x$i")).as(s"lo$i"), max(col(s"x$i")).as(s"hi$i")))
    val box = pts.agg(boxAggs.head, boxAggs.tail: _*)

    // hash-chosen (feature, split-fraction) per (tree, level, node):
    // node ids are the per-level breadth index 0..2^level−1
    val nodes = (0 until trees).flatMap { t =>
      (0 until depth).flatMap { lvl =>
        (0 until (1 << lvl)).map { idx =>
          val f = ((t * 31 + lvl * 7 + idx * 17) % nf + nf) % nf
          val frac = ((t * 1103515245L + lvl * 12345L + idx * 7919L + 7L)
            % 1000L + 1000L) % 1000L
          (t.toLong, lvl.toLong, idx.toLong, f.toLong, frac)
        }
      }
    }.toDF("tree", "lvl", "idx", "f", "frac")

    val seeded = pts.crossJoin(broadcast(box))
      .crossJoin(broadcast(nodes.select(col("tree")).distinct()))
      .withColumn("idx", lit(0L))
    val walked = (0 until depth).foldLeft(seeded) { (cur, lvl) =>
      val lvlNodes = nodes.filter(col("lvl") === lvl)
        .select(col("tree"), col("idx"), col("f"), col("frac"))
      val joined = cur.join(broadcast(lvlNodes), Seq("tree", "idx"))
      // split position: lo_f + frac·(hi_f − lo_f) / 1000, exact integers
      def pick(prefix: String) =
        features.indices.drop(1).foldLeft(
          when(col("f") === 0, col(s"${prefix}0"))) {
          (acc, i) => acc.when(col("f") === i, col(s"$prefix$i"))
        }
      val xF = pick("x")
      val loF = pick("lo")
      joined
        .withColumn("split",
          loF + expr("frac * (" +
            features.indices.map(i =>
              s"CASE WHEN f = $i THEN hi$i - lo$i ELSE 0 END").mkString(" + ") +
            ") div 1000"))
        .withColumn("idx",
          col("idx") * 2 + when(xF > col("split"), 1L).otherwise(0L))
        .drop("f", "frac", "split")
    }
    val leaves = walked.select(col("id"), col("tree"), col("idx").as("leaf"))
    val occupancy = leaves.groupBy(col("tree"), col("leaf"))
      .agg(count(lit(1)).as("n_leaf"))
    val density = leaves.join(occupancy, Seq("tree", "leaf"))
      .groupBy(col("id"))
      .agg(round(sum(col("n_leaf")).cast("double") * 1000.0
        / lit(trees.toDouble), 0).cast("long").as("density_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("density_milli").asc, col("id").asc)
    // bounded global window: only the k head survives the filter, and
    // the candidate set entering the rank is the full point set — use
    // TakeOrdered semantics via orderBy+limit instead of a rank window
    density.orderBy(col("density_milli").asc, col("id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("id"), col("density_milli"), col("rnk"))
      .checkpointEager()
    } finally pts.unpersist(false)
  }
}
