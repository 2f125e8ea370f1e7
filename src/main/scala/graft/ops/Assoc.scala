package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basket association rules — the support/confidence/lift layer over
  * plain co-occurrence counting (q175's top-k co-purchase is the count
  * half; rules rank by LIFT, which corrects for item popularity and is
  * what recommendation/affinity analyses actually sort by).
  *
  * Shape: one distinct (basket, item) projection, one self-join on the
  * basket key for directed pair counts, then all ratio math on the
  * pair table. `minItem`/`minPair` are the scale levers (they bound
  * the self-join fan-out exactly like the dedup screens' df-caps); a
  * hot basket at 100× would additionally cap basket size upstream.
  * Ratios are shared double shapes over exact 64-bit counts.
  */
object Assoc {

  /** @return top-`k` rules (ante, cons, n_ante, n_cons, n_both,
    *         conf_milli, lift_micro) by lift desc
    */
  def rulesTopK(baskets: DataFrame, basketCol: String, itemCol: String,
                k: Int, minItem: Long = 5L, minPair: Long = 3L): DataFrame = {
    val bi = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = bi.agg(countDistinct(col("bk")).as("n_baskets"))
    val item = bi.groupBy(col("it")).agg(count(lit(1)).as("n_it"))
      .filter(col("n_it") >= minItem)
    val a = bi.join(item.select(col("it").as("ante"), col("n_it").as("n_ante")),
      col("it") === col("ante")).select(col("bk"), col("ante"), col("n_ante"))
    val b = bi.join(item.select(col("it").as("cons"), col("n_it").as("n_cons")),
      col("it") === col("cons")).select(col("bk"), col("cons"), col("n_cons"))
    a.join(b, Seq("bk"))
      .filter(col("ante") =!= col("cons"))
      .groupBy(col("ante"), col("cons"), col("n_ante"), col("n_cons"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPair)
      .crossJoin(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("n_ante"), col("n_cons"),
        col("n_both"),
        round((col("n_both") * 1000L).cast("double")
          / col("n_ante").cast("double"), 0).cast("long").as("conf_milli"),
        round((col("n_both") * col("n_baskets")).cast("double") * 1000000.0
          / (col("n_ante") * col("n_cons")).cast("double"), 0)
          .cast("long").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("ante").asc, col("cons").asc)
      .limit(k)
  }
}
