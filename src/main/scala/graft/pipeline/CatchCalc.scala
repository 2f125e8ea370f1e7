package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-weight catch estimation — `calculate_catch_lurio` (reference
  * R/preprocessing-surveys.R:691-734) re-expressed as one broadcast
  * lookup join plus codegen'd expressions:
  *
  *   W_grams = a_6 · L^b_6           (general)
  *           = a_6 · (L/5.5)^b_6     (catch_taxon = "OCZ": octopus total
  *                                    length → mantle length)
  *   catch_length_kg = W_grams · individuals / 1000
  *   catch_bucket_kg = n_buckets · weight_bucket
  *   catch_kg        = coalesce(length-based, bucket-based)
  *
  * plus the taxon recodes TUN→TUS, SKH→CVX, CLP→ANX
  * (R/preprocessing-surveys.R:240-247). The coefficients table is
  * O(taxa) rows — always broadcast.
  */
object CatchCalc {

  def recodeTaxon(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "TUN", "TUS").when(c === "SKH", "CVX").when(c === "CLP", "ANX").otherwise(c)

  /** catches: (..., catch_taxon, length, individuals, n_buckets,
    * weight_bucket); lw: (catch_taxon, a_6, b_6).
    */
  def calculateCatch(catches: DataFrame, lw: DataFrame): DataFrame = {
    val L = when(col("catch_taxon") === "OCZ", col("length") / 5.5).otherwise(col("length"))
    catches
      .join(broadcast(lw), Seq("catch_taxon"), "left")
      .withColumn("catch_length_gr",
        when(col("length").isNotNull && col("a_6").isNotNull && col("b_6").isNotNull,
          col("a_6") * pow(L, col("b_6"))))
      .withColumn("catch_length_kg", col("catch_length_gr") * col("individuals") / 1000.0)
      .withColumn("catch_bucket_kg",
        when(col("n_buckets").isNotNull && col("weight_bucket").isNotNull,
          col("n_buckets") * col("weight_bucket")))
      .withColumn("catch_kg", coalesce(col("catch_length_kg"), col("catch_bucket_kg")))
      .drop("catch_length_gr")
  }
}
