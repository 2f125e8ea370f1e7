package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage — fuzzy-match keys BETWEEN two tables without
  * the cross join: both sides derive a cheap deterministic blocking key
  * (suffix, phonetic code, min-q-gram …), candidates are the equi-join
  * on the block, and only candidates pay the edit-similarity verify.
  * The classic entity-resolution shape (complement of the SELF-join
  * variants: q20 Levenshtein + pruning rule, q21 greedy standardizer).
  *
  * Blocking is the documented recall trade: pairs whose blocks differ
  * are never compared (pick the blocker so corruption leaves it
  * stable). Cost is sum over blocks of |L_b|·|R_b| — at scale, a skewed
  * block is salted exactly like [[ScaleJoins.saltedJoin]]; similarity
  * is the codegen'd [[graft.functions.JaroWinkler]] with
  * DuckDB-pinned semantics, so the whole operator is oracle-checkable.
  */
object FuzzyLink {

  /** @param block  derivation of the blocking key from the key column
    *               (applied to BOTH sides)
    * @return (left_key, right_key, jw) for candidate pairs with
    *         jw >= threshold
    */
  def blockedJaroWinkler(left: DataFrame, right: DataFrame,
                         leftCol: String, rightCol: String,
                         block: Column => Column,
                         threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(left.sparkSession)
    val l = left.select(col(leftCol).as("left_key")).distinct()
      .withColumn("blk", block(col("left_key")))
    val r = right.select(col(rightCol).as("right_key")).distinct()
      .withColumn("blk", block(col("right_key")))
    l.join(r, "blk")
      .withColumn("jw", graft.core.Exact.r6(
        graft.functions.JaroWinkler.jaroWinkler(col("left_key"), col("right_key"))))
      .filter(col("jw") >= threshold)
      .select(col("left_key"), col("right_key"), col("jw"))
  }
}
