package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Fuzzy name standardization — the reference's enumerator-name cleaning
  * (`standardize_enumerator_names`, `R/preprocessing-surveys.R:1291-1377`):
  * pairs of distinct names within a Levenshtein threshold are clustered
  * greedily and every member is rewritten to the cluster's canonical name.
  *
  * The greedy fixpoint is order-dependent and not expressible
  * relationally, so — like the reference — it runs on the *distinct* name
  * set. That set is tiny (enumerator count), so we collect it to the
  * driver (the one sanctioned driver collect in the engine: cardinality =
  * distinct names, not rows), compute the mapping, and broadcast-join it
  * back onto the full dataset. At 100 TB the distinct-collect is a single
  * shuffle over names and the re-application is a broadcast hash join —
  * no full-data movement.
  *
  * Determinism: candidates are processed by (frequency desc, name asc), so
  * the most frequent spelling wins its cluster; ties break
  * lexicographically.
  */
object NameStandardizer {
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    var prevDiag = 0
    for (i <- 1 to a.length) {
      prevDiag = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val t = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prevDiag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prevDiag = t
      }
    }
    dp(b.length)
  }

  /** Greedy canonical mapping over (name, frequency) pairs. */
  def canonicalMap(names: Seq[(String, Long)], maxDist: Int): Map[String, String] = {
    val ordered = names.sortBy { case (n, c) => (-c, n) }
    val assigned = mutable.HashMap.empty[String, String]
    for ((n, _) <- ordered if !assigned.contains(n)) {
      assigned(n) = n
      for ((m, _) <- ordered if !assigned.contains(m) && lev(n, m) <= maxDist)
        assigned(m) = n
    }
    assigned.toMap
  }

  /** Adds `<nameCol>_canonical` to `df` via the greedy mapping. */
  def standardize(spark: SparkSession, df: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    import spark.implicits._
    val counts = df.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol)).count()
      .as[(String, Long)].collect().toSeq // distinct names only — tiny
    val mapping = canonicalMap(counts, maxDist).toSeq.toDF(nameCol, s"${nameCol}_canonical")
    df.join(broadcast(mapping), Seq(nameCol), "left")
  }
}
