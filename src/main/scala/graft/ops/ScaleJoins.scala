package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB posture, packaged as library
  * operators:
  *
  *  - **Bucketed co-located join**: both fact tables written bucketed +
  *    sorted on the join key; the join then runs with ZERO shuffle
  *    exchanges (sort-merge over pre-bucketed files). This is the
  *    repeated-join amortization story: pay one layout write, join for
  *    free forever after (the reference re-reads the same staged
  *    parquet every 2 days — bucketing those stage outputs makes every
  *    downstream join co-located).
  *
  *  - **Salted skew join**: a hot key would put its entire row set in
  *    one task; salting splits the big side into `salts` subkeys and
  *    replicates the small side once per salt. AQE's skew-join split
  *    covers sort-merge joins at runtime; explicit salting remains the
  *    tool for deterministic layout control and for aggregations.
  */
object ScaleJoins {

  /** The in-memory catalog forgets tables across JVMs while their
    * warehouse directories persist — a fresh session's CREATE then hits
    * LOCATION_ALREADY_EXISTS. Reset both halves.
    */
  private def resetTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == null) wh.toString else wh.getPath, name.toLowerCase)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    if (dir.exists()) rm(dir)
  }

  /** Write both sides bucketed+sorted on `key` into the session catalog
    * and return the co-located join (no Exchange in the plan).
    */
  def bucketedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
                   key: String, buckets: Int,
                   leftName: String, rightName: String): DataFrame = {
    resetTable(spark, leftName)
    resetTable(spark, rightName)
    left.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(leftName)
    right.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), Seq(key))
  }

  /** Salted equi-join of a skewed big side against a small side.
    * The big side gets a pseudo-random salt in [0, salts); the small
    * side is replicated once per salt value; the join key becomes
    * (key, salt). For inner and left joins the result is identical to
    * the unsalted join — the salt only redistributes work.
    *
    * Right/full outer joins are rejected: an unmatched small-side row
    * is replicated across all `salts` subkeys, so each replica would
    * surface as its own null-padded output row (`salts` duplicates).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter", "left_outer")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only (got '$joinType'): " +
        "outer small-side rows would be duplicated once per salt")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Range (interval-proximity) join with NO equi key, as an equi-join:
    * count for each anchor row the point rows whose time falls in
    * `[t - before, t + after)` — epoch seconds, half-open on the right.
    *
    * The naive plan for a pure range predicate is a broadcast
    * nested-loop (O(|A|·|P|) comparisons — dead at scale). Instead the
    * time axis is discretized into `binSec` bins: each point lands in
    * exactly one bin (`t div binSec`), each anchor explodes into the
    * few bins its window overlaps, and the join becomes a plain
    * shuffled EQUI-join on the bin id followed by the exact range
    * filter — lossless (a qualifying pair always shares a covered bin;
    * a point is in one bin so no dedup is needed) and linear in
    * |A|·(window/binSec) + |P|. Partial aggregation runs map-side, so
    * pair rows never hit the shuffle — only per-anchor partial counts.
    *
    * Pick `binSec` ≈ the window width: smaller bins replicate anchors,
    * larger bins inflate the per-bin candidate set. A pathologically
    * hot bin (a time spike) can additionally be salted — counts are
    * algebraic, so salting composes (sum of partials).
    *
    * Anchors with zero neighbors are NOT emitted (inner join); callers
    * needing zeros left-join the result back.
    *
    * @param anchors (idCol, tCol) — tCol in epoch seconds (long)
    * @param points  (tCol) — epoch seconds; any other columns ignored
    */
  def rangeCountByBins(anchors: DataFrame, points: DataFrame,
                       idCol: String, tCol: String,
                       before: Long, after: Long, binSec: Long): DataFrame = {
    require(binSec > 0 && before >= 0 && after > 0, "window must be non-empty")
    val a = anchors.select(col(idCol), col(tCol).as("__at"),
      explode(sequence(
        floor((col(tCol) - before) / binSec).cast("long"),
        floor((col(tCol) + after - 1) / binSec).cast("long"))).as("__bin"))
    val p = points.select(col(tCol).as("__pt"),
      floor(col(tCol) / binSec).cast("long").as("__bin"))
    a.join(p, "__bin")
      .filter(col("__pt") >= col("__at") - before && col("__pt") < col("__at") + after)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_nearby"))
  }

  /** EXACT self-join output cardinality per key bucket WITHOUT running
    * the join — the planner-style diagnostic every shuffle-join
    * decision wants: `|A ⋈_k A|` restricted to a bucket is exactly
    * `Σ_{k ∈ bucket} cnt(k)²`, a per-key count aggregation (one
    * map-side-combined shuffle over keys, never the pair blowup). The
    * q355 oracle computes the ACTUAL join count per bucket — equality
    * proves the estimator exact, and the `max_key_rows` column is the
    * skew headline (the hottest key's share of the bucket's pairs is
    * max² / est_pairs).
    *
    * @return (bucket, n_keys, n_rows, est_pairs, max_key_rows)
    */
  def selfJoinSizeProfile(df: DataFrame, keyCol: String,
                          nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "bucket count must be positive")
    val cnts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bucket", pmod(col("k"), lit(nBuckets.toLong)).cast("long"))
    cnts.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        sum(col("c") * col("c")).as("est_pairs"),
        max(col("c")).as("max_key_rows"))
  }
}
