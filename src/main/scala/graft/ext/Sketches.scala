package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, PolyHash}

/** Probabilistic sketch operators on ENGINE-PORTABLE integer hashing —
  * Bloom-filter membership screen, Count-Min frequency estimation, and
  * HyperLogLog registers. The usual objection to sketches in a
  * correctness-gated pipeline is that their internals are
  * engine-private; here every bit position, counter cell, and register
  * derives from [[PolyHash]] + the MinHash affine family
  * `h_i(x) = (a_i·x + b_i) mod P`, so an external SQL engine recomputes
  * the SKETCH ITSELF bit-for-bit (same design as the MinHash/SimHash/
  * LSH oracles, cf. q47/q48/q50).
  *
  * Scale shapes:
  *  - Bloom build is one linear pass → `<= m` distinct bit rows; the
  *    screen broadcasts the bit set (a few KB for any useful m) — an
  *    ingestion-time "seen before?" filter whose per-batch cost never
  *    touches the corpus again (cheaper companion to
  *    [[Dedup.simHashPairsAgainst]]).
  *  - Count-Min is one groupBy over (row, cell) — d·w counters total,
  *    map-side combine does almost all the work; lookups broadcast the
  *    tiny counter table.
  *  - HLL is one groupBy over `buckets` rows. All three avoid any
  *    per-key exact state, which is the point at 100 TB.
  */
object Sketches {
  private val P = 1000000007L
  private def hashA(i: Int): Long = 1103515245L * (i + 1) % P
  private def hashB(i: Int): Long = (12345L * (i + 1) + 7L) % P

  /** k affine-permuted positions in [0, m) from a MATERIALIZED base-hash
    * column (project `polyHash` first — the shinglesFromTokens lesson).
    * Products stay under P² < 2^63.
    */
  private[ext] def positionsFromHash(h: Column, k: Int, m: Int): Column =
    array((0 until k).map(i =>
      pmod(pmod(h * hashA(i) + hashB(i), lit(P)), lit(m)).cast("long")): _*)

  /** Bloom filter build: the DISTINCT set bit positions for `keyCol`
    * (k hashes per key, m bits). At most `m` rows regardless of corpus
    * size.
    */
  def bloomBits(corpus: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    require(m > 0 && k > 0, "m and k must be positive")
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    corpus
      .select(PolyHash.polyHash(col(keyCol).cast("string")).as("h"))
      .select(explode(positionsFromHash(col("h"), k, m)).as("bit"))
      .distinct()
  }

  /** Bloom membership screen: for each probe row, `might_contain` =
    * all k of its bit positions are set in the corpus filter. No false
    * negatives (guaranteed by construction — spec-pinned); false
    * positives at the usual `(1-e^{-kn/m})^k` rate. The filter side is
    * broadcast; the probe side is one linear pass.
    */
  def bloomScreen(corpus: DataFrame, probe: DataFrame, keyCol: String,
                  m: Int, k: Int): DataFrame = {
    val bits = bloomBits(corpus, keyCol, m, k)
    GraftFunctions.ensureRegistered(probe.sparkSession)
    // one verdict per DISTINCT probe key (duplicate probe rows would
    // multiply __hits past __n and flip the verdict to false)
    val pb = probe.select(col(keyCol)).distinct()
      .withColumn("__h", PolyHash.polyHash(col(keyCol).cast("string")))
      .withColumn("__bits", array_distinct(positionsFromHash(col("__h"), k, m)))
    // count how many of the probe's DISTINCT positions are set; equal to
    // the distinct-position count → every position is set
    val probeBits = pb.select(col(keyCol), size(col("__bits")).as("__n"),
      explode(col("__bits")).as("bit"))
    probeBits.join(broadcast(bits.withColumn("__set", lit(1))), Seq("bit"), "left")
      .groupBy(col(keyCol), col("__n"))
      .agg(sum(coalesce(col("__set"), lit(0))).as("__hits"))
      .select(col(keyCol), (col("__hits") === col("__n")).as("might_contain"))
  }

  /** Count-Min counter table: d rows × w cells of exact partial counts
    * for the values of `keyCol`. Cell `(i, (a_i·h + b_i) mod P mod w)`
    * accumulates every occurrence; one groupBy with map-side combine.
    */
  def countMinCounters(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, "d and w must be positive")
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(PolyHash.polyHash(col(keyCol).cast("string")).as("h"))
      .select(posexplode(positionsFromHash(col("h"), d, w)).as(Seq("row", "pos")))
      .groupBy(col("row"), col("pos")).agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min point lookup: estimate = min over the d rows of the
    * probed cell — always >= the true count (spec-pinned). The counter
    * table (d·w rows) is broadcast.
    */
  def countMinLookup(counters: DataFrame, probe: DataFrame, keyCol: String,
                     d: Int, w: Int): DataFrame = {
    GraftFunctions.ensureRegistered(probe.sparkSession)
    val pp = probe
      .withColumn("__h", PolyHash.polyHash(col(keyCol).cast("string")))
      .select(probe.columns.map(col) :+
        posexplode(positionsFromHash(col("__h"), d, w)).as(Seq("row", "pos")): _*)
    pp.join(broadcast(counters), Seq("row", "pos"))
      .groupBy(probe.columns.map(col): _*)
      .agg(min(col("cnt")).as("cm_estimate"))
  }

  /** HyperLogLog registers over 2^p buckets: bucket = g mod 2^p, and the
    * register is max(rho) where rho = 1 + leading zeros of the remaining
    * `width` bits (g // 2^p, which is < 2^width for the mixed hash's
    * < 2^30 range). `length(bin(x))` is the engine-portable bit-length —
    * Spark and DuckDB render identical minimal binary strings.
    *
    * g is the MIXED hash `((polyHash(key)^2 mod P)·a + b) mod P`, not
    * the raw PolyHash: poly31 is linear in the trailing characters, so
    * sequential keys ("id-1234", "id-1235") land 1 apart and cluster —
    * the max-rho statistic then sees a few dense regions instead of n
    * uniform draws and HLL underestimates ~3× (caught by SketchesSpec's
    * accuracy test on 5000 sequential ids). The modular square is the
    * nonlinear step (adjacent h spread by 2h+1 mod P); the affine round
    * after it redistributes the SMALL-h corner — short numeric keys
    * square to values far below P, and without the multiply their
    * buckets stay clustered (caught by the grouped per-type accuracy
    * test: 15 tiny user-id strings occupied 4 of 16 buckets).
    * Bloom/Count-Min keep the raw affine family — their correctness
    * contracts (no false negatives, one-sided error) hold for ANY hash;
    * only HLL's ESTIMATE depends on high-bit uniformity.
    *
    * Returns one row per NON-EMPTY bucket `(bucket, register)`; the
    * estimator ([[hllEstimate]]) treats absent buckets as register 0.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int): DataFrame =
    hllRegistersBy(df, Nil, keyCol, p)

  /** Grouped HLL: one register table per group — "approx distinct keys
    * per group" at a fixed 2^p-row budget per group regardless of
    * cardinality (the workhorse form: distinct users per type/day/
    * source). Registers are exact integers (oracle-checkable); estimate
    * per group via [[hllEstimate]] on the slice, accuracy spec-pinned.
    */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     p: Int): DataFrame = {
    require(p >= 2 && p <= 16, s"p must be in [2,16], got $p")
    GraftFunctions.ensureRegistered(df.sparkSession)
    val m = 1 << p
    val width = 30 - p
    val h = df.select(groupCols.map(col) :+
        PolyHash.polyHash(col(keyCol).cast("string")).as("h"): _*)
      .withColumn("h", pmod(pmod(col("h") * col("h"), lit(P)) * 1103515245L + 12345L, lit(P)))
    h.select(groupCols.map(col) :+
        pmod(col("h"), lit(m)).cast("long").as("bucket") :+
        (col("h") / lit(m)).cast("long").as("rest"): _*)
      .withColumn("rho",
        when(col("rest") === 0, lit(width + 1).cast("long"))
          .otherwise(lit(width + 1) - length(bin(col("rest")))))
      .groupBy((groupCols :+ "bucket").map(col): _*).agg(max(col("rho")).as("register"))
  }

  /** Max-merge of per-group HLL register tables into one global register
    * table — the mergeability algebra that makes HLL the right
    * 100 TB distinct-counter: registers computed independently per
    * source/partition/day combine by bucket-wise MAX into exactly the
    * registers a single pass over the union would have produced (max is
    * associative/commutative/idempotent, and rho of a key is
    * group-independent). An incremental pipeline therefore keeps one
    * tiny register table per ingest slice and merges on read; nothing
    * ever rescans history. The equivalence is oracle-checked (q167)
    * against a direct single-pass register build.
    */
  def hllMergeRegisters(registers: DataFrame): DataFrame =
    registers.groupBy(col("bucket")).agg(max(col("register")).as("register"))

  /** Standard HLL estimate from a register table (driver-side scalar —
    * the register table is 2^p rows by construction). Small-range
    * correction (linear counting) applied below the usual 2.5m cutoff.
    */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val regs = registers.select(col("bucket"), col("register"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val sum = (0 until m).map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = m - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
