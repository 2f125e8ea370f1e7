package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), n-gram Jaccard (blocked pair join), MinHash+LSH
  * (shingle → signature → band buckets → candidate join → exact verify),
  * and SimHash.
  *
  * Scale design:
  *  - Exact dedup shuffles on a 64-bit text hash, never the text itself.
  *  - Exact pair-wise Jaccard is quadratic per block — only valid behind
  *    a blocking key; the unblocked path at 100 TB is MinHash/LSH, whose
  *    cost is linear in (docs × shingles) plus bucket-local joins.
  *  - All stages are DataFrame ops (explode/groupBy/join); nothing
  *    collects to the driver.
  */
object Dedup {

  /** Word n-gram shingle set (distinct) per document. */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(textCol)
    if (n == 1) array_distinct(toks)
    else {
      val grams = transform(toks, (t, i) =>
        when(i <= size(toks) - n,
          concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*)))
      array_distinct(filter(grams, _.isNotNull))
    }
  }

  /** Exact duplicate groups on arbitrary key columns: groups with >1 row,
    * keeping the minimum id as the canonical representative.
    */
  def exactDupGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** All pairs (a < b) within the same `blockCols` whose n-gram Jaccard
    * similarity ≥ threshold. Exact — the oracle-checkable ground truth
    * for the approximate variants. One exploded shingle join, shuffled on
    * (block, shingle).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        blockCols: Seq[String]): DataFrame = {
    val withSh = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+ shingles(col(textCol), n).as("sh"): _*)
    val sizes = withSh.select(col("id"), size(col("sh")).as("sz"))
    val ex = withSh.select(
      (col("id") +: blockCols.map(col)) :+ explode(col("sh")).as("s"): _*)
    val joinCond = (blockCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a.s") === col("b.s")) :+ (col("a.id") < col("b.id"))).reduce(_ && _)
    val inter = ex.as("a").join(ex.as("b"), joinCond)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  private val P = 2038074743L // prime > 2^30, products stay well under 2^63

  /** MinHash signature column: `numHashes` permutations of the base
    * shingle hash via a universal family h_i(x) = (a_i·x + b_i) mod p,
    * over xxhash64 of the shingle. Returns array<long> of length
    * `numHashes`. Input: the shingle array column.
    */
  def minHashSignature(sh: Column, numHashes: Int): Column = {
    val base = transform(sh, s => pmod(xxhash64(s), lit(P)))
    val mins = (0 until numHashes).map { i =>
      val a = 1103515245L * (i + 1) % P
      val b = (12345L * (i + 1) + 7L) % P
      array_min(transform(base, h => pmod(h * a + b, lit(P))))
    }
    array(mins: _*)
  }

  /** LSH candidate pairs from MinHash signatures: band the signature
    * (bands × rowsPerBand = signature length), bucket on the band hash,
    * and emit distinct id pairs sharing any bucket. Probabilistic recall:
    * P(candidate | jaccard=j) = 1-(1-j^r)^b.
    */
  def minHashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      minHashSignature(shingles(col(textCol), n), bands * rowsPerBand).as("sig"))
    val bandRows = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), bI =>
        xxhash64(concat_ws(",", (0 until rowsPerBand).map(r =>
          get(col("sig"), bI * rowsPerBand + r)): _*)))).as(Seq("band", "bucket")))
    bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification of the
    * candidates (the standard shape: cheap recall stage, exact precision
    * stage over the tiny candidate set).
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double,
                      bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val cands = minHashLshCandidates(df, idCol, textCol, n, bands, rowsPerBand)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over token xxhash64s: bit i of the result is the
    * sign of the sum over tokens of (bit i set ? +1 : -1).
    */
  def simHash(textCol: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(textCol), t => xxhash64(t))
    val bitSums = (0 until 64).map { i =>
      aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1).otherwise(-1))
    }
    (0 until 64).map { i =>
      when(bitSums(i) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a blocking column: hamming ≤ maxDist.
    * (At scale, block on simhash bytes — here a caller-provided key.)
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCols: Seq[String], maxDist: Int): DataFrame = {
    val h = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      simHash(col(textCol)).as("sh"): _*)
    val cond = (blockCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a.id") < col("b.id"))).reduce(_ && _)
    h.as("a").join(h.as("b"), cond)
      .withColumn("dist", hamming(col("a.sh"), col("b.sh")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
  }
}
