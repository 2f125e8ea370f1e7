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

  /** Fellegi–Sunter match-weight estimation by EM over binary agreement
    * patterns — the probabilistic layer above [[blockedJaroWinkler]]:
    * given candidate pairs with K binary field agreements, learn the
    * per-field match/unmatch agreement rates (m_k, u_k) and the match
    * prior p, and emit each PATTERN's posterior match probability.
    *
    * The scale trick is classic: pairs collapse to their agreement
    * pattern first (≤ 2^K rows with counts), and every E/M step runs on
    * the pattern table — so EM cost is independent of the pair count
    * after one aggregation pass. Probabilities live as micro-ints; the
    * E-step likelihood products and M-step ratios are single shared
    * double expressions over exact integers, so the fixed point is
    * engine-identical.
    *
    * @param pairs  one row per candidate pair with boolean columns
    *               `aCols`
    * @param iters  EM rounds (unrolled in the oracle)
    * @return (a1..aK, n_pairs, r_micro) — pattern posterior after
    *         `iters` rounds, plus the learned constants on every row
    *         (m_k_micro, u_k_micro, p_micro)
    */
  def fellegiSunterEm(pairs: DataFrame, aCols: Seq[String],
                      iters: Int = 2): DataFrame = {
    val k = aCols.size
    val patterns = pairs
      .groupBy(aCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    var consts = patterns.sparkSession.range(1).select(
      (aCols.flatMap(a => Seq(lit(900000L).as(s"m_$a"), lit(100000L).as(s"u_$a")))
        :+ lit(500000L).as("p")): _*)
    def rCol: Column = {
      val wm = aCols.map(a =>
        when(col(a), col(s"m_$a")).otherwise(lit(1000000L) - col(s"m_$a"))
          .cast("double"))
        .foldLeft(col("p").cast("double"))(_ * _)
      val wu = aCols.map(a =>
        when(col(a), col(s"u_$a")).otherwise(lit(1000000L) - col(s"u_$a"))
          .cast("double"))
        .foldLeft((lit(1000000L) - col("p")).cast("double"))(_ * _)
      round(wm / (wm + wu) * 1000000, 0).cast("long")
    }
    for (_ <- 1 to iters) {
      val e = patterns.crossJoin(broadcast(consts)).withColumn("r", rCol)
      val mStep: Seq[Column] = aCols.flatMap(a => Seq(
        round(sum(when(col(a), col("n") * col("r")).otherwise(0L))
          .cast("double") * 1000000.0
          / sum(col("n") * col("r")).cast("double"), 0)
          .cast("long").as(s"m_$a"),
        round(sum(when(col(a), col("n") * (lit(1000000L) - col("r")))
          .otherwise(0L)).cast("double") * 1000000.0
          / sum(col("n") * (lit(1000000L) - col("r"))).cast("double"), 0)
          .cast("long").as(s"u_$a"))) :+
        round(sum(col("n") * col("r")).cast("double")
          / (sum(col("n")) * lit(1000000L)).cast("double") * 1000000.0, 0)
          .cast("long").as("p")
      consts = e.agg(mStep.head, mStep.tail: _*)
    }
    patterns.crossJoin(broadcast(consts))
      .withColumn("r_micro", rCol)
      .select((aCols.map(col) :+ col("n").as("n_pairs") :+ col("r_micro"))
        ++ aCols.flatMap(a => Seq(col(s"m_$a").as(s"m_${a}_micro"),
          col(s"u_$a").as(s"u_${a}_micro"))) :+ col("p").as("p_micro"): _*)
  }

  /** Blocking-quality report: for a candidate-generation key, the two
    * numbers every entity-resolution blocking decision turns on —
    * reduction ratio (how much of the quadratic pair space the key
    * prunes) and pairs completeness (what fraction of TRUE matches the
    * key keeps co-blocked). Truth pairs come from the caller (here the
    * engine's own SimHash near-dup screen — the audit composes two of
    * the engine's operators against each other).
    *
    * Candidate counting is one key-grouped aggregation (Σ n_k·(n_k−1)/2
    * — never a materialized pair join); only the truth∩candidate check
    * joins pairs, and the truth set is screen-sized.
    *
    * @param records (id, key) blocking assignment
    * @param truth   (id_a, id_b) true-match pairs, id_a < id_b
    * @return one row: n_records, n_cand_pairs, n_true_pairs,
    *         n_true_blocked, rr_micro, pc_milli
    */
  def blockingQuality(records: DataFrame, truth: DataFrame): DataFrame = {
    val recs = records.select(col("id"), col("key")).persist()
    val nRec = recs.agg(count(lit(1)).as("n_records"))
    val cand = recs.groupBy(col("key")).agg(count(lit(1)).as("nk"))
      .agg(sum(expr("nk * (nk - 1) div 2")).as("n_cand_pairs"))
    val truthKeyed = truth
      .join(recs.select(col("id").as("id_a"), col("key").as("ka")), "id_a")
      .join(recs.select(col("id").as("id_b"), col("key").as("kb")), "id_b")
    val truthStats = truthKeyed.agg(count(lit(1)).as("n_true_pairs"),
      sum(when(col("ka") === col("kb"), 1L).otherwise(0L)).as("n_true_blocked"))
    nRec.crossJoin(broadcast(cand)).crossJoin(broadcast(truthStats))
      .select(col("n_records"), col("n_cand_pairs"), col("n_true_pairs"),
        col("n_true_blocked"),
        round((lit(1.0) - col("n_cand_pairs").cast("double")
          / (col("n_records") * (col("n_records") - 1) / 2).cast("double"))
          * 1000000.0, 0).cast("long").as("rr_micro"),
        when(col("n_true_pairs") > 0L,
          round(col("n_true_blocked").cast("double") * 1000.0
            / col("n_true_pairs").cast("double"), 0).cast("long"))
          .otherwise(lit(null).cast("long")).as("pc_milli"))
  }
}
