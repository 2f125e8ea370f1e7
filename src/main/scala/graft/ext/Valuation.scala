package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact cooperative-game data valuation: the Shapley value of each
  * corpus slice ("player") toward a downstream model's held-out
  * accuracy, computed over ALL 2^n coalitions — no Monte-Carlo, no
  * truncation. Generalizes the leave-one-source-out influence audit
  * ([[LangModel.sourceInfluenceNb]], reference's per-source validation
  * posture, reference/R/validation-functions.R) from the two marginal
  * coalitions to the full lattice, so the per-slice credit respects
  * efficiency (Σ φ = v(full) − v(∅)) and symmetry exactly.
  *
  * Feasibility at 100 TB: the number of PLAYERS is small (language
  * buckets, top-level sources, license tiers — n ≤ ~12), so the 2^n
  * subset lattice is a tiny table. The corpus is shuffled exactly once
  * (the per-(player, token) count aggregation); everything after is
  * vocab×2^n and panel×2^n sized, with the player/coalition tables
  * broadcast. Utility is a complement-count Naive Bayes — each
  * coalition's model is an integer SUM of per-player count tables, so
  * "training" all 2^n models is one broadcast-join aggregation, not 2^n
  * passes over the data.
  *
  * Fixed-point discipline (cross-engine bit-stability): every log term
  * is rounded to integer micro-nats BEFORE summation; scores and
  * accuracies are integer; the Shapley weights |S|!·(n−1−|S|)! are kept
  * as exact integers in units of 1/n!.
  */
object Valuation {

  private def microLn(x: Column): Column =
    round(log(x.cast("double")) * 1000000, 0).cast("long")

  /** Exact Shapley value per player group.
    *
    * Protocol: docs with `id % panelMod == 0` form the held-out panel;
    * the rest train. A coalition S trains a Laplace-smoothed NB over
    * the FULL training vocabulary (tokens outside S's corpus contribute
    * count 0, so their numerator term is ln1−ln1 = 0 and only the
    * shared denominator ln(n1_S+V) − ln(n0_S+V) — applied once per
    * in-vocab token instance — distinguishes coalitions on them).
    * Utility v(S) = panel accuracy in milli. Output one row per player:
    * the full-coalition accuracy, the accuracy without the player, the
    * exact Shapley numerator (units of milli-accuracy / n!), and its
    * rounded micro-accuracy value.
    *
    * @param gold boolean label column evaluated on `docs`
    */
  def shapleyByGroup(docs: DataFrame, idCol: String, textCol: String,
                     grpCol: String, gold: Column,
                     panelMod: Int = 7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // persist the scan-level projection: the lattice expansion
    // references train/panel through many branches, and each would
    // otherwise re-scan the corpus (PlanAuditSpec pins the scan count)
    val base = docs.select(col(idCol).as("id"), col(grpCol).as("grp"),
      gold.as("gold"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .persist()
    val train = base.filter(col("id") % panelMod =!= 0)
    val panel = base.filter(col("id") % panelMod === 0)

    // players: the distinct groups, bit index = lexicographic rank.
    // Bounded by design (language buckets / top-level sources); the
    // collect is the same groups-sized seam as the IVF seed pick.
    val groups: Array[String] =
      train.select(col("grp")).distinct().orderBy(col("grp"))
        .as[String].collect()
    val n = groups.length
    // exact Shapley is 2^n by definition; the documented contract is
    // players = language buckets / top-level sources (n ≈ 5–12). 2^12 =
    // 4096 coalitions keeps the panel×subsets fan-out and the membership
    // lattice wallet-sized; past that use a sampled estimator instead.
    require(n >= 1 && n <= 12,
      s"player count $n out of the exact-lattice range (max 12 players = " +
        "4096 coalitions; regroup sources or sample permutations instead)")
    val groupIdx = groups.zipWithIndex
      .map { case (g, i) => (g, i, 1L << i) }.toSeq.toDF("grp", "idx", "bit")

    val tokRows = train.select(col("grp"), col("gold"),
      explode(col("toks")).as("tok"))
    // ONE corpus-wide shuffle: per-(player, token) class counts
    val gCounts = tokRows.groupBy(col("grp"), col("tok"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1g"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0g"))
      .persist()
    val vocabSize = gCounts.select(countDistinct(col("tok")).as("v"))
    // per-player totals (token mass and doc counts) — players-sized
    val gTotals = gCounts.groupBy(col("grp"))
      .agg(sum(col("c1g")).as("n1g"), sum(col("c0g")).as("n0g"))
      .join(train.groupBy(col("grp")).agg(
        sum(when(col("gold"), 1L).otherwise(0L)).as("d1g"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("d0g")), "grp")
      .join(groupIdx, "grp")

    val subsets = spark.range(0L, 1L << n).toDF("subset")
    val membership = subsets.crossJoin(broadcast(gTotals))
      .filter(col("subset").bitwiseAND(col("bit")) =!= 0L)
    // coalition constants: priors and the shared smoothing denominator
    val subsetConsts = subsets
      .join(membership.groupBy(col("subset")).agg(
          sum(col("n1g")).as("n1s"), sum(col("n0g")).as("n0s"),
          sum(col("d1g")).as("d1s"), sum(col("d0g")).as("d0s")),
        Seq("subset"), "left")
      .na.fill(0L, Seq("n1s", "n0s", "d1s", "d0s"))
      .crossJoin(broadcast(vocabSize))
      .select(col("subset"),
        (microLn(col("d1s") + 1L) - microLn(col("d0s") + 1L)).as("prior_micro"),
        (microLn(col("n1s") + col("v")) - microLn(col("n0s") + col("v")))
          .as("denom_micro"))
    // all 2^n models at once: coalition × token numerator terms
    // (vocab × avg-coalitions-per-token rows; zero-count tokens drop
    // because their term is exactly 0)
    val subsetTok = gCounts
      .join(broadcast(membership.select(col("subset"), col("grp"))), "grp")
      .groupBy(col("subset"), col("tok"))
      .agg(sum(col("c1g")).as("c1s"), sum(col("c0g")).as("c0s"))
      .select(col("subset"), col("tok"),
        (microLn(col("c1s") + 1L) - microLn(col("c0s") + 1L)).as("term_micro"))

    val vocab = gCounts.select(col("tok")).distinct()
    val panelTok = panel.select(col("id"), explode(col("toks")).as("tok"))
      .join(vocab, "tok") // out-of-vocab instances carry no evidence
    val panelLen = panelTok.groupBy(col("id")).agg(count(lit(1)).as("t_len"))
    val panelDocs = panel.select(col("id"), col("gold"))
      .join(panelLen, Seq("id"), "left").na.fill(0L, Seq("t_len"))

    // score every panel doc under every coalition: the only ×2^n fan-out
    // is over the PANEL token stream, never the corpus
    val numSums = panelTok.join(subsetTok, "tok")
      .groupBy(col("id"), col("subset"))
      .agg(sum(col("term_micro")).as("num_micro"))
    val scored = panelDocs.crossJoin(subsets)
      .join(numSums, Seq("id", "subset"), "left")
      .na.fill(0L, Seq("num_micro"))
      .join(broadcast(subsetConsts), "subset")
      .withColumn("pred",
        col("prior_micro") + col("num_micro")
          - col("t_len") * col("denom_micro") >= 0L)
    val subsetAcc = scored.groupBy(col("subset"))
      .agg(round(sum(when(col("pred") === col("gold"), 1L).otherwise(0L))
          .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
        .cast("long").as("acc_milli"))

    // Shapley over the lattice: pair S (g ∉ S) with S ∪ {g};
    // weight |S|!·(n−1−|S|)! exact in units of 1/n!
    val factorial: Array[Long] =
      (0 to n).map(k => (1 to k).foldLeft(1L)(_ * _.toLong)).toArray
    val wExpr = (0 until n).foldLeft(lit(0L)) { (acc, k) =>
      when(expr("bit_count(s_lo)") === k,
        lit(factorial(k) * factorial(n - 1 - k))).otherwise(acc)
    }
    val accA = subsetAcc.select(col("subset").as("s_lo"), col("acc_milli").as("v_lo"))
    val accB = subsetAcc.select(col("subset").as("s_hi"), col("acc_milli").as("v_hi"))
    val pairs = accA.crossJoin(broadcast(groupIdx))
      .filter(col("s_lo").bitwiseAND(col("bit")) === 0L)
      .withColumn("s_hi", col("s_lo") + col("bit"))
      .join(broadcast(accB), "s_hi")
      .withColumn("w", wExpr)
    val shap = pairs.groupBy(col("grp"))
      .agg(sum(col("w") * (col("v_hi") - col("v_lo"))).as("shap_num"))

    val nFactorial = factorial(n)
    val full = (1L << n) - 1L
    val vFull = subsetAcc.filter(col("subset") === full)
      .select(col("acc_milli").as("v_full_milli"))
    val without = subsetAcc.crossJoin(broadcast(groupIdx))
      .filter(col("subset") === lit(full) - col("bit"))
      .select(col("grp"), col("acc_milli").as("v_without_milli"))

    shap.join(broadcast(without), "grp").crossJoin(broadcast(vFull))
      .select(col("grp").as("player"),
        col("v_full_milli"), col("v_without_milli"), col("shap_num"),
        round(col("shap_num").cast("double") * 1000.0 / nFactorial.toDouble, 0)
          .cast("long").as("shap_micro"))
  }
}
