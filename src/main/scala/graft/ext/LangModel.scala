package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Corpus-trained statistical text scoring — the perplexity-style
  * quality signals a pretraining pipeline runs after the rule filters
  * (TextAnalysis) and before dedup: a unigram language model fit ON the
  * corpus itself, and TF-IDF term salience.
  *
  * Engine-exactness discipline (same as the rest of `ext`): every
  * transcendental goes through ONE shared shape — `round(ln(int ratio)
  * · 1e6)` into BIGINT micro-nats — computed from exact integer counts,
  * so the DuckDB oracle reproduces values bit-for-bit; per-document
  * totals are then INTEGER sums (order-independent under distributed
  * aggregation, unlike double sums).
  *
  * Scale shape: the model side (token → count) is vocabulary-sized —
  * usually orders of magnitude smaller than the corpus — so it
  * broadcasts BY DEFAULT, but the broadcast is SIZE-GATED
  * ([[BroadcastMaxRowsKey]]): a web-corpus vocabulary that outgrows the
  * gate degrades the model join to a plain shuffle join instead of
  * failing the job on the broadcast build. The corpus side stays a
  * linear explode + partial-agg groupBy on doc id either way. Nothing
  * shuffles token instances twice.
  */
object LangModel {

  private def toks(textCol: Column): Column = TextAnalysis.tokens(textCol)

  /** Spark conf key: row-count ceiling for force-broadcasting a
    * model-side table (unigram counts, IDF, classifier weights). A
    * model at or under the gate gets an explicit broadcast hint; above
    * it the join is left to the planner (a shuffle join at web-corpus
    * vocabulary sizes). Default [[DefaultBroadcastMaxRows]] ≈ the
    * ~10M-token vocabulary the scaladoc always promised was the
    * broadcast ceiling — now enforced instead of assumed.
    */
  val BroadcastMaxRowsKey = "graft.model.broadcastMaxRows"
  val DefaultBroadcastMaxRows = 10000000L

  private def broadcastMaxRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption(BroadcastMaxRowsKey).map(_.toLong)
      .getOrElse(DefaultBroadcastMaxRows)

  /** Gate counts memoized by (session, canonicalized logical plan):
    * the same model fit over the same files always has the same
    * cardinality, so the count job runs once per distinct model per
    * SESSION instead of once per CALL (the per-call count was a
    * measured 2.5× regression on q92 — an extra job per bench rep for
    * a number that never changes). Scoping by session means a fresh
    * `SparkSession` (tests, `newSession()` per-query isolation) never
    * reads another session's counts. ACCEPTED STALENESS within one
    * session: if the files under an identical plan are rewritten
    * in-session (scratch-dir regeneration), the cached count survives —
    * a harness that rewrites data must call [[clearGateCountCache]]
    * (or open a new session). Bounded: distinct model plans per session
    * are a handful; cleared defensively if it ever grows past the cap.
    */
  private val gateCountCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      java.lang.Long]()

  /** Drop all memoized gate counts — for harnesses that rewrite the
    * files under a live session (see the staleness note above).
    */
  def clearGateCountCache(): Unit = gateCountCache.clear()

  /** Persist + count the model table, then broadcast-hint it only under
    * the gate. The count is not an extra corpus pass: the model fit is
    * persisted first, so the count materializes the aggregate once and
    * the join reads the cache (the same single model-fit pass the
    * unconditional broadcast build performed). Model tables are
    * vocabulary-sized; Bench/Verify reclaim the blocks between queries.
    */
  private def gatedBroadcast(df: DataFrame): DataFrame = {
    val model = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (gateCountCache.size > 256) gateCountCache.clear()
    val n = gateCountCache.computeIfAbsent(
      (df.sparkSession, df.queryExecution.optimizedPlan.canonicalized),
      _ => model.count())
    if (n <= broadcastMaxRows(df.sparkSession)) broadcast(model)
    else model
  }

  /** Unigram NLL table fit on the corpus: one row per distinct token,
    * `nll_micro = round((ln N - ln c) · 1e6)` where `c` is the token's
    * corpus frequency and `N` the total token count (MLE — every scored
    * token is in-vocabulary when scoring the training corpus itself).
    */
  def tokenNll(docs: DataFrame, textCol: Column): DataFrame = {
    val counts = docs
      .select(explode(toks(textCol)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      .select(col("tok"),
        round((log(col("n").cast("double")) - log(col("c").cast("double"))) * 1000000, 0)
          .cast("long").as("nll_micro"))
  }

  /** Per-document negative log-likelihood under the corpus unigram
    * model: (id, n_tokens, sum_nll_micro, avg_nll_micro). High average
    * NLL = rare-token-heavy documents (gibberish / boilerplate-free
    * outliers); the standard "perplexity bucket" filter key.
    */
  def docNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val model = gatedBroadcast(tokenNll(docs, col(textCol)))
    docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .join(model, "tok")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll_micro")).as("sum_nll_micro"))
      .select(col("id"), col("n_tokens"), col("sum_nll_micro"),
        round(col("sum_nll_micro").cast("double") / col("n_tokens"), 0)
          .cast("long").as("avg_nll_micro"))
  }

  /** Top-k salient terms per document by TF-IDF:
    * `score_micro = tf · round(ln(n_docs / df) · 1e6)` — integer
    * term frequency times micro-nat IDF, exact in both engines. Ties
    * break (score desc, token asc); output (id, rnk, tok, score_micro).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val docTok = docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
    val tf = docTok.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.select(col(idCol)).distinct().count()
    val idf = gatedBroadcast(
      docTok.groupBy(col("tok")).agg(countDistinct(col("id")).as("df"))
        .select(col("tok"),
          round((log(lit(nDocs.toDouble)) - log(col("df").cast("double"))) * 1000000, 0)
            .cast("long").as("idf_micro")))
    val w = Window.partitionBy(col("id")).orderBy(col("score_micro").desc, col("tok").asc)
    tf.join(idf, "tok")
      .select(col("id"), col("tok"), (col("tf") * col("idf_micro")).as("score_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Top-k salient terms per document by Okapi BM25 (k1 = 1.2,
    * b = 0.75): `score = idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`
    * with the Lucene-style non-negative idf
    * `ln((N − df + 0.5)/(df + 0.5) + 1)`. The length-normalized upgrade
    * of [[tfidfTopK]] — long documents no longer win on raw repetition.
    *
    * Every input (tf, df, dl, N, total tokens) is an exact integer; the
    * score is ONE shared-shape double expression evaluated identically
    * by both engines and rounded to micro-units at the end (scores are
    * non-negative, so HALF_UP agrees cross-engine). `avgdl` is the
    * exact double `totTok/nDocs` computed from two driver-side longs —
    * the oracle reproduces it with the same single division.
    *
    * Shape: one tokenize/explode pass into the (id, tok) tf table
    * (persisted — it feeds dl, df, the global total, and the score
    * join), the df/idf model under the [[BroadcastMaxRowsKey]] gate,
    * and a per-doc top-k window. No global-order window anywhere.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = docs.select(col(idCol)).distinct().count()
      val totTok = tf.agg(sum(col("tf")).cast("long")).head.getLong(0)
      val avgdl = totTok.toDouble / nDocs.toDouble
      val idf = gatedBroadcast(
        tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .select(col("tok"),
            log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf")))
      val dl = Window.partitionBy(col("id"))
      val w = Window.partitionBy(col("id")).orderBy(col("score_micro").desc, col("tok").asc)
      tf.withColumn("dl", sum(col("tf")).over(dl))
        .join(idf, "tok")
        .select(col("id"), col("tok"),
          round(col("idf") * (col("tf") * 2.2 /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))) * 1000000, 0)
            .cast("long").as("score_micro"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .checkpointEager()
    } finally tf.unpersist(false)
  }

  /** Out-of-vocabulary rate per document against the corpus top-`vocabSize`
    * token vocabulary (ties at the frequency boundary break
    * lexicographically, so the vocabulary is deterministic). Reports
    * per-doc token count, OOV token count, and the OOV fraction in
    * micro-units — the standard "how well does a fixed tokenizer/vocab
    * cover this source" curation diagnostic.
    *
    * The vocabulary selection is `orderBy(count desc, token).limit(V)` —
    * Spark plans that as a distributed TakeOrdered (per-partition top-V
    * then a V-row driver merge), never a global sort; the V-row result
    * broadcasts unconditionally.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val docTok = docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
    val vocab = docTok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    docTok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") * 1000000.0 / col("n_tokens"), 0)
          .cast("long").as("oov_micro"))
  }

  /** fastText-style hashed linear classifier INFERENCE — the quality/
    * domain classifier pass every curation pipeline runs with a small
    * trained model: tokens hash into `nBuckets` feature buckets
    * ([[graft.functions.PolyHash]] — engine-portable), the model is a
    * (bucket, w_micro) weight table joined in (broadcast: the model is
    * O(nBuckets), corpus-independent), and the document score is the
    * exact integer mean feature weight
    * `score_micro = round(Σ cnt·w_micro / Σ cnt)` — exact integer sums,
    * one shared-shape double division (never integer `div`: Spark
    * truncates toward zero, DuckDB `//` floors, and scores go negative)
    * — squashed to a probability
    * `prob_micro = round(1e6 / (1 + exp(−score_micro/1e6)))` — the one
    * transcendental, computed from an exact integer, so any engine
    * reproduces it.
    *
    * Linear: one explode + one partial-agg groupBy(id, bucket) + one
    * groupBy(id); the weight join never shuffles the corpus side twice.
    *
    * @param weights (bucket: LONG in [0, nBuckets), w_micro: LONG)
    */
  def hashedLinearScoreMicro(docs: DataFrame, weights: DataFrame,
                             idCol: String, textCol: String,
                             nBuckets: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val feats = docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .select(col("id"),
        pmod(graft.functions.PolyHash.polyHash(col("tok")), lit(nBuckets.toLong))
          .as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
    feats.join(gatedBroadcast(weights), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("w_micro")).as("wsum"))
      .select(col("id"), col("n_tokens"),
        round(col("wsum").cast("double") / col("n_tokens"), 0)
          .cast("long").as("score_micro"))
      .withColumn("prob_micro",
        round(lit(1000000.0) / (lit(1.0) +
          exp(-(col("score_micro").cast("double") / lit(1000000.0)))), 0)
          .cast("long"))
  }

  /** Deterministic stand-in weight table for [[hashedLinearScoreMicro]]
    * specs/conformance: `w_micro = ((1103515245·b + 12345) mod
    * 1000000007) mod 2000001 − 1000000` ∈ [−1e6, 1e6] — pure positive
    * integer arithmetic, so any engine regenerates the identical model.
    * A real deployment replaces this with trained weights read from a
    * table; the operator only sees (bucket, w_micro) either way.
    */
  def syntheticWeights(spark: org.apache.spark.sql.SparkSession,
                       nBuckets: Int): DataFrame =
    spark.range(nBuckets).select(col("id").as("bucket"),
      (((lit(1103515245L) * col("id") + 12345L) % 1000000007L) % 2000001L
        - 1000000L).as("w_micro"))

  /** Bigram language model with stupid backoff, trained on `train` and
    * scoring `docs` — the cross-corpus perplexity filter (score web text
    * against a trusted reference corpus; unseen bigrams back off to the
    * discounted unigram). Per adjacent token pair:
    *
    *  - seen bigram:   `nll = ln(c(w1)) − ln(c(w1 w2))`
    *  - unseen bigram: `nll = ln(5·N) − ln(2·c'(w2))`  (stupid backoff
    *    `0.4·c(w2)/N`, folded to integer ln arguments: 5N / 2c; OOV w2
    *    floors at c' = 1)
    *
    * evaluated once per pair TYPE in micro-nats from exact integer
    * counts (the [[docNll]] discipline — ln args are INTEGERS, so both
    * engines see identical doubles); per-document totals are integer
    * sums. Documents with fewer than two tokens have no bigrams and are
    * absent from the output.
    *
    * Scale shape: the unigram table broadcasts under the
    * [[BroadcastMaxRowsKey]] gate (vocabulary-sized, but web-corpus
    * vocab degrades to a shuffle join); the bigram table joins the doc
    * pair TYPES by plain equi-shuffle — it grows with the training
    * corpus, so it is never force-broadcast at any size. Token
    * instances shuffle once (the groupBy(id, w1, w2)).
    */
  def bigramBackoffNll(train: DataFrame, docs: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    def pairs(t: Column): Column =
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2")))
    val trainToks = train.select(explode(toks(col(textCol))).as("tok"))
    // the unigram table is consumed TWICE (w1 and w2 sides) plus the
    // row-count gate: persist once, fit once, project per side
    val cu = trainToks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cuN = gateCountCache.computeIfAbsent(
      (train.sparkSession, cu.queryExecution.optimizedPlan.canonicalized),
      _ => cu.count())
    val cuSmall = cuN <= broadcastMaxRows(train.sparkSession)
    def cuSide(w: String, out: String): DataFrame = {
      val side = cu.select(col("tok").as(w), col("c").as(out))
      if (cuSmall) broadcast(side) else side
    }
    val n = trainToks.count()
    val cb = train
      .select(toks(col(textCol)).as("t")).filter(size(col("t")) >= 2)
      .select(explode(pairs(col("t"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cb"))
    val docPairs = docs
      .select(col(idCol).as("id"), toks(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("id"), explode(pairs(col("t"))).as("p"))
      .groupBy(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    val pairTypes = docPairs.select(col("w1"), col("w2")).distinct()
      .join(cb, Seq("w1", "w2"), "left")
      .join(cuSide("w1", "cu1"), Seq("w1"), "left")
      .join(cuSide("w2", "cu2"), Seq("w2"), "left")
      .select(col("w1"), col("w2"),
        when(col("cb").isNotNull,
          round((log(col("cu1").cast("double")) - log(col("cb").cast("double"))) * 1000000, 0))
        .otherwise(
          round((log(lit(5L * n).cast("double"))
            - log((lit(2L) * coalesce(col("cu2"), lit(1L))).cast("double"))) * 1000000, 0))
        .cast("long").as("nll_micro"))
    docPairs.join(pairTypes, Seq("w1", "w2"))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_pairs"),
        sum(col("cnt") * col("nll_micro")).as("sum_nll_micro"))
      .select(col("id"), col("n_pairs"), col("sum_nll_micro"),
        round(col("sum_nll_micro").cast("double") / col("n_pairs"), 0)
          .cast("long").as("avg_nll_micro"))
  }

  /** Per-document token-distribution Shannon entropy in micro-nats:
    * `H = Σ_types (c/n)·ln(n/c)`, evaluated as
    * `round(Σ_types c · round((ln n − ln c)·1e6) / n)` — the shared
    * micro-nat shape (one transcendental per (c, n) pair, exact integer
    * weighting and sums between). Low entropy = repetitive/templated
    * text, a standard quality signal next to [[docNll]] (which scores
    * against the CORPUS distribution; entropy scores the document's
    * own).
    *
    * One groupBy(id, tok) then one window-sum per doc — both
    * partitioned by id, single exchange after the type count.
    */
  def docEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val byType = docs
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
    val wDoc = Window.partitionBy(col("id"))
    byType
      .withColumn("n", sum(col("c")).over(wDoc))
      .withColumn("nll_micro",
        round((log(col("n").cast("double")) - log(col("c").cast("double"))) * 1000000, 0)
          .cast("long"))
      .groupBy(col("id"))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("nll_micro")).as("wsum"))
      .select(col("id"), col("n_tokens"), col("n_types"),
        round(col("wsum").cast("double") / col("n_tokens"), 0)
          .cast("long").as("entropy_micro"))
  }

  /** Exact all-pairs TF-IDF cosine top-k over n-gram vectors via the
    * classic INVERTED-INDEX join — sparse lexical doc-doc similarity,
    * the exact ground truth the ANN retrievers
    * ([[Similarity]]/[[IvfIndex]]) approximate on dense embeddings.
    *
    * Weights are exact integers: `w = tf · idf_kilo` with
    * `idf_kilo = round(ln(N/df)·1e3)` (KILO, not micro — norms sum w²,
    * and kilo-scale keeps `Σ w²` far inside 64 bits: safe while
    * `tf·idf_kilo ≤ ~3e9` per term at ~1e4 terms/doc). Dot products
    * and squared norms are exact long sums; the cosine is ONE
    * shared-shape double expression (`dot·1e6 / (√na·√nb)`) rounded to
    * micro-units — bit-identical in any engine.
    *
    * Scale shape: the candidate join fans out per term as df², so the
    * DF-CAP is the scale lever — `maxDf` bounds per-term fan-out
    * (Σ_{df≤cap} df² ≤ cap·Σdf) exactly like the band-bucket caps in
    * [[Dedup]]; capped terms drop from the VOCABULARY (weights and
    * norms alike — both engines agree on the vector space). The df/idf
    * table is vocabulary-sized and size-gate-broadcast; per-anchor
    * top-k ranks only the surviving candidate pairs.
    */
  def tfidfCosineTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDf: Long, n: Int = 2): DataFrame = {
    require(k >= 1, "k must be positive")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // a selective id filter collapses the text scan to one partition —
    // widen BEFORE the tokenize/bigram Generate or that CPU-heavy
    // stage runs single-threaded (measured 3.6x on the q183 shape)
    val grams = Exec.widen(docs).select(col(idCol).as("id"),
        TextAnalysis.gramsFromTokens(toks(col(textCol)), n).as("g"))
      .select(col("id"), explode(col("g")).as("tok"))
    val tf = grams.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      .persist(lvl)
    try {
      val nDocs = docs.select(col(idCol)).distinct().count()
      val idf = gatedBroadcast(
        tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf)
          .select(col("tok"),
            round((log(lit(nDocs.toDouble)) - log(col("df").cast("double"))) * 1000, 0)
              .cast("long").as("idf_kilo")))
      val w = tf.join(idf, "tok")
        .select(col("id"), col("tok"), (col("tf") * col("idf_kilo")).as("w"))
        .persist(lvl)
      try {
        val norms = w.groupBy(col("id")).agg(sum(col("w") * col("w")).as("n2"))
        val dots = w.select(col("id").as("id_a"), col("tok"), col("w").as("wa"))
          .join(w.select(col("id").as("id_b"), col("tok"), col("w").as("wb")), "tok")
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b")).agg(sum(col("wa") * col("wb")).as("dot"))
        val both = dots.unionByName(dots.select(
          col("id_b").as("id_a"), col("id_a").as("id_b"), col("dot")))
        val scored = both
          .join(norms.select(col("id").as("id_a"), col("n2").as("na")), "id_a")
          .join(norms.select(col("id").as("id_b"), col("n2").as("nb")), "id_b")
          .select(col("id_a"), col("id_b"),
            round(col("dot").cast("double") * 1000000.0
              / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 0)
              .cast("long").as("cos_micro"))
        val wnd = Window.partitionBy(col("id_a"))
          .orderBy(col("cos_micro").desc, col("id_b").asc)
        scored.withColumn("rnk", row_number().over(wnd).cast("long"))
          .filter(col("rnk") <= k)
          .select(col("id_a").as("doc_id"), col("rnk"),
            col("id_b").as("nbr_id"), col("cos_micro"))
          .checkpointEager()
      } finally { w.unpersist(false); () }
    } finally { tf.unpersist(false); () }
  }

  /** Top-k COLLOCATIONS by pointwise mutual information over adjacent
    * token pairs — the multiword-expression detector ("new york",
    * "machine learning") of the corpus-statistics stage.
    * `PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )`, evaluated as ONE
    * shared-shape double expression over exact integer counts —
    * `ln( (c12·N1·N1) / (NB·c1·c2) )` — rounded to micro-nats, so any
    * engine reproduces it bit-for-bit (the q92/q119 micro-nat
    * discipline). A minimum pair count gates the classic PMI
    * rare-pair blowup.
    *
    * Scale shape: unigram and bigram counts are two partial-combining
    * groupBys over one token explode each; the scored table is
    * vocabulary²-bounded and already min-count-filtered, so the
    * global top-k is Spark's TakeOrdered (per-partition heaps), never
    * a full sort.
    */
  def pmiCollocations(docs: DataFrame, textCol: String, k: Int,
      minCount: Long): DataFrame = {
    require(k >= 1 && minCount >= 1, "need k >= 1 and minCount >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val toksCol = toks(col(textCol))
    val uni = docs.select(explode(toksCol).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c")).persist(lvl)
    val bi = docs.select(explode(TextAnalysis.gramsFromTokens(toksCol, 2)).as("g"))
      .select(split(col("g"), " ").as("p"))
      .select(col("p").getItem(0).as("w1"), col("p").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")).persist(lvl)
    try {
      val n1 = uni.agg(sum(col("c"))).head.getLong(0)
      val nb = bi.agg(sum(col("c12"))).head.getLong(0)
      bi.filter(col("c12") >= minCount)
        .join(gatedBroadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
        .join(gatedBroadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
        .select(col("w1"), col("w2"), col("c12"),
          round(log(col("c12").cast("double") * lit(n1.toDouble) * lit(n1.toDouble)
              / (lit(nb.toDouble) * col("c1").cast("double") * col("c2").cast("double")))
            * 1000000, 0).cast("long").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
        .limit(k)
        .checkpointEager() // materialize before the persists release
    } finally { bi.unpersist(false); uni.unpersist(false); () }
  }

  /** Byte-pair-encoding MERGE INDUCTION — the vocabulary-learning step
    * of a BPE tokenizer, run corpus-wide: per round, count adjacent
    * symbol pairs across all word occurrences (weighted by corpus word
    * frequency), adopt the most frequent pair (ties: count desc, left
    * asc, right asc) as a new merged symbol, and greedily re-tokenize
    * every word left-to-right. Deterministic and engine-portable: the
    * counts are exact integer sums and the greedy re-scan is a pure
    * left fold, so the DuckDB oracle replays the identical rounds (its
    * recursive-CTE scan ≡ this `aggregate()` fold, spec-pinned).
    *
    * Scale shape: everything after the first groupBy operates on the
    * WORD VOCABULARY (tok, wf, syms) — orders of magnitude smaller
    * than the corpus — so per round it is one vocabulary-sized
    * pair-explode + partial-agg count plus ONE single-row argmax
    * collect (bounded driver traffic, like the k-centroid collects in
    * [[IvfIndex]]); the fold rewrite is a pure per-row expression.
    * Vocabulary re-checkpointed per round (bounded lineage).
    *
    * @return one row per adopted merge: (merge_round, left_sym,
    *         right_sym, pair_count); fewer than `rounds` rows if the
    *         pair supply exhausts first
    */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one round")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs.select(explode(toks(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("wf"))
      .withColumn("syms", split(col("tok"), ""))
      .checkpointEager()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = vocab.select(col("wf"), explode(filter(
          transform(col("syms"), (x, i) =>
            when(i <= size(col("syms")) - 2,
              struct(x.as("p1"), get(col("syms"), i + 1).as("p2")))),
          _.isNotNull)).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("wf")).as("c"))
      // single-row argmax: bounded driver traffic by construction
      val top = pairs.orderBy(col("c").desc, col("p1").asc, col("p2").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (p1, p2, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, p1, p2, c))
        vocab = vocab.withColumn("syms", expr(mergeFoldSql(p1, p2))).checkpointEager()
        r += 1
      }
    }
    merges.toSeq
      .toDF("merge_round", "left_sym", "right_sym", "pair_count")
  }

  private def lit1(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Greedy left-to-right application of ONE merge (p1, p2) to a `syms`
    * array column — the `aggregate()` fold shared by the induction
    * ([[bpeMerges]]) and the application ([[bpeApplyToVocab]]); the
    * DuckDB oracle replays it as a recursive-CTE scan.
    */
  private[ext] def mergeFoldSql(p1: String, p2: String): String =
    s"""aggregate(slice(syms, 2, size(syms) - 1),
       |  array(element_at(syms, 1)),
       |  (acc, s) -> CASE
       |    WHEN element_at(acc, -1) = ${lit1(p1)} AND s = ${lit1(p2)}
       |    THEN concat(slice(acc, 1, size(acc) - 1), array(${lit1(p1 + p2)}))
       |    ELSE concat(acc, array(s)) END)""".stripMargin

  /** Apply an ORDERED merge list to the corpus VOCABULARY: per distinct
    * token, the subword segmentation after replaying every merge in
    * induction order. All work is vocabulary-sized; each round is one
    * per-row fold, re-checkpointed so the expression tree stays flat
    * (the fold references `syms` three times — six stacked rounds
    * without a materialization boundary would grow the collapsed
    * projection ~3^6-fold).
    *
    * @return (tok, n_sub) — subword count per distinct token
    */
  def bpeApplyToVocab(docs: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    var vocab = docs.select(explode(toks(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("wf"))
      .withColumn("syms", split(col("tok"), ""))
      .checkpointEager()
    merges.foreach { case (p1, p2) =>
      vocab = vocab.withColumn("syms", expr(mergeFoldSql(p1, p2))).checkpointEager()
    }
    vocab.select(col("tok"), size(col("syms")).cast("long").as("n_sub"))
  }

  /** Tokenizer FERTILITY per group (subwords emitted per word — the
    * standard "how well does this vocabulary fit this language/domain"
    * diagnostic): induce `rounds` BPE merges on the corpus
    * ([[bpeMerges]]), segment the vocabulary under them, and join the
    * vocabulary-sized (token → subword-count) table back onto the
    * token stream — the corpus is never re-segmented row by row.
    * Fertility is exact integer micro (subwords·1e6 div words).
    */
  def bpeFertilityByGroup(docs: DataFrame, groupCol: String, textCol: String,
                          rounds: Int): DataFrame = {
    val merges = bpeMerges(docs, textCol, rounds)
      .orderBy(col("merge_round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val sub = bpeApplyToVocab(docs, textCol, merges)
    docs.select(col(groupCol).as("grp"), explode(toks(col(textCol))).as("tok"))
      .join(gatedBroadcast(sub), "tok")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
      .withColumn("fertility_micro", expr("n_subwords * 1000000 div n_words"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by how target-like its hashed-bigram profile is, for
    * importance resampling toward a target domain.
    *
    *  - features: bigram OCCURRENCES hashed into `buckets` buckets
    *    ([[graft.functions.PolyHash]] — DuckDB-reproducible, unlike
    *    xxhash64);
    *  - two Laplace-smoothed multinomials over buckets: target (docs
    *    matching `targetPred`) and raw (the whole corpus);
    *  - per-bucket log-ratio weight in micro-nats through the shared
    *    engine-exact shape `round(ln(int ratio) · 1e6)` (q92
    *    discipline: both engines ln() the identical double);
    *  - per-document score = Σ bucket-weight over its gram instances —
    *    an INTEGER sum, order-independent under distributed
    *    aggregation.
    *
    * Scale shape: one token explode feeds both the bucket-count fit
    * and the scoring join (recomputed, not persisted — corpus-sized
    * intermediates are never cached); the weight table is ≤ `buckets`
    * rows BY CONSTRUCTION, so its broadcast is bounded at any corpus
    * size (no gate needed); both groupBys partial-aggregate map-side.
    * Documents with fewer than two tokens have no bigrams and are
    * absent from the output (mirrored by the oracle's inner join).
    *
    * @return (id, n_grams, score_micro) per scoreable document
    */
  def dsirImportanceMicro(docs: DataFrame, idCol: String, textCol: String,
                          targetPred: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 hash buckets")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // materialize the gram ARRAYS before exploding (Generate re-derives
    // a derived array child per emitted row — the contaminationCounts
    // tax), and persist the exploded bucket stream because it feeds
    // both the multinomial fit and the scoring join (no cross-branch
    // CSE): the unmaterialized first cut benched 14 s vs 2 s at sf0.1
    val withGrams = docs.select(col(idCol).as("id"), targetPred.as("is_target"),
        TextAnalysis.gramsFromTokens(toks(col(textCol)), 2).as("gs"))
      .persist(lvl)
    val grams = withGrams
      .select(col("id"), col("is_target"), explode(col("gs")).as("g"))
      .select(col("id"), col("is_target"),
        pmod(graft.functions.PolyHash.polyHash(col("g")), lit(buckets.toLong)).as("b"))
      .persist(lvl)
    try {
      val bucketCounts = grams.groupBy(col("b")).agg(
        count(lit(1)).as("cr"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
      val totals = bucketCounts.agg(
        sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      val weights = bucketCounts.crossJoin(broadcast(totals))
        .select(col("b"),
          round((log((col("ct") + 1).cast("double") / (col("nt") + buckets).cast("double"))
               - log((col("cr") + 1).cast("double") / (col("nr") + buckets).cast("double")))
            * 1000000, 0).cast("long").as("w_micro"))
      grams.join(broadcast(weights), "b")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_grams"), sum(col("w_micro")).as("score_micro"))
        .checkpointEager()
    } finally { grams.unpersist(false); withGrams.unpersist(false) }
  }

  /** Per-GROUP unigram document NLL — [[docNll]] with one model per
    * group (the CCNet recipe fits one LM per language; scoring a
    * document against its own language's model is what makes the
    * perplexity comparable within that language). Counts aggregate per
    * (group, token); the group totals ride a window over the
    * vocabulary-sized count table partitioned by group — never the
    * token stream; scoring joins on (group, token) by plain
    * equi-shuffle (the per-group vocab union can exceed any broadcast
    * budget at corpus scale).
    *
    * @return (grp, id, n_tokens, sum_nll_micro, avg_nll_micro)
    */
  def docNllByGroup(docs: DataFrame, grpCol: String, idCol: String,
                    textCol: String): DataFrame = {
    val tokRows = Exec.widen(docs.select(col(grpCol).as("grp"),
        col(idCol).as("id"), toks(col(textCol)).as("toks")))
      .select(col("grp"), col("id"), explode(col("toks")).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = tokRows.groupBy(col("grp"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
        .select(col("grp"), col("tok"),
          round((log(col("n").cast("double")) - log(col("c").cast("double"))) * 1000000, 0)
            .cast("long").as("nll_micro"))
      tokRows.join(model, Seq("grp", "tok"))
        .groupBy(col("grp"), col("id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("nll_micro")).as("sum_nll_micro"))
        .select(col("grp"), col("id"), col("n_tokens"), col("sum_nll_micro"),
          round(col("sum_nll_micro").cast("double") / col("n_tokens"), 0)
            .cast("long").as("avg_nll_micro"))
        .checkpointEager()
    } finally tokRows.unpersist(false)
  }

  /** Per-group token KEYNESS: the k most distinctive tokens of each
    * group versus the rest of the corpus, scored by the Laplace-
    * smoothed log-likelihood ratio (the corpus-linguistics keyness /
    * Monroe log-odds family, in the same micro-nat integer shape as
    * [[naiveBayesClassify]]'s llr with the group as class 1 and the
    * rest as class 0):
    *
    *   score(w, g) = round((ln((c_g+1)/(n_g+V)) −
    *                        ln((c_r+1)/(n_r+V))) · 1e6)
    *
    * — "what words make source g sound like itself", the audit behind
    * mixing and contamination decisions. One (grp, tok) count pass;
    * global token totals join back on tok; the rank window runs per
    * group over the vocabulary-sized score table.
    *
    * @return (grp, rnk, tok, c_grp, c_rest, score_micro), rnk 1..k by
    *         (score desc, tok asc)
    */
  def keynessTopK(docs: DataFrame, grpCol: String, textCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = Exec.widen(docs.select(col(grpCol).as("grp"),
        toks(col(textCol)).as("toks")))
      .select(col("grp"), explode(col("toks")).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val byTok = counts.groupBy(col("tok")).agg(sum(col("c")).as("c_all"))
      val byGrp = counts.groupBy(col("grp")).agg(sum(col("c")).as("n_g"))
      val globals = counts.agg(sum(col("c")).as("n_all"),
        countDistinct(col("tok")).as("v"))
      val scored = counts
        .join(byTok, "tok")
        .join(broadcast(byGrp), "grp")
        .crossJoin(broadcast(globals))
        .select(col("grp"), col("tok"), col("c").as("c_grp"),
          (col("c_all") - col("c")).as("c_rest"),
          round((log((col("c") + 1).cast("double")
                / (col("n_g") + col("v")).cast("double"))
              - log((col("c_all") - col("c") + 1).cast("double")
                / (col("n_all") - col("n_g") + col("v")).cast("double")))
            * 1000000, 0).cast("long").as("score_micro"))
      scored
        .withColumn("rnk", row_number().over(Window.partitionBy(col("grp"))
          .orderBy(col("score_micro").desc, col("tok").asc)).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("grp"), col("rnk"), col("tok"), col("c_grp"),
          col("c_rest"), col("score_micro"))
        .checkpointEager()
    } finally counts.unpersist(false)
  }

  /** Pairwise Jensen–Shannon divergence between per-group unigram
    * distributions — the text-side domain-closeness map (embedding-side
    * twin: [[Similarity.groupCentroidCosines]]) that data-mixing work
    * reads before deciding which sources to merge, up-weight, or use as
    * mutual dedup blocks. JSD(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M=(P+Q)/2,
    * decomposed so every token is charged exactly once:
    *
    *  - token in both:  p·ln(2p/(p+q)) + q·ln(2q/(p+q))
    *  - token in one:   its probability mass · ln 2 (the KL limit),
    *    charged from the pair's exact leftover integer mass — never a
    *    per-token row for the absent side.
    *
    * Double sums over a vocabulary are partition-order-dependent, so
    * each per-token term is rounded to PICO units (1e-12; JSD ≤ ln 2 ≈
    * 0.69, so totals stay far inside 64 bits and per-term rounding
    * error is ≤ vocab·5e-13) and summed exactly as integers — the same
    * discipline as every micro-nat operator, two orders tighter because
    * the terms are probability-scaled.
    *
    * Scale shape: one token-count aggregation; the group totals ride a
    * window over the vocabulary-sized count table; the pair join is on
    * `tok` and fans out at most (groups choose 2) rows per token.
    * Group pairs sharing NO token are absent from the output (their
    * JSD is exactly ln 2).
    *
    * @return (grp_a, grp_b, n_a, n_b, vocab_both, jsd_pico), grp_a < grp_b
    */
  def jsDivergencePico(docs: DataFrame, grpCol: String,
                       textCol: String): DataFrame = {
    val counts = Exec.widen(docs.select(col(grpCol).as("grp"),
        toks(col(textCol)).as("toks")))
      .select(col("grp"), explode(col("toks")).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = counts.select(col("grp").as("grp_a"), col("tok"),
        col("c").as("ca"), col("n").as("na"))
      val b = counts.select(col("grp").as("grp_b"), col("tok"),
        col("c").as("cb"), col("n").as("nb"))
      val pa = col("ca").cast("double") / col("na").cast("double")
      val pb = col("cb").cast("double") / col("nb").cast("double")
      // the ½ of JSD = ½KL(P‖M) + ½KL(Q‖M) is folded into the pico
      // scale (5e11 = 1e12/2, an exact double), applied BEFORE rounding
      val term = round((pa * log(lit(2.0) * pa / (pa + pb))
          + pb * log(lit(2.0) * pb / (pa + pb))) * 5e11, 0).cast("long")
      def onlyTerm(n: Column, cBoth: Column): Column =
        round((n - cBoth).cast("double") / n.cast("double")
          * log(lit(2.0)) * 5e11, 0).cast("long")
      a.join(b, Seq("tok")).filter(col("grp_a") < col("grp_b"))
        .groupBy(col("grp_a"), col("grp_b"))
        .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
          count(lit(1)).as("vocab_both"),
          sum(col("ca")).as("ca_both"), sum(col("cb")).as("cb_both"),
          sum(term).as("s_both"))
        .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
          col("vocab_both"),
          (col("s_both") + onlyTerm(col("n_a"), col("ca_both"))
            + onlyTerm(col("n_b"), col("cb_both"))).as("jsd_pico"))
        .checkpointEager()
    } finally counts.unpersist(false)
  }

  /** Multinomial Naive Bayes document classifier — the fasttext-style
    * seed-trained quality/domain filter of the classic curation recipe
    * (train on a trusted seed vs the raw pool, score the whole corpus,
    * keep documents the classifier likes). Unlike [[dsirImportanceMicro]]
    * (hashed feature buckets, importance WEIGHTS over the whole fit
    * set), this fits an explicit-vocabulary model on the `trainPred`
    * subset only, carries a class PRIOR, scores every document —
    * including held-out ones whose tokens may be out-of-vocabulary —
    * and emits a hard prediction next to the gold label, so the
    * held-out rows double as the classifier's own accuracy audit.
    *
    * All model terms are the house micro-nat shape (`round(ln(·)·1e6)`
    * of exact integer ratios, Laplace +1 smoothing):
    *
    *   llr(w)  = round((ln((c1+1)/(n1+V)) − ln((c0+1)/(n0+V))) · 1e6)
    *   oov     = the same with c = 0
    *   prior   = round((ln d1 − ln d0) · 1e6)
    *   score(doc) = prior + Σ_tokens llr  (OOV tokens at the oov term)
    *
    * Scale shape: the vocabulary model broadcasts under the
    * [[BroadcastMaxRowsKey]] gate; token instances shuffle once into
    * the per-document aggregate; the five scalar constants ride a
    * broadcast 1-row cross join — nothing collects to the driver.
    *
    * @param labelPred gold class (the seed definition), evaluated per row
    * @param trainPred fit subset (e.g. a [[CorpusOps.hashSplit]] bucket)
    * @return (id, gold, is_train, n_tokens, n_oov, score_micro, pred)
    */
  def naiveBayesClassify(docs: DataFrame, idCol: String, textCol: String,
                         labelPred: Column, trainPred: Column): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tokRows = Exec.widen(docs.select(col(idCol).as("id"),
        labelPred.as("gold"), trainPred.as("is_train"),
        TextAnalysis.tokens(col(textCol)).as("toks")))
      .select(col("id"), col("gold"), col("is_train"),
        explode(col("toks")).as("tok"))
      .persist(lvl)
    try {
      val counts = tokRows.filter(col("is_train"))
        .groupBy(col("tok")).agg(
          sum(when(col("gold"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("gold"), 0L).otherwise(1L)).as("c0"))
        .persist(lvl)
      try {
        val docPriors = tokRows.filter(col("is_train"))
          .select(col("id"), col("gold")).distinct()
          .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("d1"),
            sum(when(col("gold"), 0L).otherwise(1L)).as("d0"))
        val consts = counts
          .agg(count(lit(1)).as("v"), sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
          .crossJoin(docPriors)
          .select(col("v"), col("n1"), col("n0"),
            round((log(lit(1.0) / (col("n1") + col("v")).cast("double"))
                 - log(lit(1.0) / (col("n0") + col("v")).cast("double")))
              * 1000000, 0).cast("long").as("oov_micro"),
            round((log(col("d1").cast("double")) - log(col("d0").cast("double")))
              * 1000000, 0).cast("long").as("prior_micro"))
        val model = gatedBroadcast(counts.crossJoin(broadcast(consts))
          .select(col("tok"),
            round((log((col("c1") + 1).cast("double") / (col("n1") + col("v")).cast("double"))
                 - log((col("c0") + 1).cast("double") / (col("n0") + col("v")).cast("double")))
              * 1000000, 0).cast("long").as("llr_micro")))
        tokRows
          .join(model, Seq("tok"), "left")
          .groupBy(col("id"), col("gold"), col("is_train"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("llr_micro").isNull, 1L).otherwise(0L)).as("n_oov"),
            sum(coalesce(col("llr_micro"), lit(0L))).as("s"))
          .crossJoin(broadcast(consts.select(col("oov_micro"), col("prior_micro"))))
          .select(col("id"), col("gold"), col("is_train"),
            col("n_tokens"), col("n_oov"),
            (col("prior_micro") + col("s") + col("n_oov") * col("oov_micro"))
              .as("score_micro"))
          .withColumn("pred", col("score_micro") >= 0)
          .checkpointEager()
      } finally counts.unpersist(false)
    } finally tokRows.unpersist(false)
  }

  /** Zipf rank–frequency fit per group: OLS of ln(freq) on ln(rank) over
    * the top `topR` token ranks — the corpus-health fingerprint (natural
    * text sits near slope −1; template/boilerplate slices drift off it).
    *
    * Numeric contract: ln values are rounded to micro-units the moment
    * they are produced, the five OLS sufficient statistics are exact
    * 64-bit integer sums of those micro values (order-independent), and
    * slope/intercept/R² divide the exact sums in double with one fixed
    * expression shape — bit-reproducible in any engine.
    *
    * Scale shape: one (grp, tok) count shuffle over the corpus, a
    * per-group window on the counts table for ranks, then all regression
    * math on ≤ topR rows per group.
    *
    * @return (grp, n_ranks, slope_micro, intercept_micro, r2_milli)
    */
  def zipfOls(docs: DataFrame, grpCol: String, textCol: String,
              topR: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(grpCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("c").desc, col("tok").asc)
    val pts = counts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topR)
      .withColumn("x", round(log(col("rnk").cast("double")) * 1000000, 0).cast("long"))
      .withColumn("y", round(log(col("c").cast("double")) * 1000000, 0).cast("long"))
    val s = pts.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    s.select(col("grp"), col("n").as("n_ranks"),
      when(den > 0, round(num / den * 1000000, 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("slope_micro"),
      when(den > 0,
        round((col("sy").cast("double") - num / den * col("sx").cast("double"))
          / col("n").cast("double"), 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("intercept_micro"),
      when(den > 0 && deny > 0,
        round(num * num / (den * deny) * 1000, 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("r2_milli"))
  }

  /** Heaps'-law fit per group: OLS of ln(vocab) on ln(tokens) over the
    * cumulative (tokens-seen, distinct-vocab) curve in id order — the
    * vocabulary-richness exponent (natural text β ≈ 0.7–0.9; template
    * slices flatten early). Log points are MILLI-units here (the
    * cumulative-token lns are larger than the rank lns of [[zipfOls]],
    * and milli keeps the integer sufficient statistics far from 64-bit
    * range at any corpus size); the OLS ratios are the same shared
    * double shapes.
    *
    * Shape: one (grp, tok) first-occurrence shuffle, one per-group
    * ordered window for the two running sums, regression math on the
    * per-doc points.
    *
    * @return (grp, n_points, tokens_total, vocab_total, slope_micro,
    *         r2_milli)
    */
  def heapsOls(docs: DataFrame, grpCol: String, idCol: String,
               textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(grpCol).as("grp"), col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("ntok", size(col("toks")).cast("long"))
    val firstOcc = base.select(col("grp"), col("id"), explode(col("toks")).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(min(col("id")).as("fid"))
    val newPerDoc = firstOcc.groupBy(col("grp"), col("fid").as("id"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val pts = base.select(col("grp"), col("id"), col("ntok"))
      .join(newPerDoc, Seq("grp", "id"), "left")
      .withColumn("cum_tok", sum(col("ntok")).over(w))
      .withColumn("cum_voc", sum(coalesce(col("n_new"), lit(0L))).over(w))
      .withColumn("x", round(log(col("cum_tok").cast("double")) * 1000, 0).cast("long"))
      .withColumn("y", round(log(col("cum_voc").cast("double")) * 1000, 0).cast("long"))
    val st = pts.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), max(col("cum_tok")).as("tokens_total"),
        max(col("cum_voc")).as("vocab_total"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    st.select(col("grp"), col("n").as("n_points"), col("tokens_total"),
      col("vocab_total"),
      when(den > 0, round(num / den * 1000000, 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("slope_micro"),
      when(den > 0 && deny > 0,
        round(num * num / (den * deny) * 1000, 0).cast("long"))
        .otherwise(lit(null).cast("long")).as("r2_milli"))
  }

  /** Per-document token attribution for the Naive Bayes label model:
    * the top-`k` tokens by absolute micro-nat log-likelihood ratio in
    * each panel document — "which words drove this classification",
    * the explainability view of the q244 classifier (same hash train
    * split, same Laplace LLR table).
    *
    * One model count pass, then a join of the panel docs' DISTINCT
    * tokens against the broadcast-sized model and a per-doc window.
    * Ordering (|llr| desc, llr desc, tok) is total.
    *
    * @return (id, rnk, tok, n_occ, llr_micro)
    */
  def tokenAttributionTopK(docs: DataFrame, idCol: String, textCol: String,
                           gold: Column, isTrain: Column, panel: Column,
                           k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("id"), gold.as("gold"),
      isTrain.as("is_train"), panel.as("in_panel"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val tokRows = base.select(col("id"), col("gold"), col("is_train"),
      col("in_panel"), explode(col("toks")).as("tok"))
    val counts = tokRows.filter(col("is_train"))
      .groupBy(col("tok"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0"))
    val consts = counts.agg(count(lit(1)).as("v"),
      sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    val model = counts.crossJoin(broadcast(consts))
      .select(col("tok"),
        round((log((col("c1") + 1).cast("double") / (col("n1") + col("v")).cast("double"))
          - log((col("c0") + 1).cast("double") / (col("n0") + col("v")).cast("double")))
          * 1000000, 0).cast("long").as("llr_micro"))
    val docToks = tokRows.filter(col("in_panel"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col("id"))
      .orderBy(abs(col("llr_micro")).desc, col("llr_micro").desc, col("tok").asc)
    docToks.join(model, "tok")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("tok"), col("n_occ"), col("llr_micro"))
  }

  /** Leave-one-source-out influence of every source on a Naive Bayes
    * label model — the data-valuation audit: train the token model on
    * the WHOLE corpus and on the corpus minus each source (closed-form:
    * complement counts are global minus per-source counts, no
    * retraining pass), score each source's own documents under both,
    * and report the accuracy delta. A strongly negative delta means the
    * source's labels are only supported by its own data — the
    * mislabeled/outlier-source signal.
    *
    * Laplace-smoothed micro-nat LLR terms over the COMPLEMENT vocab
    * size (tokens whose complement count is zero collapse to the OOV
    * term automatically — smoothing is uniform, no separate branch);
    * per-token terms are rounded to micro-nats then integer-summed
    * (the exact-sum discipline), priors from complement doc counts.
    *
    * Scale shape: one (tok) and one (tok, source) count shuffle, then a
    * single linear scoring pass over token rows joined to the two count
    * tables and a broadcast per-source constant row — O(corpus tokens)
    * total for ALL leave-one-out models at once.
    *
    * @return (source, n_docs, acc_full_milli, acc_loo_milli, delta_milli)
    */
  def sourceInfluenceNb(docs: DataFrame, idCol: String, textCol: String,
                        srcCol: String, gold: Column): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
      gold.as("gold"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val tokRows = base.select(col("id"), col("src"), col("gold"),
      explode(col("toks")).as("tok"))
    val counts = tokRows.groupBy(col("tok"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0"))
    val sCounts = tokRows.groupBy(col("tok"), col("src"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1s"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0s"))
    val glob = counts.agg(count(lit(1)).as("v"),
      sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    val docTotals = docs.select(gold.as("gold")).agg(
      sum(when(col("gold"), 1L).otherwise(0L)).as("d1"),
      sum(when(!col("gold"), 1L).otherwise(0L)).as("d0"))
    // per-source complement constants: token/doc totals and the
    // complement vocab (tokens the source doesn't monopolize)
    val lost = sCounts.join(counts, "tok")
      .filter(col("c1s") + col("c0s") === col("c1") + col("c0"))
      .groupBy(col("src")).agg(count(lit(1)).as("v_lost"))
    val srcConsts = sCounts.groupBy(col("src"))
      .agg(sum(col("c1s")).as("n1s"), sum(col("c0s")).as("n0s"))
      .join(docs.select(col(srcCol).as("src"), gold.as("gold"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("gold"), 1L).otherwise(0L)).as("d1s"),
          sum(when(!col("gold"), 1L).otherwise(0L)).as("d0s")),
        "src")
      .join(lost, Seq("src"), "left")
      .crossJoin(broadcast(glob)).crossJoin(broadcast(docTotals))
      .select(col("src"), col("n_docs"),
        (col("n1") - col("n1s")).as("n1c"), (col("n0") - col("n0s")).as("n0c"),
        (col("d1") - col("d1s")).as("d1c"), (col("d0") - col("d0s")).as("d0c"),
        (col("v") - coalesce(col("v_lost"), lit(0L))).as("vs"))
    def llr(c1: Column, n1: Column, c0: Column, n0: Column, vv: Column) =
      round((log((c1 + 1L).cast("double") / (n1 + vv).cast("double"))
        - log((c0 + 1L).cast("double") / (n0 + vv).cast("double")))
        * 1000000, 0).cast("long")
    val scored = tokRows
      .join(counts, "tok")
      .join(sCounts, Seq("tok", "src"))
      .join(broadcast(srcConsts), "src")
      .crossJoin(broadcast(glob))
      .withColumn("t_full", llr(col("c1"), col("n1"), col("c0"), col("n0"), col("v")))
      .withColumn("t_loo", llr(col("c1") - col("c1s"), col("n1c"),
        col("c0") - col("c0s"), col("n0c"), col("vs")))
      .groupBy(col("id"), col("src"), col("gold"))
      .agg(sum(col("t_full")).as("s_full"), sum(col("t_loo")).as("s_loo"))
    val priors = srcConsts.crossJoin(broadcast(docTotals))
      .select(col("src"),
        round((log(col("d1").cast("double")) - log(col("d0").cast("double")))
          * 1000000, 0).cast("long").as("p_full"),
        round((log(col("d1c").cast("double")) - log(col("d0c").cast("double")))
          * 1000000, 0).cast("long").as("p_loo"))
    scored.join(broadcast(priors), "src")
      .withColumn("pred_full", col("p_full") + col("s_full") >= 0)
      .withColumn("pred_loo", col("p_loo") + col("s_loo") >= 0)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(when(col("pred_full") === col("gold"), 1L).otherwise(0L))
          .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
          .cast("long").as("acc_full_milli"),
        round(sum(when(col("pred_loo") === col("gold"), 1L).otherwise(0L))
          .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
          .cast("long").as("acc_loo_milli"))
      .withColumn("delta_milli", col("acc_loo_milli") - col("acc_full_milli"))
      .select(col("src").as("source"), col("n_docs"), col("acc_full_milli"),
        col("acc_loo_milli"), col("delta_milli"))
  }

  /** Interpolated Kneser–Ney bigram scoring by source: the classic
    * smoothed LM the backoff model (q131) approximates —
    * `p(w|v) = (max(c(vw) − D, 0) + D · N1+(v·) · N1+(·w) / T) / c(v)`
    * with absolute discount D and continuation counts, trained on the
    * `id % panelMod != 0` split and scored on the held-out panel.
    * Bigrams whose context v never opened a training bigram or whose w
    * never closed one are counted as OOV, not scored (their KN mass is
    * undefined without a unigram backoff level).
    *
    * One exploded-bigram aggregation builds the model; scoring joins
    * the PANEL bigram counts (not instances) against the model tables
    * on their natural keys. Per-(v,w) micro-nats are rounded before
    * the weighted integer sum.
    *
    * @return (source, n_scored, n_oov, kn_nll_micro)
    */
  def knBigramNllBySource(docs: DataFrame, idCol: String, textCol: String,
                          srcCol: String, panelMod: Int = 7,
                          discount: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(srcCol).as("source"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    def pairsOf(df: DataFrame): DataFrame = df
      .withColumn("pr", explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("v"), b.as("w")))))
      .select(col("id"), col("source"), col("pr.v").as("v"), col("pr.w").as("w"))

    val train = pairsOf(base.filter(col("id") % panelMod =!= 0))
    val cvw = train.groupBy(col("v"), col("w"))
      .agg(count(lit(1)).as("c_vw")).persist()
    try {
    val cv = cvw.groupBy(col("v"))
      .agg(sum(col("c_vw")).as("c_v"), count(lit(1)).as("n1_v"))
    val contw = cvw.groupBy(col("w")).agg(count(lit(1)).as("cont_w"))
    val tTypes = cvw.agg(count(lit(1)).as("tt"))

    val panel = pairsOf(base.filter(col("id") % panelMod === 0))
      .groupBy(col("source"), col("v"), col("w"))
      .agg(count(lit(1)).as("b_c"))
    val scored = panel
      .join(cv, Seq("v"), "left")
      .join(contw, Seq("w"), "left")
      .join(cvw, Seq("v", "w"), "left")
      .crossJoin(broadcast(tTypes))
      .withColumn("oov", col("c_v").isNull || col("cont_w").isNull)
      .withColumn("p",
        (greatest(coalesce(col("c_vw"), lit(0L)).cast("double") - discount,
          lit(0.0))
          + lit(discount) * col("n1_v").cast("double")
            * col("cont_w").cast("double") / col("tt").cast("double"))
          / col("c_v").cast("double"))
      .withColumn("t_micro",
        when(col("oov"), lit(0L))
          .otherwise(round(-log(col("p")) * 1000000.0, 0).cast("long")))
    scored.groupBy(col("source"))
      .agg(sum(when(!col("oov"), col("b_c")).otherwise(0L)).as("n_scored"),
        sum(when(col("oov"), col("b_c")).otherwise(0L)).as("n_oov"),
        sum(col("t_micro") * col("b_c")).as("t_sum"))
      .select(col("source"), col("n_scored"), col("n_oov"),
        when(col("n_scored") > 0L,
          round(col("t_sum").cast("double") / col("n_scored").cast("double"), 0)
            .cast("long")).otherwise(lit(null).cast("long")).as("kn_nll_micro"))
      .checkpointEager()
    } finally cvw.unpersist(false)
  }

  /** K-fold cross-validation of the complement-count NB classifier in
    * ONE scoring pass: fold = id mod k; each fold's model is the
    * closed-form complement (global counts minus the fold's counts —
    * the [[sourceInfluenceNb]] trick with folds as the held-out unit),
    * so "train k models, score k held-out folds" costs one token-count
    * aggregation plus one scoring join, never k passes.
    *
    * @return (fold, n_docs, acc_milli) one row per fold
    */
  def crossValNb(docs: DataFrame, idCol: String, textCol: String,
                 gold: Column, k: Int = 5): DataFrame = {
    require(k >= 2 && k <= 64, "fold count out of range")
    // persist the scan-level projection and both count tables: six
    // downstream branches reference them, and without the persists each
    // branch re-scans the corpus (the PlanAuditSpec scan-count gate)
    val base = docs.select(col(idCol).as("id"),
      pmod(col(idCol), lit(k)).cast("long").as("fold"),
      gold.as("gold"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .persist()
    val tokRows = base.select(col("fold"), col("gold"),
      explode(col("toks")).as("tok"))
    val fCounts = tokRows.groupBy(col("tok"), col("fold"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1f"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0f"))
      .persist()
    val counts = fCounts.groupBy(col("tok"))
      .agg(sum(col("c1f")).as("c1"), sum(col("c0f")).as("c0"))
      .persist()
    try {
    val glob = counts.agg(count(lit(1)).as("v"),
      sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    val docTotals = base.agg(
      sum(when(col("gold"), 1L).otherwise(0L)).as("d1"),
      sum(when(!col("gold"), 1L).otherwise(0L)).as("d0"))
    val lost = fCounts.join(counts, "tok")
      .filter(col("c1f") + col("c0f") === col("c1") + col("c0"))
      .groupBy(col("fold")).agg(count(lit(1)).as("v_lost"))
    val foldConsts = fCounts.groupBy(col("fold"))
      .agg(sum(col("c1f")).as("n1f"), sum(col("c0f")).as("n0f"))
      .join(base.groupBy(col("fold")).agg(
        sum(when(col("gold"), 1L).otherwise(0L)).as("d1f"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("d0f")), "fold")
      .join(lost, Seq("fold"), "left")
      .crossJoin(broadcast(glob)).crossJoin(broadcast(docTotals))
      .select(col("fold"),
        (col("n1") - col("n1f")).as("n1c"), (col("n0") - col("n0f")).as("n0c"),
        (col("d1") - col("d1f")).as("d1c"), (col("d0") - col("d0f")).as("d0c"),
        (col("v") - coalesce(col("v_lost"), lit(0L))).as("vc"))
    def llr(c1: Column, n1: Column, c0: Column, n0: Column, vv: Column) =
      round((log((c1 + 1L).cast("double") / (n1 + vv).cast("double"))
        - log((c0 + 1L).cast("double") / (n0 + vv).cast("double")))
        * 1000000, 0).cast("long")
    val scored = base
      .select(col("id"), col("fold"), col("gold"), explode(col("toks")).as("tok"))
      .join(counts, "tok")
      .join(fCounts, Seq("tok", "fold"), "left")
      .na.fill(0L, Seq("c1f", "c0f"))
      .join(broadcast(foldConsts), "fold")
      .withColumn("t_cv", llr(col("c1") - col("c1f"), col("n1c"),
        col("c0") - col("c0f"), col("n0c"), col("vc")))
      .groupBy(col("id"), col("fold"), col("gold"))
      .agg(sum(col("t_cv")).as("s_cv"))
    val priors = foldConsts
      .select(col("fold"),
        round((log((col("d1c") + 1L).cast("double"))
          - log((col("d0c") + 1L).cast("double"))) * 1000000, 0)
          .cast("long").as("p_cv"))
    scored.join(broadcast(priors), "fold")
      .withColumn("pred", col("p_cv") + col("s_cv") >= 0)
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(when(col("pred") === col("gold"), 1L).otherwise(0L))
          .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
          .cast("long").as("acc_milli"))
      .checkpointEager()
    } finally {
      base.unpersist(false); fCounts.unpersist(false); counts.unpersist(false)
    }
  }

  /** Dirichlet-smoothed query-likelihood retrieval (the third classic
    * ranking model beside TF-IDF q183 and BM25 q165):
    * `score(q,d) = Σ_w qtf·ln(1 + c(w,d)·N/(μ·c(w))) + |q|·ln(μ/(|d|+μ))`
    * — the matched-term decomposition, so the corpus joins only
    * through the inverted index on the query's terms; the per-doc
    * length term closes the score on the (queries × docs) grid, which
    * is bounded by the query panel. Queries are the first `qLen`
    * tokens of every `id % qMod == 0` document.
    *
    * @return (q_id, rnk, doc_id, score_micro) top-`k` docs per query
    */
  def dirichletQlTopK(docs: DataFrame, idCol: String, textCol: String,
                      qMod: Int = 50, qLen: Int = 4, mu: Long = 100L,
                      k: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val tf = base.select(col("id"), explode(col("toks")).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      .persist()
    try {
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val cw = tf.groupBy(col("tok")).agg(sum(col("tf")).as("c_w"))
    val tot = cw.agg(sum(col("c_w")).as("nn"))

    val qrows = base.filter(col("id") % qMod === 0)
      .select(col("id").as("q_id"),
        explode(slice(col("toks"), lit(1), lit(qLen))).as("tok"))
      .groupBy(col("q_id"), col("tok")).agg(count(lit(1)).as("qtf"))
    val qlen = qrows.groupBy(col("q_id")).agg(sum(col("qtf")).as("q_len"))

    val matched = qrows
      .join(tf.select(col("id").as("doc_id"), col("tok"), col("tf")), "tok")
      .join(cw, "tok").crossJoin(broadcast(tot))
      .withColumn("t_micro", col("qtf") *
        round(log(lit(1.0) + col("tf").cast("double") * col("nn").cast("double")
          / (lit(mu.toDouble) * col("c_w").cast("double"))) * 1000000.0, 0)
          .cast("long"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("t_micro")).as("m_sum"))
    val grid = qlen.crossJoin(dl.select(col("id").as("doc_id"), col("dl")))
      .join(matched, Seq("q_id", "doc_id"), "left")
      .na.fill(0L, Seq("m_sum"))
      .withColumn("score_micro", col("m_sum") + col("q_len") *
        round(log(lit(mu.toDouble) / (col("dl").cast("double") + mu.toDouble))
          * 1000000.0, 0).cast("long"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    grid.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc_id"), col("score_micro"))
      .checkpointEager()
    } finally tf.unpersist(false)
  }

  /** Laplace-smoothing hyperparameter sweep for the NB screen in ONE
    * dataflow: the per-token LLR table is built once per alpha by
    * crossing the vocab-sized count table with the (tiny) alpha grid,
    * so "train and evaluate the classifier at 5 smoothing strengths"
    * is one corpus aggregation + one panel-scoring join with a ×|grid|
    * fan-out on BOUNDED tables — the grid-search shape that never
    * rescans the data per configuration.
    *
    * @param alphasMicro smoothing strengths in micro units
    * @return (alpha_micro, n_docs, acc_milli) per grid point
    */
  def alphaSweepNb(docs: DataFrame, idCol: String, textCol: String,
                   gold: Column, alphasMicro: Seq[Long],
                   panelMod: Int = 7): DataFrame = {
    require(alphasMicro.nonEmpty && alphasMicro.size <= 64,
      "alpha grid out of range")
    require(alphasMicro.forall(_ > 0L), "alpha must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("id"), gold.as("gold"),
      TextAnalysis.tokens(col(textCol)).as("toks")).persist()
    val train = base.filter(col("id") % panelMod =!= 0)
    val panel = base.filter(col("id") % panelMod === 0)
    val counts = train.select(col("gold"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0"))
      .persist()
    try {
    val glob = counts.agg(count(lit(1)).as("v"),
      sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    val prior = train.agg(
      round((log((sum(when(col("gold"), 1L).otherwise(0L)) + 1L).cast("double"))
        - log((sum(when(!col("gold"), 1L).otherwise(0L)) + 1L).cast("double")))
        * 1000000, 0).cast("long").as("p_micro"))
    val alphas = alphasMicro.toDF("alpha_micro")
    val a = col("alpha_micro").cast("double") / lit(1000000.0)
    val terms = counts.crossJoin(broadcast(alphas)).crossJoin(broadcast(glob))
      .select(col("tok"), col("alpha_micro"),
        round((log((col("c1").cast("double") + a)
            / (col("n1").cast("double") + a * col("v").cast("double")))
          - log((col("c0").cast("double") + a)
            / (col("n0").cast("double") + a * col("v").cast("double"))))
          * 1000000, 0).cast("long").as("t_micro"))
    val scored = panel.select(col("id"), col("gold"), explode(col("toks")).as("tok"))
      .join(terms, "tok")
      .groupBy(col("id"), col("gold"), col("alpha_micro"))
      .agg(sum(col("t_micro")).as("s_sum"))
    scored.crossJoin(broadcast(prior))
      .withColumn("pred", col("p_micro") + col("s_sum") >= 0L)
      .groupBy(col("alpha_micro"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(when(col("pred") === col("gold"), 1L).otherwise(0L))
          .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
          .cast("long").as("acc_milli"))
      .checkpointEager()
    } finally { base.unpersist(false); counts.unpersist(false) }
  }

  /** Hill-number diversity profile per slice: effective token counts
    * at orders q = 0 (richness), 1 (exp of Shannon entropy), 2
    * (inverse Simpson) — the ecology-standard spectrum, read here as
    * "how many effective token types does each source really use".
    * Entropy terms micro-rounded then integer-summed; the two
    * exponentials/ratios are shared-shape doubles.
    *
    * @return (source, n_tokens, hill0, hill1_milli, hill2_milli)
    */
  def hillDiversity(docs: DataFrame, textCol: String,
                    srcCol: String): DataFrame = {
    val tc = docs.select(col(srcCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n_st"))
    val withTot = tc.withColumn("n_s",
      sum(col("n_st")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))))
    withTot
      .withColumn("h_term",
        round(-(col("n_st").cast("double") / col("n_s").cast("double"))
          * log(col("n_st").cast("double") / col("n_s").cast("double"))
          * 1000000.0, 0).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("hill0"),
        sum(col("h_term")).as("h_sum"),
        sum(col("n_st") * col("n_st")).as("sq_sum"))
      .select(col("source"), col("n_tokens"), col("hill0"),
        round(exp(col("h_sum").cast("double") / lit(1000000.0)) * 1000.0, 0)
          .cast("long").as("hill1_milli"),
        round(col("n_tokens").cast("double") * col("n_tokens").cast("double")
          / col("sq_sum").cast("double") * 1000.0, 0).cast("long")
          .as("hill2_milli"))
  }

  /** NB learning curve in one pass: training shards are the id-hash
    * buckets `id mod m < j` for j = 1..m (nested prefixes, so shard j's
    * model is the CUMULATIVE sum of per-bucket count tables — built by
    * a bounded running sum over the bucket index, never by re-scanning
    * the corpus per point); every curve point scores the same held-out
    * panel. The "is more data still buying accuracy" audit.
    *
    * @param m number of curve points (and training buckets)
    * @return (train_frac_pct, n_train_docs, acc_milli) per point
    */
  def learningCurveNb(docs: DataFrame, idCol: String, textCol: String,
                      gold: Column, m: Int = 5,
                      panelMod: Int = 7): DataFrame = {
    require(m >= 2 && m <= 20, "curve points out of range")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("id"), gold.as("gold"),
      TextAnalysis.tokens(col(textCol)).as("toks")).persist()
    val train = base.filter(col("id") % panelMod =!= 0)
      .withColumn("bkt", pmod(expr("id div " + panelMod), lit(m)).cast("long"))
    val panel = base.filter(col("id") % panelMod === 0)

    val bCounts = train.select(col("bkt"), col("gold"),
        explode(col("toks")).as("tok"))
      .groupBy(col("tok"), col("bkt"))
      .agg(sum(when(col("gold"), 1L).otherwise(0L)).as("c1b"),
        sum(when(!col("gold"), 1L).otherwise(0L)).as("c0b"))
      .persist()
    try {
    // cumulative (token, j) counts via the bounded bucket window
    val wTok = Window.partitionBy(col("tok")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumTok = bCounts
      .withColumn("c1c", sum(col("c1b")).over(wTok))
      .withColumn("c0c", sum(col("c0b")).over(wTok))
    // a token enters the model at its FIRST bucket; later curve points
    // must still see it — expand each cumulative row to every j ≥ bkt
    val jGrid = (0 until m).map(_.toLong).toDF("j")
    val tokJ = cumTok.join(broadcast(jGrid), col("j") >= col("bkt"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("tok"), col("j")).orderBy(col("bkt").desc)))
      .filter(col("rn") === 1)
      .select(col("tok"), col("j"), col("c1c"), col("c0c"))
    // per-point constants: vocab, token mass, doc counts
    val consts = tokJ.groupBy(col("j"))
      .agg(count(lit(1)).as("v"), sum(col("c1c")).as("n1"),
        sum(col("c0c")).as("n0"))
      .join(train.groupBy(col("bkt")).agg(
          count(lit(1)).as("nd"),
          sum(when(col("gold"), 1L).otherwise(0L)).as("d1b"),
          sum(when(!col("gold"), 1L).otherwise(0L)).as("d0b"))
        .withColumn("j", col("bkt"))
        .select(col("j"), col("nd"), col("d1b"), col("d0b"))
        .withColumn("n_train", sum(col("nd")).over(Window.orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("d1", sum(col("d1b")).over(Window.orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("d0", sum(col("d0b")).over(Window.orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("j"), col("n_train"), col("d1"), col("d0")), "j")
      .withColumn("p_micro",
        round((log((col("d1") + 1L).cast("double"))
          - log((col("d0") + 1L).cast("double"))) * 1000000, 0).cast("long"))
    val terms = tokJ.join(broadcast(consts.select(col("j"), col("v"),
        col("n1"), col("n0"))), "j")
      .select(col("tok"), col("j"),
        round((log((col("c1c") + 1L).cast("double")
            / (col("n1") + col("v")).cast("double"))
          - log((col("c0c") + 1L).cast("double")
            / (col("n0") + col("v")).cast("double"))) * 1000000, 0)
          .cast("long").as("t_micro"))
    val scored = panel.select(col("id"), col("gold"), explode(col("toks")).as("tok"))
      .join(terms, "tok")
      .groupBy(col("id"), col("gold"), col("j"))
      .agg(sum(col("t_micro")).as("s_sum"))
    scored.join(broadcast(consts.select(col("j"), col("n_train"), col("p_micro"))), "j")
      .withColumn("pred", col("p_micro") + col("s_sum") >= 0L)
      .groupBy(col("j"), col("n_train"))
      .agg(round(sum(when(col("pred") === col("gold"), 1L).otherwise(0L))
          .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
        .cast("long").as("acc_milli"))
      .select(expr(s"(j + 1) * 100 div $m").as("train_frac_pct"),
        col("n_train").as("n_train_docs"), col("acc_milli"))
      .checkpointEager()
    } finally { base.unpersist(false); bCounts.unpersist(false) }
  }

  /** Count-based word embeddings in-engine: ±`window` co-occurrence
    * counts → PPMI weights → a `dim`-dimensional hash-sign projection
    * (component k of word w = Σ_c sgn(c,k)·PPMI(w,c), signs from a
    * nonlinear parity of the context's poly-hash — the rand()-free
    * random-projection that sketches the PPMI matrix row without ever
    * materializing |V|² of it), then exact-integer cosine neighbors
    * for the most frequent probe words. The classical distributional
    * baseline the dense `embeddings` table gets compared against.
    *
    * Scale: co-occurrence pairs are a linear explode (window ≤ 2);
    * the ×`dim` fan-out applies to the PPMI table (weights, not text);
    * probes are a bounded panel, so the neighbor join is panel ×
    * vocab, never vocab².
    *
    * @return (probe, rnk, neighbor, cos_micro) top-`topK` per probe
    */
  def ppmiWordNeighbors(docs: DataFrame, textCol: String, dim: Int = 16,
                        window: Int = 2, probes: Int = 5,
                        topK: Int = 5): DataFrame = {
    require(dim >= 2 && dim <= 64 && window >= 1 && window <= 4,
      "projection shape out of range")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("l"))
    val pairSets = (1 to window).map { o =>
      toks.select(explode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - o),
        slice(col("l"), lit(1 + o), size(col("l")) - o),
        (a, b) => struct(a.as("w"), b.as("c")))).as("pr"))
        .select(col("pr.w").as("w"), col("pr.c").as("c"))
    }
    val directed = pairSets.reduce(_ unionAll _)
    val pairs = directed.unionAll(directed.select(col("c").as("w"), col("w").as("c")))
    val nwc = pairs.groupBy(col("w"), col("c")).agg(count(lit(1)).as("n_wc"))
      .checkpointEager()
    val nw = nwc.groupBy(col("w")).agg(sum(col("n_wc")).as("n_w"))
      .checkpointEager()
    val tot = nw.agg(sum(col("n_w")).as("nn"))
    val ppmi = nwc
      .join(nw, "w")
      .join(nw.select(col("w").as("c"), col("n_w").as("n_c")), "c")
      .crossJoin(broadcast(tot))
      .select(col("w"), col("c"),
        // MILLI, not micro: v components sum |contexts| weights and the
        // cosine squares them — micro weights would push v² past the
        // signed-64 range on a large vocabulary
        greatest(lit(0L),
          round(log(col("n_wc").cast("double") * col("nn").cast("double")
            / (col("n_w").cast("double") * col("n_c").cast("double")))
            * 1000.0, 0).cast("long")).as("ppmi_milli"))
      .filter(col("ppmi_milli") > 0L)
    val dims = spark.range(0, dim).toDF("k")
    // sign: nonlinear parity of the context hash crossed with k (the
    // slicedWasserstein lesson: linear-in-inputs parities collapse)
    val comps = ppmi.crossJoin(broadcast(dims))
      .withColumn("hc", graft.functions.PolyHash.polyHash(col("c")))
      .withColumn("sgn", when(
        (col("hc") * (col("k") + 3L) + (col("k") + 11L) * 12345L)
          % 1000003L % 2L === 0L, 1L).otherwise(-1L))
      .groupBy(col("w"), col("k"))
      .agg(sum(col("sgn") * col("ppmi_milli")).as("v"))
      .checkpointEager()
    // TakeOrdered head, not a vocab-wide global window
    val probeWords = nw.orderBy(col("n_w").desc, col("w").asc)
      .limit(probes).select(col("w").as("probe"))
    val pv = comps.join(broadcast(probeWords), col("w") === col("probe"))
      .select(col("probe"), col("k"), col("v").as("pv"))
    val dots = pv.join(comps.select(col("w").as("neighbor"), col("k"), col("v")),
        "k")
      .groupBy(col("probe"), col("neighbor"))
      .agg(sum(col("pv") * col("v")).as("dot"))
    val norms = comps.groupBy(col("w"))
      .agg(sum(col("v") * col("v")).as("nsq"))
    val cos = dots
      .join(norms.select(col("w").as("probe"), col("nsq").as("na")), "probe")
      .join(norms.select(col("w").as("neighbor"), col("nsq").as("nb")), "neighbor")
      .filter(col("probe") =!= col("neighbor"))
      .select(col("probe"), col("neighbor"),
        round(col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
          * 1000000.0, 0).cast("long").as("cos_micro"))
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy(col("probe"))
      .orderBy(col("cos_micro").desc, col("neighbor").asc)
    cos.withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("probe"), col("rnk"), col("neighbor"), col("cos_micro"))
  }

  /** word2vec-style negative-sampling table + frequency subsampling
    * rates: sampling weight ∝ cf^0.75 (the unigram smoothing that
    * lifts rare words), keep probability `min(1, √(t/f))` (Mikolov's
    * frequent-word subsample at threshold `t`). The per-token pow is
    * micro-rounded to an integer BEFORE the vocabulary sum — a direct
    * double Σ over the vocab would be partition-order-dependent; the
    * integer sum is exact, and the closing shares are shared-shape
    * doubles.
    *
    * @param tMilli subsample threshold in milli units (1 = 1e-3)
    * @return (tok, cf, p_micro, keep_micro) — top `topK` by cf
    */
  def negativeSamplingTable(docs: DataFrame, textCol: String,
                            topK: Int, tMilli: Long = 1L): DataFrame = {
    require(topK >= 1 && tMilli >= 1, "bad parameters")
    val cf = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val withW = cf.withColumn("wm",
      round(pow(col("c").cast("double"), 0.75) * 1000000.0, 0).cast("long"))
    val tot = withW.agg(sum(col("c")).as("tot"), sum(col("wm")).as("swm"))
    withW.crossJoin(broadcast(tot))
      .select(col("tok"), col("c").as("cf"),
        round(col("wm").cast("double") * 1000000.0
          / col("swm").cast("double"), 0).cast("long").as("p_micro"),
        round(least(lit(1.0),
          sqrt(lit(tMilli.toDouble) / 1000.0
            / (col("c").cast("double") / col("tot").cast("double"))))
          * 1000000.0, 0).cast("long").as("keep_micro"))
      .orderBy(col("cf").desc, col("tok").asc).limit(topK)
  }

  /** Corpus-level BLEU-2 and ROUGE-1 over candidate/reference text
    * pairs, grouped — the n-gram overlap metrics a generation-eval or
    * paraphrase-mining pass needs. Standard corpus-BLEU semantics:
    * clipped n-gram matches `Σ min(cnt_cand(g), cnt_ref(g))` and
    * candidate totals are summed across ALL pairs of a group BEFORE
    * the precision ratios, brevity penalty `exp(1 − r/c)` when the
    * candidate corpus is shorter, geometric mean of p1 and p2.
    * ROUGE-1 recall = unigram matches over reference length.
    *
    * Everything is an exact integer sum until the closing per-group
    * double chain (ln/exp shared-shape from integer operands — the
    * q92/q101 convention); groups with zero uni- or bigram matches
    * report bleu = 0.
    *
    * Scale shape: grams explode per pair and collapse by
    * (group, pair, gram) hash aggregates; the clip is an inner join of
    * the two count tables on that key — linear in gram volume, never
    * quadratic; group closings run on a |groups|-sized table.
    *
    * @param pairs (grpCol, pairCol, candCol text, refCol text)
    * @return (grp, n_pairs, c_len, r_len, m1, m2, bleu_micro,
    *         rouge1_micro)
    */
  def bleuRougeByGroup(pairs: DataFrame, grpCol: String, pairCol: String,
                       candCol: String, refCol: String): DataFrame = {
    // checkpoint the shallow shared input (tokenize once — five
    // consumers), return the result LAZILY so the caller's action gets
    // full AQE (the round-9 materialization lesson)
    val base = pairs.select(col(grpCol).as("grp"), col(pairCol).as("pid"),
        TextAnalysis.tokens(col(candCol)).as("cl"),
        TextAnalysis.tokens(col(refCol)).as("rl"))
      .checkpointEager()
    locally {
      def counts(tokCol: String, n: Int, out: String): DataFrame = base
        .select(col("grp"), col("pid"),
          TextAnalysis.gramsFromTokens(col(tokCol), n).as("gs"))
        .select(col("grp"), col("pid"), explode(col("gs")).as("g"))
        .groupBy(col("grp"), col("pid"), col("g"))
        .agg(count(lit(1)).as(out))
      def clipped(n: Int): DataFrame = counts("cl", n, "cc")
        .join(counts("rl", n, "rc"), Seq("grp", "pid", "g"))
        .groupBy(col("grp"))
        .agg(sum(least(col("cc"), col("rc"))).as(s"m$n"))
      val lens = base.groupBy(col("grp"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(size(col("cl")).cast("long")).as("c_len"),
          sum(size(col("rl")).cast("long")).as("r_len"),
          sum(greatest(size(col("cl")).cast("long") - 1L, lit(0L)))
            .as("c2_len"))
      val joined = lens
        .join(clipped(1), Seq("grp"), "left")
        .join(clipped(2), Seq("grp"), "left")
        .na.fill(0L, Seq("m1", "m2"))
      def d(c: String) = col(c).cast("double")
      val bp = when(col("c_len") >= col("r_len"), lit(1.0d))
        .otherwise(exp(lit(1.0d) - d("r_len") / d("c_len")))
      val bleu = bp * exp((log(d("m1") / d("c_len"))
        + log(d("m2") / d("c2_len"))) / 2.0d)
      joined.select(col("grp"), col("n_pairs"), col("c_len"), col("r_len"),
        col("m1"), col("m2"),
        when(col("m1") === 0L || col("m2") === 0L || col("c_len") === 0L
            || col("c2_len") === 0L, lit(0L))
          .otherwise(round(bleu * 1000000.0d, 0).cast("long"))
          .as("bleu_micro"),
        when(col("r_len") === 0L, lit(0L))
          .otherwise(round(d("m1") * 1000000.0d / d("r_len"), 0)
            .cast("long")).as("rouge1_micro"))
    }
  }
}
