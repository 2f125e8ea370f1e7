package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * orders of magnitude smaller than the corpus at any scale — so it
  * broadcasts; the corpus side stays a linear explode + partial-agg
  * groupBy on doc id. Nothing shuffles token instances twice.
  */
object LangModel {

  private def toks(textCol: Column): Column = TextAnalysis.tokens(textCol)

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
    val model = broadcast(tokenNll(docs, col(textCol)))
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
    val idf = broadcast(
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
}
