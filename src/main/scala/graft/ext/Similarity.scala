package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Baseline: brute-force cosine top-k — a query×corpus join. With Q query
  * vectors it is a broadcast join (no shuffle of the corpus) and one
  * window top-k; exact, and the right tool when Q is small.
  *
  * Scale path: random-hyperplane LSH — deterministic pseudo-random
  * planes (integer LCG, engine-independent), sign-bit bucket key,
  * candidates restricted to same-bucket rows across `tables` independent
  * hash tables, then exact re-rank of the candidate set. Corpus passes:
  * one narrow projection per table (linear), bucket-local joins after.
  */
object Similarity {

  /** Sequential-fold double-precision dot product of two equal-length
    * float arrays (cast to double first; left-to-right accumulation, so
    * bit-identical to any engine folding the same way).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for each query row (self-matches on
    * equal ids excluded). Ranking key is (rounded cosine desc, id asc) so
    * rank order is engine-stable.
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val j = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .join(corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        col("q_id") =!= col("n_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("n_emb")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    j.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * LCG over the flat index, mapped to [-0.5, 0.5). Pure integer
    * arithmetic — reproducible in any engine.
    */
  private def planeComponent(flatIdx: Column): Column =
    (pmod(flatIdx * 1103515245L + 12345L, lit(1000L)).cast("double") / 1000.0) - 0.5

  /** Sign-bit bucket of `emb` under `nBits` hyperplanes of table `t`. */
  def lshBucket(emb: Column, dim: Int, nBits: Int, table: Int): Column = {
    val bits = (0 until nBits).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)), (x, i) =>
          x.cast("double") * planeComponent(lit(table.toLong * 100000L) + lit(p.toLong) * lit(1000L) + i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: same-bucket candidates in any of `tables` hash
    * tables, exact cosine re-rank, top-k per query. Approximate — recall
    * depends on (nBits, tables).
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
             nBits: Int = 8, tables: Int = 4): DataFrame = {
    val qb = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), lshBucket(col("embedding"), dim, nBits, t).as("b"))): _*)).as("tb"))
    val cb = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), lshBucket(col("embedding"), dim, nBits, t).as("b"))): _*)).as("tb"))
    val cands = qb.join(cb, qb("tb") === cb("tb") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_emb"), col("n_id"), col("n_emb"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    cands.withColumn("sim", round(cosine(col("q_emb"), col("n_emb")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within a blocking
    * column (exact within block).
    */
  def cosineDupPairs(df: DataFrame, idCol: String, embCol: String,
                     blockCols: Seq[String], threshold: Double): DataFrame = {
    val base = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      col(embCol).as("emb"): _*)
    val cond = (blockCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a.id") < col("b.id"))).reduce(_ && _)
    base.as("a").join(base.as("b"), cond)
      .withColumn("sim", round(cosine(col("a.emb"), col("b.emb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}
