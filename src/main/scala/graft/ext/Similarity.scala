package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Baseline: brute-force cosine top-k — a query×corpus join. With Q query
  * vectors it is a broadcast (nested-loop) join — the corpus never
  * shuffles — plus one window top-k; exact, and the right tool when Q is
  * small.
  *
  * Scale path: random-hyperplane LSH — deterministic pseudo-random
  * planes (integer LCG, engine-independent), sign-bit bucket key,
  * candidates restricted to same-bucket rows across `tables` independent
  * hash tables (equi-join on (table, bucket)), then exact re-rank of the
  * candidate set. Corpus passes: one narrow projection per table
  * (linear), bucket-local joins after.
  *
  * Eval-cost notes: norms are projected ONCE per row before any pair
  * join (a per-pair `cosine(a,b)` would fold each row's self-dot
  * millions of times), and tiny inputs are widened to the session
  * parallelism before the quadratic stages (single-row-group local
  * files otherwise serialize the whole computation).
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

  /** HOF formulation — kept as the readable reference; the operators use
    * the native codegen expression below, which matches it bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native fused kernel (graft.functions.CosineSim): one primitive loop
    * per pair inside whole-stage codegen.
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosineSim(a, b)

  private def widen(df: DataFrame): DataFrame = Exec.widen(df)

  private def prep(df: DataFrame, idOut: String, embOut: String): DataFrame =
    widen(df.select(col("vec_id").as(idOut), col("embedding").as(embOut)))

  /** Exact top-k neighbors by cosine for each query row (self-matches on
    * equal ids excluded). Ranking key is (rounded cosine desc, id asc) so
    * rank order is engine-stable.
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = prep(queries, "q_id", "q_emb")
    val c = prep(corpus, "n_id", "n_emb")
    val j = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("sim", graft.core.Exact.r6(cosineNative(col("q_emb"), col("n_emb"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    j.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Two-stage ANN with int8 candidate scoring: stage 1 ranks every
    * corpus vector by the INTEGER dot product of per-vector-scaled int8
    * codes (exact 64-bit arithmetic — engine-reproducible, no float
    * accumulation order to worry about) and keeps `cands` candidates
    * per query; stage 2 reranks only those by exact cosine. The scale
    * story: the codes table is ~4× smaller than float32 (memory
    * bandwidth is the brute-force bottleneck) and the expensive exact
    * kernel touches `cands` rows per query instead of the corpus.
    * Ranking keys (idot desc, id) and (sim desc, id) are total orders.
    */
  def int8RerankKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    cands: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    def coded(df: DataFrame, id: String, emb: String, code: String) = {
      val p = prep(df, id, emb)
      p.withColumn(code, int8Quantize(col(emb), maxAbs(col(emb))))
    }
    val q = coded(queries, "q_id", "q_emb", "q_code")
    val c = coded(corpus, "n_id", "n_emb", "n_code")
    val idot = aggregate(
      zip_with(col("q_code"), col("n_code"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val w1 = Window.partitionBy(col("q_id")).orderBy(col("idot").desc, col("n_id").asc)
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("idot", idot)
      .withColumn("crank", row_number().over(w1))
      .filter(col("crank") <= cands)
      .withColumn("sim", graft.core.Exact.r6(cosineNative(col("q_emb"), col("n_emb"))))
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("idot"), col("sim"))
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

  /** (id, emb, bkts) projection with all `tables` bucket keys as ONE
    * array column — materialized by the caller before exploding:
    * Generate re-evaluates a derived-array child per EMITTED row, so
    * posexploding the raw bucket expression recomputes every table's
    * nBits·dim projection folds `tables` times over.
    */
  private def withBuckets(df: DataFrame, embCol: String, dim: Int, nBits: Int,
                          tables: Int): DataFrame =
    df.withColumn("bkts", array((0 until tables).map(t =>
      lshBucket(col(embCol), dim, nBits, t)): _*))

  private def explodeBuckets(df: DataFrame): DataFrame =
    df.select(col("*"), posexplode(col("bkts")).as(Seq("t", "bucket"))).drop("bkts")

  /** LSH-bucketed ANN: same-bucket candidates in any of `tables` hash
    * tables, exact cosine re-rank, top-k per query. Approximate — recall
    * depends on (nBits, tables). EAGER: the whole search executes inside
    * this call (the bucket projections are cached during the run and
    * released before returning); the returned table is a materialized
    * local-checkpoint scan — callers composing further filters trim the
    * result, not the search, and the checkpoint blocks live until the
    * RDD is GC'd (same contract as minHashLshPairs).
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
             nBits: Int = 8, tables: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val qb0 = withBuckets(prep(queries, "q_id", "q_emb"), "q_emb", dim, nBits, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb0 = withBuckets(prep(corpus, "n_id", "n_emb"), "n_emb", dim, nBits, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cands = explodeBuckets(qb0).join(explodeBuckets(cb0), Seq("t", "bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("q_emb"), col("n_id"), col("n_emb"))
        .dropDuplicates("q_id", "n_id")
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
      cands
        .withColumn("sim", graft.core.Exact.r6(cosineNative(col("q_emb"), col("n_emb"))))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
        .checkpointEager()
    } finally { qb0.unpersist(false); cb0.unpersist(false) }
  }

  /** Multi-probe LSH ANN: like [[lshKnn]], but each query ALSO probes
    * every bucket at Hamming distance 1 from its own (flip each of the
    * nBits plane signs) — the classic recall lever that trades
    * (nBits+1)× more query-side candidates for extra hash TABLES
    * (which would cost corpus-side index space instead; queries are the
    * cheap side). Corpus bucketing is unchanged, so the same index
    * serves both probe policies; q140-style [[recallAtK]] quantifies
    * the gain. Deterministic and oracle-expressible: probes are plain
    * XORs of the integer bucket.
    */
  def lshKnnMultiProbe(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                       nBits: Int = 8, tables: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val qb0 = withBuckets(prep(queries, "q_id", "q_emb"), "q_emb", dim, nBits, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb0 = withBuckets(prep(corpus, "n_id", "n_emb"), "n_emb", dim, nBits, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probes = explodeBuckets(qb0)
        .select(col("*"), explode(array((lit(0L) +:
          (0 until nBits).map(p => lit(1L << p))): _*)).as("flip"))
        .withColumn("bucket", col("bucket").bitwiseXOR(col("flip")))
        .drop("flip")
      val cands = probes.join(explodeBuckets(cb0), Seq("t", "bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("q_emb"), col("n_id"), col("n_emb"))
        .dropDuplicates("q_id", "n_id")
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
      cands
        .withColumn("sim", graft.core.Exact.r6(cosineNative(col("q_emb"), col("n_emb"))))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
        .checkpointEager()
    } finally { qb0.unpersist(false); cb0.unpersist(false) }
  }

  /** Symmetric int8 embedding quantization — the 4× storage/bandwidth
    * cut a 100 TB embedding corpus takes before indexing. Per-vector
    * scale = max|x|; q_i = clamp(round(x_i · 127 / scale), ±127); the
    * arithmetic is plain double ops + HALF_UP rounding, so an external
    * engine reproduces every code exactly. Zero vectors quantize to all
    * zeros. Callers project `maxAbs` as a column first (bound
    * attribute), then feed it to the per-element steps.
    */
  def maxAbs(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  def int8Quantize(emb: Column, maxabs: Column): Column =
    transform(emb, x =>
      when(maxabs === 0.0, lit(0))
        .otherwise(greatest(lit(-127.0),
          least(lit(127.0), round(x.cast("double") * 127.0 / maxabs, 0))))
        .cast("int"))

  /** Portable integer fold over the quantized codes (shifted to [0,254]
    * so the fold stays non-negative in any engine).
    */
  def int8Checksum(q: Column): Column =
    aggregate(q, lit(0L), (acc, v) =>
      pmod(acc * 31L + (v + 127).cast("long"), lit(1000000007L)))

  /** Mean absolute dequantization error — the quality metric that
    * decides whether int8 is acceptable for a given corpus.
    */
  def dequantMae(emb: Column, q: Column, maxabs: Column): Column =
    aggregate(zip_with(emb, q, (x, qq) =>
      abs(x.cast("double") - qq.cast("double") * maxabs / 127.0)),
      lit(0.0), (acc, v) => acc + v) / size(q)

  /** SemDeDup-style semantic near-duplicate pairs at corpus scale:
    * [[IvfIndex]] k-means cells as the blocking key — build the
    * deterministic coarse quantizer, assign every vector to its best
    * cell, emit cosine ≥ threshold pairs WITHIN each cell. Linear
    * assignment passes + per-cell quadratic verify; cross-cell
    * near-dups are missed by construction (the documented approximation
    * — exactly the trade the SemDeDup recipe makes, with recall set by
    * kCells). The cell self-join is SALTED like the exact-Jaccard block
    * join: a join keyed on the cell alone has as many tasks as cells,
    * so one fat cell would serialize the cluster; salting spreads each
    * cell over `salts` tasks while emitting every pair exactly once.
    *
    * EAGER, same contract as [[lshKnn]]: the assignment is persisted
    * for the two join branches and released before returning; the
    * result is a materialized local-checkpoint scan.
    */
  def semanticDupPairs(spark: org.apache.spark.sql.SparkSession,
                       corpus: DataFrame, threshold: Double,
                       kCells: Int = 16, salts: Int = 8): DataFrame = {
    // salts = 0 would not error: the a-side pmod yields NULL, the b-side
    // sequence(0, -1) never matches it, and every pair silently vanishes
    require(salts >= 1, "salts must be >= 1")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val centroids = IvfIndex.materializeLocal(spark,
      IvfIndex.buildCentroids(spark, corpus, kCells))
    val vecs = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cells = IvfIndex.assign(vecs, centroids).join(vecs, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = cells.select(col("cid"), col("id").as("id_a"), col("emb").as("emb_a"))
        .withColumn("salt", pmod(xxhash64(col("id_a")), lit(salts.toLong)))
      val b = cells.select(col("cid"), col("id").as("id_b"), col("emb").as("emb_b"))
        .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
      a.join(b, Seq("cid", "salt"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", graft.core.Exact.r6(cosineNative(col("emb_a"), col("emb_b"))))
        .filter(col("sim") >= threshold)
        .select(col("id_a"), col("id_b"), col("sim"))
        .checkpointEager()
    } finally cells.unpersist(false)
  }

  /** kNN-graph construction over the whole corpus — every vector's top-k
    * most-similar neighbors, the backbone structure for graph-based
    * curation (kNN label propagation, local outlier factors, hubness
    * filters). Same IVF-cell blocking as [[semanticDupPairs]]: neighbors
    * are searched WITHIN each vector's coarse-quantizer cell (the
    * documented SemDeDup-style approximation — recall set by kCells),
    * so the quadratic work drops by ~kCells while assignment stays
    * linear. The cell self-join is salted for the same reason as there:
    * one fat cell must not serialize the cluster. Top-k per node is a
    * window over the joined candidates — ordering on the ROUNDED
    * similarity (ties to the lower neighbor id) so rank is reproducible
    * across engines.
    *
    * EAGER: the assignment is persisted for the two join branches and
    * released; the result is a materialized local-checkpoint scan.
    */
  def knnGraph(spark: org.apache.spark.sql.SparkSession,
               corpus: DataFrame, k: Int,
               kCells: Int = 16, salts: Int = 8): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val centroids = IvfIndex.materializeLocal(spark,
      IvfIndex.buildCentroids(spark, corpus, kCells))
    val vecs = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cells = IvfIndex.assign(vecs, centroids).join(vecs, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = cells.select(col("cid"), col("id").as("vec_id"), col("emb").as("emb_a"))
        .withColumn("salt", pmod(xxhash64(col("vec_id")), lit(salts.toLong)))
      val b = cells.select(col("cid"), col("id").as("n_id"), col("emb").as("emb_b"))
        .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("n_id").asc)
      a.join(b, Seq("cid", "salt"))
        .filter(col("vec_id") =!= col("n_id"))
        .withColumn("sim", graft.core.Exact.r6(cosineNative(col("emb_a"), col("emb_b"))))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("vec_id"), col("rank"), col("n_id"), col("sim"))
        .checkpointEager()
    } finally cells.unpersist(false)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within a blocking
    * column (exact within block).
    */
  def cosineDupPairs(df: DataFrame, idCol: String, embCol: String,
                     blockCols: Seq[String], threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = widen(df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+ col(embCol).as("emb"): _*))
    val a = Seq("id" -> "id_a", "emb" -> "emb_a")
      .foldLeft(base) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
    val b = Seq("id" -> "id_b", "emb" -> "emb_b")
      .foldLeft(base) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.core.Exact.r6(cosineNative(col("emb_a"), col("emb_b"))))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Retrieval-quality report: per-query recall@k of an approximate
    * top-k result against the exact one — the acceptance gate an ANN
    * index must pass before it replaces brute force in a pipeline. Both
    * inputs are (q_id, n_id, …) top-k frames ([[bruteForceKnn]],
    * [[lshKnn]], [[IvfIndex.ivfKnn]]); output is one row per query:
    * (q_id, n_exact, n_hit, recall_micro). A left semi join + two
    * O(queries·k) aggregations — evaluation never rescans the corpus.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val ex = exact.select(col("q_id"), col("n_id"))
    val hit = ex.join(approx.select(col("q_id"), col("n_id")),
        Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    ex.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(hit, Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_micro", expr("n_hit * 1000000 div n_exact"))
  }

  /** Reciprocal-rank fusion of several per-query top-k lists — the
    * standard way to combine retrievers with incomparable scores
    * (exact + ANN, lexical + dense, …): each list contributes
    * `1/(k0 + rank)` per hit; candidates are re-ranked by the sum.
    * Terms are micro-rounded INDIVIDUALLY from the integer rank, so the
    * fused score is an order-independent integer sum — reproducible at
    * any parallelism and in any engine. One union + one groupBy + one
    * per-query window; never touches the underlying corpora.
    *
    * @param lists (q_id, rank, n_id, …) frames, ranks 1-based
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Int, k: Int): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val terms = lists.map(_.select(col("q_id"), col("n_id"),
        round(lit(1000000.0) / (lit(k0.toLong) + col("rank")), 0)
          .cast("long").as("t")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_micro").desc, col("n_id").asc)
    terms.groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("t")).as("score_micro"))
      .withColumn("rrf_rank", row_number().over(w).cast("long"))
      .filter(col("rrf_rank") <= k)
      .select(col("q_id"), col("rrf_rank"), col("n_id"), col("score_micro"))
  }

  /** Weighted SCORE fusion of several per-query top-k lists — the
    * score-aware companion to [[rrfFuse]] (rank-only): each list's
    * scores are min-max normalized PER QUERY to [0, 1e6] integer micro
    * units, then combined as a weighted sum (CombSUM with per-retriever
    * weights — the "cross-encoder says 2×, lexical says 1×" fusion a
    * two-stage retrieve-rerank stack runs). Normalization is integer
    * end-to-end — `(s - min) * 1e6 div (max - min)`, a degenerate
    * one-score list maps to 1e6 — so the fused score is an
    * order-independent integer and reproducible in any engine.
    *
    * Scale shape: each list is already a per-query top-k (k rows per
    * query); the min/max window, the union, and the fuse groupBy all
    * partition by q_id — queries × k rows end to end, never the
    * corpora.
    *
    * @param lists (frame, weight) pairs; frames carry (q_id, n_id, sim)
    *              with `sim` the r6-rounded cosine the retrievers emit
    */
  def scoreFuse(lists: Seq[(DataFrame, Long)], k: Int): DataFrame = {
    require(lists.nonEmpty, "need at least one scored list")
    val normed = lists.map { case (df, weight) =>
      val wq = Window.partitionBy(col("q_id"))
      df.select(col("q_id"), col("n_id"),
          round(col("sim") * 1000000, 0).cast("long").as("sm"))
        .withColumn("mn", min(col("sm")).over(wq))
        .withColumn("mx", max(col("sm")).over(wq))
        .select(col("q_id"), col("n_id"),
          (lit(weight) * when(col("mx") > col("mn"),
              expr("(sm - mn) * 1000000 div (mx - mn)"))
            .otherwise(lit(1000000L))).as("t"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_micro").desc, col("n_id").asc)
    normed.groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("t")).as("score_micro"))
      .withColumn("fuse_rank", row_number().over(w).cast("long"))
      .filter(col("fuse_rank") <= k)
      .select(col("q_id"), col("fuse_rank"), col("n_id"), col("score_micro"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell &
    * Goldstein 1998) — the de-duplicating reranker RAG retrieval runs
    * so the k passages are not k paraphrases: greedy selection of
    * `score(d) = lamNum·rel(d) − (10−lamNum)·max_{s∈S} sim(d, s)`
    * over an m-candidate pool from the exact retriever. Everything is
    * integer micro units (rel and pairwise sims from r6 cosines), ties
    * break to the lower id, and the selection rounds are UNROLLED
    * relational stages (k is small by definition) — argmax per round
    * is the partial-aggregating `min(struct(-score, id))` idiom, so no
    * window over the candidate stream and nothing driver-side.
    *
    * Scale shape: the pool is m rows per query and the diversity table
    * m·(m−1); every stage joins/aggregates on q_id. The corpus is
    * touched once, inside [[bruteForceKnn]].
    *
    * @return (q_id, sel_order 1..k, n_id, mmr_micro) — round 1's score
    *         is `lamNum·rel` (S is empty; the standard convention)
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, k: Int, m: Int,
              lamNum: Int = 7): DataFrame = {
    require(k >= 1 && m >= k, s"need 1 <= k <= m, got k=$k m=$m")
    require(lamNum >= 0 && lamNum <= 10, s"lamNum $lamNum out of [0,10]")
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val lam = lamNum.toLong
    val cands = bruteForceKnn(queries, corpus, m)
      .select(col("q_id"), col("n_id"),
        round(col("sim") * 1000000, 0).cast("long").as("rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ce = widen(corpus.select(col("vec_id").as("n_id"),
        col("embedding").as("emb")))
      val withEmb = cands.join(ce, "n_id")
      val pa = withEmb.select(col("q_id"), col("n_id").as("a"), col("emb").as("ea"))
      val pb = withEmb.select(col("q_id"), col("n_id").as("b"), col("emb").as("eb"))
      val psim = pa.join(pb, Seq("q_id")).filter(col("a") =!= col("b"))
        .withColumn("dsim",
          round(graft.core.Exact.r6(cosineNative(col("ea"), col("eb"))) * 1000000, 0)
            .cast("long"))
        .select(col("q_id"), col("a"), col("b"), col("dsim"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // round 1: pure relevance
        var sel = cands
          .groupBy(col("q_id"))
          .agg(min(struct((-lit(lam) * col("rel")).as("negs"),
            col("n_id").as("nid"))).as("p"))
          .select(col("q_id"), lit(1L).as("sel_order"),
            col("p.nid").as("n_id"), (-col("p.negs")).as("mmr_micro"))
        for (r <- 2 to k) {
          val remaining = cands.join(sel.select(col("q_id"), col("n_id")),
            Seq("q_id", "n_id"), "left_anti")
          val div = psim
            .join(sel.select(col("q_id"), col("n_id").as("b")), Seq("q_id", "b"))
            .groupBy(col("q_id"), col("a"))
            .agg(max(col("dsim")).as("maxdiv"))
            .withColumnRenamed("a", "n_id")
          val pick = remaining.join(div, Seq("q_id", "n_id"))
            .withColumn("score",
              lit(lam) * col("rel") - lit(10L - lam) * col("maxdiv"))
            .groupBy(col("q_id"))
            .agg(min(struct((-col("score")).as("negs"),
              col("n_id").as("nid"))).as("p"))
            .select(col("q_id"), lit(r.toLong).as("sel_order"),
              col("p.nid").as("n_id"), (-col("p.negs")).as("mmr_micro"))
          sel = sel.unionByName(pick)
        }
        sel.checkpointEager()
      } finally { psim.unpersist(false); () }
    } finally { cands.unpersist(false); () }
  }

  /** Pairwise-similarity distribution estimate WITHOUT the O(n²) cross
    * join — the "how duplicated is this corpus?" diagnostic run before
    * committing to a dedup pass. Every vector draws a pseudo-random
    * bucket from the mixed PolyHash of its id (the square-then-affine
    * mix from [[Sketches]] — raw poly31 is near-order-preserving on
    * short numeric keys and would pair only id-adjacent vectors);
    * within-bucket pairs are an unbiased-ish uniform pair sample of
    * expected size n²/(2·nBuckets), and their exact cosines land in
    * fixed-width micro-unit bins. Scale nBuckets ∝ n to hold the
    * sampled-pair budget constant while the corpus grows.
    *
    * Everything is engine-portable: the mix is integer arithmetic, the
    * cosine is the shared rounded shape, bins are positive integer
    * division.
    */
  def pairSampleSimHistogram(df: DataFrame, idCol: String, embCol: String,
                             nBuckets: Int = 32,
                             binMicro: Long = 100000L): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val P = 1000000007L
    val h0 = graft.functions.PolyHash.polyHash(col(idCol).cast("string"))
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      pmod(pmod(h0 * h0, lit(P)) * 1103515245L + 12345L, lit(P)).mod(nBuckets.toLong)
        .as("bkt"))
    val a = base.select(col("bkt"), col("id").as("id_a"), col("emb").as("emb_a"))
    val b = base.select(col("bkt"), col("id").as("id_b"), col("emb").as("emb_b"))
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim_micro",
        round(graft.core.Exact.r6(cosineNative(col("emb_a"), col("emb_b"))) * 1000000, 0)
          .cast("long"))
      .withColumn("bin", expr(s"(sim_micro + 1000000) div $binMicro"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
  }

  /** Mean-pool chunk embeddings into one vector per group (RAG-style
    * doc embedding from chunk embeddings, or class centroids): per
    * dimension, the EXACT integer-micro-unit mean — `sum(round(x·1e6))
    * / count / 1e6` — the same bit-reproducible mean the IVF centroids
    * use ([[IvfIndex]]), so any engine recomputes it. Output is LONG
    * rows `(group, pos, pooled)` rather than a repacked array — scalar
    * columns keep the cross-engine compare exact and feed the next
    * matrix op directly.
    *
    * One posexplode + one groupBy(group, pos): dims multiply the row
    * count by a constant (64 here), partial aggregation combines
    * map-side — linear at any corpus size.
    */
  def meanPoolMicro(df: DataFrame, groupCol: String, embCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos").cast("long").as("pos"))
      .agg((sum(round(col("x").cast("double") * 1000000, 0).cast("long"))
        / count(lit(1)) / 1000000.0).cast("float").as("pooled"))

  /** Squared L2 distance in exact integer micro-units: the
    * left-to-right double fold over per-dimension squared deltas,
    * rounded once at the end — the engine-stable distance key for
    * argmax selection (raw doubles would make farthest-point ties
    * engine-dependent).
    */
  def sqDistMicro(a: Column, b: Column): Column =
    round(aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v) * 1000000, 0).cast("long")

  /** Greedy k-center coreset (farthest-point traversal, Gonzalez 1985)
    * — the diversity-sampling selection a curation pipeline runs to
    * pick k maximally-spread exemplars (dedup seeds, eval probes,
    * annotation batches): seed with the smallest id, then repeatedly
    * take the candidate FARTHEST from its nearest already-chosen
    * center. The classic 2-approximation to the k-center objective.
    *
    * Deterministic end to end: distances are integer micro-units
    * ([[sqDistMicro]]), argmax ties break to the smaller id.
    *
    * Scale shape: the per-round work is ONE linear pass updating each
    * candidate's running min-distance against the single new center (a
    * broadcast-literal comparison — no join, no shuffle) plus a
    * TakeOrdered(1) argmax; k rounds total, k single-row collects
    * (bounded driver traffic, the bpeMerges/IvfIndex contract). The
    * candidate set is never materialized per pair.
    *
    * @return (sel_order, vec_id, d_micro) — d_micro is the candidate's
    *         min-distance at selection time (NULL for the seed)
    */
  def kCenterCoreset(df: DataFrame, idCol: String, embCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = widen(df.select(col(idCol).as("id"), col(embCol).as("emb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = base.count() // also materializes the persist
      val seedArr = base.orderBy(col("id").asc).limit(1).collect()
      if (seedArr.isEmpty) {
        // empty input: the 0-center coreset, not an exception
        Seq.empty[(Long, Long, Option[Long])]
          .toDF("sel_order", "vec_id", "d_micro")
      } else {
        val seed = seedArr(0)
        var centers =
          List[(Long, Long, Option[Long])]((1L, seed.getLong(0), None))
        var selected = Set(seed.getLong(0))
        var centerEmb = seed.getSeq[Float](1)
        var cur = base
        var j = 2
        var exhausted = false
        // `selected.size < total` under-counts when ids repeat (total
        // counts ROWS); the per-round empty check below is the real
        // termination guard — a partial coreset, never an exception.
        // Design bound: each round stacks one typedlit distance column
        // and an isin literal list, so the plan grows O(k) — built for
        // small k (coreset seeding), not k in the thousands.
        while (j <= k && selected.size < total && !exhausted) {
          cur = cur.withColumn("mind",
            if (j == 2) sqDistMicro(col("emb"), typedlit(centerEmb))
            else least(col("mind"), sqDistMicro(col("emb"), typedlit(centerEmb))))
          val nextArr = cur.filter(!col("id").isin(selected.toSeq: _*))
            .orderBy(col("mind").desc, col("id").asc).limit(1)
            .select(col("id"), col("mind"), col("emb")).collect()
          if (nextArr.isEmpty) exhausted = true
          else {
            val next = nextArr(0)
            centers = (j.toLong, next.getLong(0), Some(next.getLong(1))) :: centers
            selected += next.getLong(0)
            centerEmb = next.getSeq[Float](2)
            j += 1
          }
        }
        centers.reverse.toDF("sel_order", "vec_id", "d_micro")
      }
    } finally base.unpersist(false)
  }

  /** Per-group embedding DISPERSION: every row's cosine affinity to its
    * own group centroid, aggregated per group — the intra-source
    * diversity report read next to [[groupCentroidCosines]]'s
    * inter-source map (a tight source may be redundant boilerplate; a
    * diffuse one may be mislabeled or need sub-clustering). Centroids
    * are the exact micro-int means (the Lloyd-step discipline);
    * per-row cosines round to micro BEFORE aggregating, so the group
    * mean is an exact integer division of an exact integer sum —
    * order-independent in any engine.
    *
    * One posexplode pass for centroids, then one broadcast join of the
    * groups-sized centroid table back onto the rows.
    *
    * @return (grp, n_rows, mean_cos_micro, min_cos_micro, max_cos_micro)
    */
  def groupDispersion(df: DataFrame, grpCol: String, embCol: String): DataFrame = {
    val dims = df
      .select(col(grpCol).as("grp"), posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(sum(round(col("x").cast("double") * 1000000, 0).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("c", round(col("s").cast("double") / col("n"), 0).cast("long"))
    val cents = dims.groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cent"))
    df.select(col(grpCol).as("grp"), col(embCol).as("emb"))
      .join(broadcast(cents), "grp")
      .withColumn("cos_micro",
        round(cosine(col("emb").cast("array<double>"),
          col("cent").cast("array<double>")) * 1000000, 0).cast("long"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("cos_micro")).cast("double") / count(lit(1)), 0)
          .cast("long").as("mean_cos_micro"),
        min(col("cos_micro")).as("min_cos_micro"),
        max(col("cos_micro")).as("max_cos_micro"))
  }

  /** Inter-group embedding similarity map: the per-group centroid of
    * the embedding column, then the cosine between every group pair —
    * the "how close are my sources/domains in embedding space" summary
    * that drives mixing and dedup-blocking decisions. Centroid
    * components are exact integer micro-sums divided at the end
    * (order-independent — the [[IvfIndex]] Lloyd-step discipline), so
    * the pairwise cosine fold sees identical inputs in every engine.
    *
    * Scale shape: one posexplode + groupBy(grp, dim) partial-sum pass
    * over the corpus; everything after (centroid assembly, the pair
    * join) runs on the GROUPS-sized table — the pair join is quadratic
    * only in the number of groups, and broadcasts.
    *
    * @return (grp_a, grp_b, n_a, n_b, cos_micro), grp_a < grp_b
    */
  def groupCentroidCosines(df: DataFrame, grpCol: String,
                           embCol: String): DataFrame = {
    val dims = df
      .select(col(grpCol).as("grp"), posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(sum(round(col("x").cast("double") * 1000000, 0).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("c", round(col("s").cast("double") / col("n"), 0).cast("long"))
    val cents = dims.groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          e => e.getField("c")).as("cent"),
        min(col("n")).as("n_rows"))
    val a = cents.select(col("grp").as("grp_a"), col("cent").as("ca"),
      col("n_rows").as("n_a"))
    val b = cents.select(col("grp").as("grp_b"), col("cent").as("cb"),
      col("n_rows").as("n_b"))
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("cos_micro",
        round(cosine(col("ca").cast("array<double>"),
          col("cb").cast("array<double>")) * 1000000, 0).cast("long"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("cos_micro"))
  }

  /** Deterministic mixup augmentation over an embedding column: each
    * vector is blended with its rank-successor (`λ·a + (1−λ)·b`, λ a
    * pure LCG function of the id) — the embedding-side twin of
    * [[CorpusOps.tokenDropout]]. Pairing goes through a global
    * two-phase rank rather than id arithmetic, so it holds on
    * non-contiguous ids; the blend is exact integer micro arithmetic
    * with one shared round-of-double per component, summarized by an
    * integer checksum + min/max so the oracle certifies the whole
    * mixed vector without hauling arrays through the compare.
    *
    * @return (id, partner_id, lambda_milli, n_dims, checksum_micro,
    *         min_micro, max_micro)
    */
  def mixupAugment(df: DataFrame, embCol: String): DataFrame = {
    val rows = Exec.widen(df.select(col("vec_id").as("id"),
      transform(col(embCol),
        x => round(x.cast("double") * 1000000, 0).cast("long")).as("am")))
    val ranked = graft.ops.Ranks.twoPhaseRank(
      rows.withColumn("__g", lit(1)), "__g", Seq("id"), "r").drop("__g")
    val n = ranked.agg(count(lit(1)).as("n_total"))
    val a = ranked.select(col("id"), col("am"), col("r"))
    val b = ranked.select(col("id").as("partner_id"), col("am").as("bm"),
      col("r").as("rb"))
    a.crossJoin(broadcast(n))
      .withColumn("pr", pmod(col("r"), col("n_total")) + 1L)
      .join(b, col("pr") === col("rb"))
      .withColumn("lambda_milli",
        pmod(col("id") * 1103515245L + 12345L, lit(1000000007L)) % 1000L)
      .withColumn("mix", zip_with(col("am"), col("bm"), (x, y) =>
        round((col("lambda_milli") * x + (lit(1000L) - col("lambda_milli")) * y)
          .cast("double") / 1000.0, 0).cast("long")))
      .select(col("id"), col("partner_id"), col("lambda_milli"),
        size(col("mix")).cast("long").as("n_dims"),
        aggregate(col("mix"), lit(0L), (acc, v) => acc + v).as("checksum_micro"),
        array_min(col("mix")).as("min_micro"),
        array_max(col("mix")).as("max_micro"))
  }

  /** LSH banding planner: for every (bands b, rows r) factorization of
    * `nHashes`, the S-curve P(candidate | sim s) = 1 − (1 − s^r)^b
    * integrated on a fixed 100-point midpoint grid, split at the
    * target `threshold` into a false-positive area (candidates below
    * threshold) and a false-negative area (misses above it) — the
    * design table that picks (b, r) for [[minHashLshPairs]] before a
    * 100-TB run commits to a banding. Pure bounded computation
    * (|divisors| × 100 rows); per-point terms micro-rounded then
    * integer-summed, engine-identically.
    *
    * @return (b, r, fp_micro, fn_micro, total_micro) ordered by b
    */
  def lshPlan(spark: org.apache.spark.sql.SparkSession, nHashes: Int = 128,
              threshold: Double = 0.7): DataFrame = {
    require(nHashes >= 1, "nHashes must be positive")
    import spark.implicits._
    val cands = (1 to nHashes).filter(nHashes % _ == 0)
      .map(b => (b.toLong, (nHashes / b).toLong)).toDF("b", "r")
    val grid = spark.range(0, 100).toDF("i")
      .select(((col("i") * 2 + 1).cast("double") / lit(200.0)).as("s"))
    cands.crossJoin(grid)
      .withColumn("pm",
        round((lit(1.0) - pow(lit(1.0) - pow(col("s"), col("r").cast("double")),
          col("b").cast("double"))) * 1000000.0, 0).cast("long"))
      .groupBy(col("b"), col("r"))
      .agg(
        sum(when(col("s") < threshold, col("pm")).otherwise(0L)).as("fp_sum"),
        sum(when(col("s") >= threshold, lit(1000000L) - col("pm"))
          .otherwise(0L)).as("fn_sum"))
      .select(col("b"), col("r"),
        round(col("fp_sum").cast("double") / lit(100.0), 0).cast("long")
          .as("fp_micro"),
        round(col("fn_sum").cast("double") / lit(100.0), 0).cast("long")
          .as("fn_micro"))
      .withColumn("total_micro", col("fp_micro") + col("fn_micro"))
  }
}
