package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantizer scale path alongside the hyperplane-LSH variant:
  *
  *  1. centroids: k seed vectors (lowest ids — deterministic) refined by
  *     ONE Lloyd step whose per-dimension means are exact integer
  *     micro-sums (order-independent, so the index is bit-reproducible
  *     at any parallelism);
  *  2. assignment: every corpus vector to its max-cosine centroid — a
  *     corpus × centroids join (k is small) + min_by argmax;
  *  3. search: a query probes its nProbe closest centroids and re-ranks
  *     only those inverted lists exactly.
  *
  * Corpus passes are linear; the quadratic work drops by ~k/nProbe. All
  * stages are DataFrame ops — the centroid table is O(k·dim) and always
  * broadcast.
  */
object IvfIndex {

  private def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.CosineSim.cosineSim(a, b)

  /** Assign each (id, emb) row to its best centroid by cosine. */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("aff", cos(col("emb"), col("cemb")))
      .groupBy(col("id"))
      .agg(max_by(col("cid"), struct(col("aff"), -col("cid"))).as("cid"))

  /** k seeds (lowest vec_ids) refined by `iters` exact-integer-mean
    * Lloyd steps (default 1 — the oracle-checked configuration; more
    * steps converge the quantizer further and stay bit-reproducible,
    * they just need a longer oracle CTE chain). A cell that attracts no
    * vectors drops out: usually only after later reshuffles, but also on
    * the FIRST step when two seeds tie (identical/cosine-tied
    * embeddings — the deterministic argmax sends both to the lower cid),
    * so consumers must treat the configured k as an upper bound on the
    * cell count, not a guarantee.
    */
  def buildCentroids(spark: SparkSession, corpus: DataFrame, k: Int,
                     iters: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vecs = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    // the k lowest ids regardless of id density (`id < k` would yield a
    // short — possibly empty — seed set on non-contiguous ids); a global
    // sort of k rows after a per-partition top-k, not a full-data sort
    var centroids = vecs.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("emb").as("cemb"))
    for (_ <- 1 to iters) centroids = lloydStep(vecs, centroids)
    centroids
  }

  /** One Lloyd step: assign every vector to its best centroid, replace
    * each non-empty cell's centroid with the exact per-dimension mean.
    * Micro-int sums are order-independent; the float is cast to double
    * BEFORE the scale multiply so the rounding input is the same IEEE
    * value in every engine — the step is bit-reproducible at any
    * parallelism.
    */
  private def lloydStep(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = assign(vecs, centroids).join(vecs, "id")
    val dims = assigned.select(col("cid"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(round(col("x").cast("double") * 1000000, 0).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", (col("s") / col("n") / 1000000.0).cast("float"))
    dims.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("cemb"))
  }

  /** Per-vector prototypicality: each vector's cosine affinity to its
    * assigned (best) centroid, deterministic ties to the lower cid.
    * Low affinity = isolated vector, far from every prototype — the
    * embedding-side outlier filter (SemDeDup's complement: q79 drops
    * the too-similar, this flags the too-isolated). One broadcast
    * cross join + a partial-aggregated argmax — linear in the corpus,
    * no shuffle of the embedding column beyond the final groupBy.
    */
  def assignAffinity(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("aff", cos(col("emb"), col("cemb")))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("aff")),
        struct(col("aff"), -col("cid"))).as("best"))
      .select(col("id"), col("best.cid").as("cid"),
        graft.core.Exact.r6(col("best.aff")).as("aff"))

  /** Collect a tiny (O(k·dim) by construction) DataFrame into a LOCAL
    * relation: every consumer then broadcasts the same in-memory rows,
    * the producing plan runs exactly once, and nothing stays pinned in
    * executor storage across calls (a cache() would leak until session
    * end). For centroid tables only — never point this at corpus-sized
    * data.
    */
  def materializeLocal(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** IVF top-k against a PREBUILT centroid table (local relation from
    * [[materializeLocal]] or [[loadLatest]]): probe the nProbe best
    * centroids per query, exact rerank within the probed inverted
    * lists. The search result depends only on the centroid ROWS, not
    * their order (every argmax ties to the lower cid), so a persisted
    * and reloaded index answers bit-identically to a fresh build.
    */
  def ivfKnnWith(centroids: DataFrame, queries: DataFrame,
                 corpus: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val lists = assign(
      corpus.select(col("vec_id").as("id"), col("embedding").as("emb")), centroids)
      .join(corpus.select(col("vec_id").as("id"), col("embedding").as("n_emb")), "id")
      .select(col("cid"), col("id").as("n_id"), col("n_emb"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("aff").desc, col("cid").asc)
    val probes = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("aff", cos(col("q_emb"), col("cemb")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cid"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    probes.join(lists, "cid")
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("sim", graft.core.Exact.r6(cos(col("q_emb"), col("n_emb"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }

  /** Build + search in one call (the original single-shot entry). */
  def ivfKnn(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
             k: Int, kCentroids: Int = 16, nProbe: Int = 4,
             iters: Int = 1): DataFrame = {
    val centroids = materializeLocal(spark,
      buildCentroids(spark, corpus, kCentroids, iters))
    ivfKnnWith(centroids, queries, corpus, k, nProbe)
  }

  /** Persist the centroid table through the engine's versioned store
    * ([[graft.io.Versioned]]) — the index-build/serve split a 100 TB
    * deployment actually runs: the quantizer is fit ONCE per corpus
    * snapshot (k Lloyd passes over every vector), then every serving
    * query loads the O(k·dim) centroid object and probes, instead of
    * re-running the build per query the way [[ivfKnn]] does. Returns
    * the written path.
    */
  def persistCentroids(spark: SparkSession, corpus: DataFrame, dir: String,
                       prefix: String, tag: String, kCentroids: Int = 16,
                       iters: Int = 1): String =
    graft.io.Versioned.write(
      buildCentroids(spark, corpus, kCentroids, iters), dir, prefix, tag)

  /** Load the NEWEST persisted centroid table as a local relation ready
    * for [[ivfKnnWith]]. Floats round-trip parquet bit-exactly and the
    * search is centroid-row-order independent, so reload ≡ rebuild.
    */
  def loadLatest(spark: SparkSession, dir: String, prefix: String): DataFrame =
    materializeLocal(spark, graft.io.Versioned.readLatest(spark, dir, prefix))

  /** Cluster↔label alignment: entropies and mutual information between
    * the label column and the nearest-seed cell assignment (exact
    * integer squared-L2, ties to the lower cid — the
    * [[graft.ext.Pq]]/q279 quantizer), plus the homogeneity score
    * `1 − H(label|cell)/H(label)` — "do my clusters mean anything".
    * Every entropy term is rounded to micro-nats from exact counts and
    * integer-summed, so MI is an exact integer difference.
    *
    * One broadcast cross join for assignment, then counts-table math.
    *
    * @return one row (n_rows, n_cells, h_label_micro, h_cond_micro,
    *         mi_micro, homogeneity_milli)
    */
  def clusterHomogeneity(df: DataFrame, labelCol: String, embCol: String,
                         k: Int): DataFrame = {
    val micro = transform(col(embCol),
      x => round(x.cast("double") * 1000000, 0).cast("long"))
    val vecs = df.select(col("vec_id").as("id"),
      col(labelCol).cast("long").as("lab"), micro.as("vm"))
    val seeds = materializeLocal(df.sparkSession,
      vecs.orderBy(col("id")).limit(k)
        .select(col("id").as("cid"), col("vm").as("cm")))
    val d2 = aggregate(zip_with(col("vm"), col("cm"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val asg = vecs.crossJoin(broadcast(seeds))
      .withColumn("dd", d2)
      .groupBy(col("id"), col("lab"))
      .agg(min_by(col("cid"), struct(col("dd"), col("cid"))).as("cell"))
    val cl = asg.groupBy(col("cell"), col("lab")).agg(count(lit(1)).as("n_cl"))
    val cCnt = cl.groupBy(col("cell")).agg(sum(col("n_cl")).as("n_c"))
    val lCnt = cl.groupBy(col("lab")).agg(sum(col("n_cl")).as("n_l"))
    val tot = cl.agg(sum(col("n_cl")).as("n"))
    val hLab = lCnt.crossJoin(broadcast(tot))
      .select(round(-(col("n_l").cast("double") / col("n").cast("double"))
        * log(col("n_l").cast("double") / col("n").cast("double"))
        * 1000000, 0).cast("long").as("t"))
      .agg(sum(col("t")).as("h_label_micro"))
    val hCond = cl.join(cCnt, "cell").crossJoin(broadcast(tot))
      .select(round(-(col("n_cl").cast("double") / col("n").cast("double"))
        * log(col("n_cl").cast("double") / col("n_c").cast("double"))
        * 1000000, 0).cast("long").as("t"))
      .agg(sum(col("t")).as("h_cond_micro"))
    val nCells = cCnt.agg(count(lit(1)).as("n_cells"))
    tot.crossJoin(nCells).crossJoin(hLab).crossJoin(hCond)
      .select(col("n").as("n_rows"), col("n_cells"),
        col("h_label_micro"), col("h_cond_micro"),
        (col("h_label_micro") - col("h_cond_micro")).as("mi_micro"),
        when(col("h_label_micro") > 0,
          round((lit(1.0) - col("h_cond_micro").cast("double")
            / col("h_label_micro").cast("double")) * 1000.0, 0).cast("long"))
          .otherwise(0L).as("homogeneity_milli"))
  }
}
