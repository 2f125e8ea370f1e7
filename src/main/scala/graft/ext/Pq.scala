package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression and ADC
  * (asymmetric-distance) candidate search — the storage-side scale
  * lever for vector search: the corpus keeps only `m` small codes per
  * vector (here m·2 bits vs 64·4 bytes) and queries scan codes against
  * a per-query distance table instead of touching raw floats.
  *
  * Everything is EXACT 64-bit integer arithmetic: subvector components
  * are rounded to micro-units once at ingest, squared-L2 distances,
  * Lloyd means (round-of-exact-sum), distance tables and ADC sums are
  * all integer — bit-reproducible in any engine at any parallelism
  * (the same discipline as [[IvfIndex]], minus even the float cast).
  *
  * Scale shape: codebook training touches each subvector × k centroids
  * (broadcast); encoding is one linear pass; ADC is a broadcast join of
  * the (queries × m × k)-sized distance table against the codes table —
  * the corpus-sized side never shuffles and never re-reads the raw
  * embedding column.
  */
object Pq {

  /** Micro-unit integer subvector `s` (0-based) of an array<float>. */
  def subMicro(emb: Column, s: Column, subDim: Int): Column =
    transform(slice(emb, s * subDim + 1, lit(subDim)),
      x => round(x.cast("double") * 1000000, 0).cast("long"))

  /** Exact integer squared-L2 distance between two micro-int arrays. */
  def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** (vec_id, s, sub) — one row per subspace per vector. */
  def subvectors(corpus: DataFrame, m: Int, subDim: Int): DataFrame =
    Exec.widen(corpus.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("s"),
        col("embedding"))
      .select(col("vec_id"), col("s").cast("long").as("s"),
        subMicro(col("embedding"), col("s"), subDim).as("sub"))

  /** Per-subspace codebooks: k seeds (lowest vec_ids' subvectors, cid =
    * seed vec_id) refined by `iters` exact-integer Lloyd steps. A cell
    * that attracts no vectors drops out (deterministic argmin ties to
    * the lower cid), so k is an upper bound on cells per subspace.
    *
    * @return (s, cid, cent: array<long>)
    */
  def trainCodebooks(spark: SparkSession, corpus: DataFrame, m: Int,
                     subDim: Int, k: Int, iters: Int = 1): DataFrame = {
    val sub = subvectors(corpus, m, subDim)
    val seedIds = corpus.select(col("vec_id")).orderBy(col("vec_id")).limit(k)
    var cents = sub.join(broadcast(seedIds), "vec_id")
      .select(col("s"), col("vec_id").as("cid"), col("sub").as("cent"))
    for (_ <- 1 to iters) {
      val assigned = sub.join(broadcast(cents), "s")
        .withColumn("dd", d2(col("sub"), col("cent")))
        .groupBy(col("vec_id"), col("s"))
        .agg(min_by(col("cid"), struct(col("dd"), col("cid"))).as("cid"))
      cents = assigned.join(sub, Seq("vec_id", "s"))
        .select(col("s"), col("cid"), posexplode(col("sub")).as(Seq("pos", "xm")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(sum(col("xm")).as("sm"), count(lit(1)).as("n"))
        .withColumn("c", round(col("sm").cast("double") / col("n"), 0).cast("long"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          e => e.getField("c")).as("cent"))
    }
    cents
  }

  /** Encode the corpus: nearest codebook cell per (vector, subspace).
    * @return (vec_id, s, cid)
    */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int,
             subDim: Int): DataFrame =
    subvectors(corpus, m, subDim).join(broadcast(codebooks), "s")
      .withColumn("dd", d2(col("sub"), col("cent")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("cid"), struct(col("dd"), col("cid"))).as("cid"))

  /** ADC top-k: for each query, rank the coded corpus by the sum over
    * subspaces of the precomputed (query-subvector → cell) integer
    * distances, then flag which ADC winners the exact micro-L2 top-k
    * also contains (`in_exact` — the per-row recall trace).
    *
    * @return (q_id, rank, n_id, adc_d2, in_exact)
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, codebooks: DataFrame,
              m: Int, subDim: Int, k: Int): DataFrame = {
    val qsub = subvectors(queries, m, subDim)
      .select(col("vec_id").as("q_id"), col("s"), col("sub").as("qsub"))
    // distance table: |panel| × m × cells rows — broadcast-sized
    val tab = qsub.join(broadcast(codebooks), "s")
      .select(col("q_id"), col("s"), col("cid"),
        d2(col("qsub"), col("cent")).as("dt"))
    val codes = encode(corpus, codebooks, m, subDim)
    val adc = codes.join(broadcast(tab), Seq("s", "cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adc_d2"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    val top = adc.withColumn("rank", row_number().over(wAdc).cast("long"))
      .filter(col("rank") <= k)
    // exact micro-L2 top-k of the same panel for the recall flag
    def full(df: DataFrame, id: String, out: String) =
      Exec.widen(df.select(col("vec_id").as(id),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000, 0).cast("long")).as(out)))
    val q = full(queries, "q_id", "q_emb")
    val c = full(corpus, "n_id", "n_emb")
    val wEx = Window.partitionBy(col("q_id"))
      .orderBy(col("ex_d2").asc, col("n_id").asc)
    val exact = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("ex_d2", d2(col("q_emb"), col("n_emb")))
      .withColumn("ex_rank", row_number().over(wEx))
      .filter(col("ex_rank") <= k)
      .select(col("q_id"), col("n_id"), lit(true).as("in_exact"))
    top.select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("adc_d2"))
      .join(exact, Seq("q_id", "n_id"), "left")
      .select(col("q_id"), col("rank"), col("n_id"), col("adc_d2"),
        coalesce(col("in_exact"), lit(false)).as("in_exact"))
  }

  /** IVFPQ — the composed shape that actually serves 10⁹-vector
    * corpora: a COARSE inverted file (the full vector as ONE PQ
    * subspace: `trainCodebooks(m=1, subDim=dim, k=kCells)` — same
    * exact-integer Lloyd, k cells) blocks the corpus into cells;
    * queries probe their `nProbe` nearest cells and rank by ADC
    * distance tables over ONLY the probed lists. Per query the scan is
    * `nProbe/kCells` of the code table instead of all of it — the IVF
    * restriction composes with the PQ compression, both already
    * oracle-certified separately (q238/q64 and q267).
    *
    * All state — coarse centroids, fine codebooks, cell assignments,
    * codes — is exact 64-bit integer, so a persisted index
    * ([[graft.io.Versioned]]) reloads bit-identically (PqSpec pins
    * fresh ≡ reloaded).
    *
    * @return (q_id, rank, n_id, adc_d2, in_exact) — `in_exact` flags
    *         membership in the exact micro-L2 top-k (the recall trace)
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, coarse: DataFrame,
                codebooks: DataFrame, dim: Int, nProbe: Int, m: Int,
                subDim: Int, k: Int): DataFrame = {
    // inverted file: cell per corpus vector (coarse = 1-subspace PQ)
    val cells = encode(corpus, coarse, m = 1, subDim = dim)
      .select(col("vec_id"), col("cid").as("cell"))
    val codes = encode(corpus, codebooks, m, subDim)
    val top = ivfPqServe(queries, cells, codes, coarse, codebooks, dim,
      nProbe, m, subDim, k)
    // exact micro-L2 top-k recall flag (same trace as adcTopK)
    def full(df: DataFrame, id: String, out: String) =
      Exec.widen(df.select(col("vec_id").as(id),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000, 0).cast("long")).as(out)))
    val q = full(queries, "q_id", "q_emb")
    val c = full(corpus, "n_id", "n_emb")
    val wEx = Window.partitionBy(col("q_id"))
      .orderBy(col("ex_d2").asc, col("n_id").asc)
    val exact = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("ex_d2", d2(col("q_emb"), col("n_emb")))
      .withColumn("ex_rank", row_number().over(wEx))
      .filter(col("ex_rank") <= k)
      .select(col("q_id"), col("n_id"), lit(true).as("in_exact"))
    top.join(exact, Seq("q_id", "n_id"), "left")
      .select(col("q_id"), col("rank"), col("n_id"), col("adc_d2"),
        coalesce(col("in_exact"), lit(false)).as("in_exact"))
  }

  /** Index-side IVFPQ serving — rank by ADC over only the probed lists,
    * reading PREBUILT state: `cells` (vec_id, cell), `codes`
    * (vec_id, s, cid) and the two quantizer tables. No raw corpus
    * embedding is touched — this is the path an INCREMENTALLY
    * maintained index serves from ([[graft.pipeline.Incremental
    * .ivfPqIndexCycle]]), and what [[ivfPqTopK]] delegates to after
    * encoding a fresh corpus.
    *
    * @return (q_id, rank, n_id, adc_d2)
    */
  def ivfPqServe(queries: DataFrame, cells: DataFrame, codes: DataFrame,
                 coarse: DataFrame, codebooks: DataFrame, dim: Int,
                 nProbe: Int, m: Int, subDim: Int, k: Int): DataFrame = {
    require(m * subDim == dim, "subspaces must tile the vector")
    // query-side probes: nProbe nearest cells by exact integer d2
    val qfull = subvectors(queries, m = 1, subDim = dim)
      .select(col("vec_id").as("q_id"), col("sub").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cd").asc, col("cell").asc)
    val probes = qfull.crossJoin(broadcast(
        coarse.select(col("cid").as("cell"), col("cent"))))
      .withColumn("cd", d2(col("qv"), col("cent")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("cell"))
    // ADC distance tables: |panel| × m × cells rows — broadcast-sized
    val qsub = subvectors(queries, m, subDim)
      .select(col("vec_id").as("q_id"), col("s"), col("sub").as("qsub"))
    val tab = qsub.join(broadcast(codebooks), "s")
      .select(col("q_id"), col("s"), col("cid"),
        d2(col("qsub"), col("cent")).as("dt"))
    // candidates = probed lists only: the IVF restriction BEFORE the
    // per-subspace fan-out, so unprobed cells' codes never join
    val cand = cells.join(broadcast(probes), "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"))
    val adc = cand.join(codes, "vec_id")
      .join(broadcast(tab), Seq("q_id", "s", "cid"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dt")).as("adc_d2"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(wAdc).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        col("adc_d2"))
  }

  /** Cell-population drift between the prior index and a delta batch —
    * the RE-CLUSTER TRIGGER an incrementally maintained IVF index
    * reports each cycle: frozen coarse centroids slowly mismatch the
    * data distribution, and the first measurable symptom is the delta's
    * cell-share profile diverging from the prior corpus's. Per cell:
    * prior/delta populations, milli shares, and the absolute share
    * drift; globally the total-variation distance (Σ|q−p| div 2, exact
    * integer on milli shares) and a `rebuild` flag at the `tvMilli`
    * threshold (also forced true for a COLD index — prior empty, delta
    * non-empty — where the statistic is undefined but staleness is
    * certain). Work is O(cells) after two count aggregates.
    *
    * @return (cell, n_prior, n_delta, prior_milli, delta_milli,
    *         drift_milli, tv_milli, rebuild) ordered by cell
    */
  def cellDrift(coarse: DataFrame, priorCells: DataFrame,
                deltaCells: DataFrame, tvMilli: Long = 250L): DataFrame = {
    val p = priorCells.groupBy(col("cell")).agg(count(lit(1)).as("n_prior"))
    val q = deltaCells.groupBy(col("cell")).agg(count(lit(1)).as("n_delta"))
    val base = coarse.select(col("cid").as("cell")).distinct()
      .join(p, Seq("cell"), "left")
      .join(q, Seq("cell"), "left")
      .na.fill(0L, Seq("n_prior", "n_delta"))
    val tot = base.agg(sum(col("n_prior")).as("tp"),
      sum(col("n_delta")).as("td"))
    // An empty side makes the share profile undefined, so shares
    // coalesce to 0 and the per-cell drift is forced to 0 (tv_milli=0,
    // never NULL — the caller's 1-row branch read must not NPE). The
    // two empty cases then diverge at the FLAG, not the statistic:
    // td=0 (empty nightly delta) is genuinely no evidence of drift and
    // keeps the assign path; tp=0 with td>0 (a cold index receiving its
    // first real batch) is the STRONGEST rebuild signal — the frozen
    // quantizer was trained on nothing resembling the delta — so
    // `rebuild` forces true below even though tv_milli stays 0.
    val milli = base.crossJoin(broadcast(tot))
      .withColumn("prior_milli", when(col("tp") > 0L,
        round(col("n_prior").cast("double")
          * 1000.0 / col("tp").cast("double"), 0).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("delta_milli", when(col("td") > 0L,
        round(col("n_delta").cast("double")
          * 1000.0 / col("td").cast("double"), 0).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("drift_milli", when(col("tp") > 0L && col("td") > 0L,
        abs(col("delta_milli") - col("prior_milli"))).otherwise(lit(0L)))
    val tv = milli.agg(expr("sum(drift_milli) div 2").as("tv_milli"))
    milli.crossJoin(broadcast(tv))
      .select(col("cell"), col("n_prior"), col("n_delta"),
        col("prior_milli"), col("delta_milli"), col("drift_milli"),
        col("tv_milli"),
        (col("tv_milli") > tvMilli ||
          (col("tp") === 0L && col("td") > 0L)).as("rebuild"))
  }

  /** Recall-vs-probe-budget curve — the tuning table an IVF deployment
    * reads before pinning `nProbe`: for every budget in `probeGrid`,
    * the mean recall@k of exact-rerank-within-probed-lists against the
    * full exact top-k. ONE dataflow for the whole grid: candidates
    * carry the probe rank that admitted them, the (bounded) grid fans
    * out only the already-screened candidate rows, and the ground
    * truth is computed once.
    *
    * @return (n_probe, n_queries, recall_milli) one row per budget
    */
  def ivfProbeSweep(queries: DataFrame, corpus: DataFrame,
                    coarse: DataFrame, dim: Int, probeGrid: Seq[Int],
                    k: Int): DataFrame = {
    require(probeGrid.nonEmpty && probeGrid.forall(_ >= 1), "bad grid")
    val spark = queries.sparkSession
    import spark.implicits._
    val maxP = probeGrid.max
    val cells = encode(corpus, coarse, m = 1, subDim = dim)
      .select(col("vec_id"), col("cid").as("cell"))
    val qfull = subvectors(queries, m = 1, subDim = dim)
      .select(col("vec_id").as("q_id"), col("sub").as("qv"))
    val cfull = subvectors(corpus, m = 1, subDim = dim)
      .select(col("vec_id").as("n_id"), col("sub").as("nv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cd").asc, col("cell").asc)
    val probes = qfull.crossJoin(broadcast(
        coarse.select(col("cid").as("cell"), col("cent"))))
      .withColumn("cd", d2(col("qv"), col("cent")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= maxP)
      .select(col("q_id"), col("cell"), col("pr"))
    // each corpus vector lives in exactly one cell, so candidate rows
    // are unique per (q, n) and carry the admitting probe rank
    val cand = cells.join(broadcast(probes), "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("pr"))
    val scored = cand.join(cfull, "n_id").join(broadcast(qfull), "q_id")
      .withColumn("dd", d2(col("qv"), col("nv")))
      .select(col("q_id"), col("n_id"), col("pr"), col("dd"))
    val wEx = Window.partitionBy(col("q_id"))
      .orderBy(col("ed").asc, col("n_id").asc)
    val exact = broadcast(qfull).join(cfull, col("q_id") =!= col("n_id"))
      .withColumn("ed", d2(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(wEx))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), lit(true).as("in_exact"))
    val grid = probeGrid.map(_.toLong).toDF("n_probe")
    val wP = Window.partitionBy(col("n_probe"), col("q_id"))
      .orderBy(col("dd").asc, col("n_id").asc)
    val ranked = scored.crossJoin(broadcast(grid))
      .filter(col("pr") <= col("n_probe"))
      .withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= k)
    val hits = ranked.join(exact, Seq("q_id", "n_id"), "left")
      .groupBy(col("n_probe"), col("q_id"))
      .agg(sum(when(col("in_exact"), 1L).otherwise(0L)).as("n_hit"))
    qfull.select(col("q_id")).crossJoin(broadcast(grid))
      .join(hits, Seq("n_probe", "q_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_queries"),
        round(sum(col("n_hit")).cast("double") * 1000.0
          / (count(lit(1)) * k).cast("double"), 0).cast("long")
          .as("recall_milli"))
  }
}
