package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{CorpusOps, Dedup, LangModel, LinkGraph, Pca, Pq, Ranking}
import graft.io.Versioned

/** Wave 29 — vector compression and corpus/graph structure: product
  * quantization with ADC search (the storage-side ANN scale lever),
  * fixed-point PCA power iteration (embedding-space anisotropy),
  * n-gram novelty over corpus order (marginal-content curve),
  * curriculum scheduling (quality tiers × source interleave), and
  * Adamic–Adar link prediction. The PQ and PCA oracles replay every
  * integer step — seeds, Lloyd means, distance tables, matvec rounds —
  * so the quantizer and the eigenvector are bit-identical across
  * engines.
  */
object VectorQueries extends QueryPack {

  /** DuckDB replica of the sequential-fold double cosine (see
    * [[EvalQueries]]).
    */
  private def cosSql(a: String, b: String): String =
    s"""(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform($a, (u,i) -> CAST(u AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |      (p,v) -> p + v)
       |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform($a, u -> CAST(u AS DOUBLE) * CAST(u AS DOUBLE))),
       |         (p,v) -> p + v))
       |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform($b, u -> CAST(u AS DOUBLE) * CAST(u AS DOUBLE))),
       |         (p,v) -> p + v))))""".stripMargin

  /** DuckDB exact integer squared-L2 between two micro-int lists. */
  private def d2Sql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform($a, (x,i) -> (x - $b[i]) * (x - $b[i]))),
       |      (p,v) -> p + v)""".stripMargin

  val all: Seq[Q] = Seq(

    // Product quantization: 8 subspaces × 8 dims, 4-cell codebooks
    // (1 exact-integer Lloyd step), ADC top-5 for a query panel with
    // the per-row exact-top-5 recall flag.
    Q("q267_pq_adc",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val cb = Pq.trainCodebooks(s, emb, m = 8, subDim = 8, k = 4)
        Pq.adcTopK(emb.filter($"vec_id" % 50 === 0), emb, cb,
            m = 8, subDim = 8, k = 5)
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH sub AS (
             |  SELECT vec_id, s,
             |    list_transform(embedding[(s*8+1):(s*8+8)],
             |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS sub
             |  FROM embeddings CROSS JOIN range(0, 8) ss(s)),
             |seeds AS (
             |  SELECT s, vec_id AS cid, sub AS cent FROM sub
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
             |d0 AS (
             |  SELECT sub.vec_id, sub.s, seeds.cid,
             |    ${d2Sql("sub.sub", "seeds.cent")} AS dd
             |  FROM sub JOIN seeds ON seeds.s = sub.s),
             |a0 AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |    FROM d0) WHERE rn = 1),
             |subp AS (
             |  SELECT vec_id, s,
             |    unnest(list_transform(sub, (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}),
             |      recursive := true)
             |  FROM sub),
             |cbp AS (
             |  SELECT a0.s, a0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM a0 JOIN subp p ON p.vec_id = a0.vec_id AND p.s = a0.s
             |  GROUP BY 1, 2, 3),
             |cb AS (SELECT s, cid, list(c ORDER BY pos) AS cent FROM cbp GROUP BY 1, 2),
             |d1 AS (
             |  SELECT sub.vec_id, sub.s, cb.cid,
             |    ${d2Sql("sub.sub", "cb.cent")} AS dd
             |  FROM sub JOIN cb ON cb.s = sub.s),
             |codes AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |    FROM d1) WHERE rn = 1),
             |qsub AS (SELECT vec_id AS q_id, s, sub FROM sub WHERE vec_id % 50 = 0),
             |tab AS (
             |  SELECT q_id, cb.s, cb.cid, ${d2Sql("qsub.sub", "cb.cent")} AS dt
             |  FROM qsub JOIN cb ON cb.s = qsub.s),
             |adc AS (
             |  SELECT t.q_id, c.vec_id AS n_id, CAST(sum(t.dt) AS BIGINT) AS adc_d2
             |  FROM codes c JOIN tab t ON t.s = c.s AND t.cid = c.cid
             |  WHERE t.q_id != c.vec_id GROUP BY 1, 2),
             |topadc AS (
             |  SELECT q_id, n_id, adc_d2,
             |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS BIGINT) AS rank
             |  FROM adc QUALIFY rank <= 5),
             |fullv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
             |  FROM embeddings),
             |ex AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, ${d2Sql("q.fv", "c.fv")} AS ed
             |  FROM fullv q JOIN fullv c ON q.vec_id % 50 = 0 AND c.vec_id != q.vec_id),
             |ext AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ed, n_id) AS rn
             |    FROM ex) WHERE rn <= 5)
             |SELECT t.q_id AS q_id, t.rank, t.n_id, t.adc_d2,
             |  (e.n_id IS NOT NULL) AS in_exact
             |FROM topadc t LEFT JOIN ext e ON e.q_id = t.q_id AND e.n_id = t.n_id
             |ORDER BY t.q_id, t.rank""".stripMargin)),

    // Per-document 3-gram novelty vs everything earlier in id order.
    Q("q268_ngram_novelty",
      (s, d) => {
        import s.implicits._
        Dedup.ngramNoveltyByOrder(Tables.documents(s, d), "doc_id", "text", n = 3)
          .select($"id".as("doc_id"), $"n_grams", $"n_novel", $"novelty_milli")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
             |tg AS (
             |  SELECT doc_id, unnest(list_distinct(list_filter(
             |    list_transform(l, (x,i) -> CASE WHEN i <= len(l)-2
             |      THEN x || ' ' || l[i+1] || ' ' || l[i+2] END),
             |    v -> v IS NOT NULL))) AS g
             |  FROM toks),
             |fo AS (SELECT g, min(doc_id) AS first_id FROM tg GROUP BY 1),
             |per AS (
             |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |    CAST(sum(CASE WHEN fo.first_id = t.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
             |  FROM tg t JOIN fo ON fo.g = t.g GROUP BY 1)
             |SELECT doc_id, n_grams, n_novel,
             |  CAST(round(CAST(n_novel * 1000 AS DOUBLE) / CAST(n_grams AS DOUBLE)) AS BIGINT) AS novelty_milli
             |FROM per ORDER BY doc_id""".stripMargin)),

    // Curriculum head: 3 quality tiers per source (ntile on n_chars),
    // sources interleaved within tiers, first 100 positions.
    Q("q269_curriculum_schedule",
      (s, d) => {
        import s.implicits._
        CorpusOps.curriculumHead(Tables.documents(s, d), "doc_id", "source",
            "n_chars", tiers = 3, take = 100)
          .select($"position", $"tier", $"rnk_tier", $"source",
            $"id".as("doc_id"))
          .orderBy($"position")
      },
      Some("""WITH staged AS (
             |  SELECT doc_id AS id, source, n_chars AS q,
             |    CAST(ntile(3) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS tier
             |  FROM documents),
             |r AS (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY source, tier
             |    ORDER BY q DESC, id) AS BIGINT) AS rnk_tier
             |  FROM staged),
             |h AS (SELECT * FROM r ORDER BY tier, rnk_tier, source LIMIT 100)
             |SELECT CAST(row_number() OVER (ORDER BY tier, rnk_tier, source) AS BIGINT) AS position,
             |  tier, rnk_tier, source, id AS doc_id
             |FROM h ORDER BY position""".stripMargin)),

    // Adamic–Adar supplier-pair link prediction over the shared-customer
    // bipartite graph (degree-capped neighbors, micro-int terms).
    Q("q270_adamic_adar",
      (s, d) => {
        import s.implicits._
        val edges = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("src"), $"l_suppkey".as("dst"))
        LinkGraph.adamicAdarTopK(edges, k = 10, maxDeg = 50)
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |dg AS (
             |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
             |  HAVING count(*) BETWEEN 2 AND 50),
             |t AS (
             |  SELECT src, CAST(round(CAST(1000000.0 AS DOUBLE)
             |    / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS term_micro
             |  FROM dg),
             |p AS (
             |  SELECT a.dst AS id_a, b.dst AS id_b, t.term_micro
             |  FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
             |  JOIN t ON t.src = a.src),
             |sc AS (
             |  SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common,
             |    CAST(sum(term_micro) AS BIGINT) AS score_micro
             |  FROM p GROUP BY 1, 2)
             |SELECT id_a, id_b, n_common, score_micro FROM sc
             |ORDER BY score_micro DESC, id_a, id_b LIMIT 10""".stripMargin)),

    // Top principal direction of the embedding cloud: centered integer
    // covariance + 2 fixed-point power-iteration rounds, every floor
    // replayed by the oracle.
    Q("q271_pca_power",
      (s, d) => {
        import s.implicits._
        Pca.powerTopDirection(Tables.embeddings(s, d), "embedding", iters = 2)
          .orderBy($"pos")
      },
      Some("""WITH dims AS (
             |  SELECT vec_id AS id,
             |    unnest(list_transform(embedding, (x,i) -> {'pos': CAST(i - 1 AS BIGINT),
             |      'xm': CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM embeddings),
             |mu AS (
             |  SELECT pos, CAST(round(CAST(sum(xm) AS DOUBLE)/count(*)) AS BIGINT) AS mu
             |  FROM dims GROUP BY 1),
             |cen AS (
             |  SELECT id, d.pos, d.xm - mu.mu AS v
             |  FROM dims d JOIN mu ON mu.pos = d.pos),
             |cov AS (
             |  SELECT a.pos AS pi, b.pos AS pj,
             |    CAST(round(CAST(sum(a.v * b.v) AS DOUBLE)/1000000.0) AS BIGINT) AS g
             |  FROM cen a JOIN cen b ON a.id = b.id GROUP BY 1, 2),
             |w1 AS (SELECT pi, CAST(sum(g * 1000000) AS BIGINT) AS w FROM cov GROUP BY 1),
             |m1 AS (SELECT max(abs(w)) AS m FROM w1),
             |v1 AS (
             |  SELECT pi AS pos, CASE WHEN m > 0 THEN
             |    CAST(round(CAST(w AS DOUBLE)*1000000.0/CAST(m AS DOUBLE)) AS BIGINT)
             |    ELSE CAST(0 AS BIGINT) END AS v
             |  FROM w1 CROSS JOIN m1),
             |w2 AS (
             |  SELECT cov.pi, CAST(sum(g * v1.v) AS BIGINT) AS w
             |  FROM cov JOIN v1 ON v1.pos = cov.pj GROUP BY 1),
             |m2 AS (SELECT max(abs(w)) AS m FROM w2),
             |v2 AS (
             |  SELECT pi AS pos, CASE WHEN m > 0 THEN
             |    CAST(round(CAST(w AS DOUBLE)*1000000.0/CAST(m AS DOUBLE)) AS BIGINT)
             |    ELSE CAST(0 AS BIGINT) END AS v
             |  FROM w2 CROSS JOIN m2)
             |SELECT pos, v AS v_micro FROM v2 ORDER BY pos""".stripMargin)),

    // SEVENTH streaming operator in the conformance gate: continuous
    // Count-Min maintenance replayed over the documents in 8
    // micro-batches, each ADDING its counter delta into the V2 doc
    // store. Counters are an addition monoid (associative,
    // commutative), so the batched state equals the direct single-pass
    // build the oracle recomputes cell-for-cell.
    Q("q272_stream_cms_replay",
      (s, d) => {
        import s.implicits._
        import graft.streaming.StreamSketch
        import graft.io.MemDocStore
        val keyed = Tables.documents(s, d).select(
          element_at(graft.ext.TextAnalysis.tokens($"text"), 1).as("key"))
        val root = graft.core.Scratch.dir("q272_replay")
        keyed.repartition(8).write.mode("overwrite").parquet(s"$root/data")
        MemDocStore.drop("q272_cms")
        val stream = s.readStream
          .schema(s.read.parquet(s"$root/data").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/data")
        val q = StreamSketch.run(stream, "q272_cms", "key", d = 3, w = 256)
        q.processAllAvailable()
        q.stop()
        StreamSketch.counters(s, "q272_cms")
          .select($"row", $"pos", $"cnt").orderBy($"row", $"pos")
      },
      Some("""WITH k AS (
             |  SELECT string_split_regex(trim(text), '\s+')[1] AS key FROM documents),
             |occ AS (SELECT key, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1),
             |th AS (
             |  SELECT key, n,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(key)),
             |        j -> CAST(ascii(substring(key, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h
             |  FROM occ),
             |ii AS (SELECT unnest(generate_series(0, 2)) AS i),
             |cells AS (
             |  SELECT key, n, i AS r,
             |    ((h * ((1103515245 * (i+1)) % 1000000007)
             |      + ((12345 * (i+1) + 7) % 1000000007)) % 1000000007) % 256 AS pos
             |  FROM th, ii)
             |SELECT r AS "row", pos, CAST(sum(n) AS BIGINT) AS cnt
             |FROM cells GROUP BY 1, 2 ORDER BY "row", pos""".stripMargin)),

    // Quantile normalization of n_chars across sources onto the pooled
    // distribution (midpoint rank mapping, two-phase pooled rank).
    Q("q273_quantile_normalize",
      (s, d) => {
        import s.implicits._
        CorpusOps.quantileNormalize(Tables.documents(s, d), "doc_id",
            "source", "n_chars")
          .select($"id".as("doc_id"), $"grp".as("source"),
            $"v".as("n_chars"), $"rnk_grp", $"n_grp", $"target_rank",
            $"norm_v")
          .orderBy($"doc_id")
      },
      Some("""WITH rw AS (
             |  SELECT doc_id AS id, source AS grp, CAST(n_chars AS BIGINT) AS v
             |  FROM documents),
             |rg AS (
             |  SELECT *,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY v, id) AS BIGINT) AS rnk_grp,
             |    CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
             |  FROM rw),
             |pool AS (
             |  SELECT CAST(row_number() OVER (ORDER BY v, id) AS BIGINT) AS prank,
             |    v AS norm_v
             |  FROM rw),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM rw),
             |tg AS (
             |  SELECT id, grp, v, rnk_grp, n_grp,
             |    CAST(floor(CAST((2*rnk_grp - 1)*n_total + n_grp AS DOUBLE)
             |      / CAST(2*n_grp AS DOUBLE)) AS BIGINT) AS target_rank
             |  FROM rg CROSS JOIN tot)
             |SELECT id AS doc_id, grp AS source, v AS n_chars, rnk_grp, n_grp,
             |  target_rank, p.norm_v
             |FROM tg JOIN pool p ON p.prank = tg.target_rank
             |ORDER BY doc_id""".stripMargin)),

    // Krippendorff's alpha (nominal) per language over the same 3-rater
    // panel as q262 — the finite-sample-corrected agreement twin.
    Q("q274_krippendorff_alpha",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val r1 = docs.select($"lang", $"doc_id".as("item"),
          ($"n_chars" % 3).cast("long").as("cat"))
        val r2 = docs.select($"lang", $"doc_id".as("item"),
          (size(graft.ext.TextAnalysis.tokens($"text")) % 3).cast("long").as("cat"))
        val r3 = docs.select($"lang", $"doc_id".as("item"),
          (floor($"doc_id" / 3).cast("long") % 3).as("cat"))
        graft.ops.Eval.krippendorffAlphaNominal(
            r1.unionByName(r2).unionByName(r3), "lang", "item", "cat")
          .select($"grp".as("lang"), $"n_items", $"n_raters",
            $"do_micro", $"de_micro", $"alpha_micro")
          .orderBy($"lang")
      },
      Some("""WITH r AS (
             |  SELECT lang, doc_id AS item, CAST(n_chars % 3 AS BIGINT) AS cat
             |  FROM documents
             |  UNION ALL
             |  SELECT lang, doc_id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) % 3 AS BIGINT)
             |  FROM documents
             |  UNION ALL
             |  SELECT lang, doc_id, CAST((doc_id // 3) % 3 AS BIGINT)
             |  FROM documents),
             |nij AS (SELECT lang, item, cat, CAST(count(*) AS BIGINT) AS nij
             |        FROM r GROUP BY 1, 2, 3),
             |pi AS (SELECT lang, item, CAST(sum(nij) AS BIGINT) AS n_i,
             |         CAST(sum(nij*nij) AS BIGINT) AS s2_i
             |       FROM nij GROUP BY 1, 2),
             |g1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_items,
             |         CAST(max(n_i) AS BIGINT) AS n_raters,
             |         CAST(sum(s2_i) AS BIGINT) AS s2
             |       FROM pi GROUP BY 1),
             |cj AS (SELECT lang, cat, CAST(sum(nij) AS BIGINT) AS c_j
             |       FROM nij GROUP BY 1, 2),
             |g2 AS (SELECT lang, CAST(sum(c_j*c_j) AS BIGINT) AS c2
             |       FROM cj GROUP BY 1)
             |SELECT g1.lang, n_items, n_raters,
             |  CAST(round(CAST(n_items*n_raters*n_raters - s2 AS DOUBLE)
             |    / CAST(n_items*n_raters*(n_raters-1) AS DOUBLE) * 1000000) AS BIGINT) AS do_micro,
             |  CAST(round(CAST((n_items*n_raters)*(n_items*n_raters) - c2 AS DOUBLE)
             |    / CAST((n_items*n_raters)*((n_items*n_raters)-1) AS DOUBLE) * 1000000) AS BIGINT) AS de_micro,
             |  CASE WHEN CAST((n_items*n_raters)*(n_items*n_raters) - c2 AS DOUBLE)
             |      / CAST((n_items*n_raters)*((n_items*n_raters)-1) AS DOUBLE) = 0.0
             |    THEN NULL
             |  ELSE CAST(round((CAST(1.0 AS DOUBLE)
             |    - (CAST(n_items*n_raters*n_raters - s2 AS DOUBLE)
             |       / CAST(n_items*n_raters*(n_raters-1) AS DOUBLE))
             |      / (CAST((n_items*n_raters)*(n_items*n_raters) - c2 AS DOUBLE)
             |         / CAST((n_items*n_raters)*((n_items*n_raters)-1) AS DOUBLE)))
             |    * 1000000) AS BIGINT) END AS alpha_micro
             |FROM g1 JOIN g2 USING (lang) ORDER BY lang""".stripMargin)),

    // Embedding-space anisotropy: share of centered variance on the
    // top principal direction (the q271 eigenvector), one ratio row.
    Q("q275_pca_anisotropy",
      (s, d) => {
        import s.implicits._
        Pca.anisotropy(Tables.embeddings(s, d), "embedding", iters = 2)
      },
      Some("""WITH dims AS (
             |  SELECT vec_id AS id,
             |    unnest(list_transform(embedding, (x,i) -> {'pos': CAST(i - 1 AS BIGINT),
             |      'xm': CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM embeddings),
             |mu AS (
             |  SELECT pos, CAST(round(CAST(sum(xm) AS DOUBLE)/count(*)) AS BIGINT) AS mu
             |  FROM dims GROUP BY 1),
             |cen AS (
             |  SELECT id, d.pos, d.xm - mu.mu AS v
             |  FROM dims d JOIN mu ON mu.pos = d.pos),
             |cov AS (
             |  SELECT a.pos AS pi, b.pos AS pj,
             |    CAST(round(CAST(sum(a.v * b.v) AS DOUBLE)/1000000.0) AS BIGINT) AS g
             |  FROM cen a JOIN cen b ON a.id = b.id GROUP BY 1, 2),
             |w1 AS (SELECT pi, CAST(sum(g * 1000000) AS BIGINT) AS w FROM cov GROUP BY 1),
             |m1 AS (SELECT max(abs(w)) AS m FROM w1),
             |v1 AS (
             |  SELECT pi AS pos, CASE WHEN m > 0 THEN
             |    CAST(round(CAST(w AS DOUBLE)*1000000.0/CAST(m AS DOUBLE)) AS BIGINT)
             |    ELSE CAST(0 AS BIGINT) END AS v
             |  FROM w1 CROSS JOIN m1),
             |w2 AS (
             |  SELECT cov.pi, CAST(sum(g * v1.v) AS BIGINT) AS w
             |  FROM cov JOIN v1 ON v1.pos = cov.pj GROUP BY 1),
             |m2 AS (SELECT max(abs(w)) AS m FROM w2),
             |v2 AS (
             |  SELECT pi AS pos, CASE WHEN m > 0 THEN
             |    CAST(round(CAST(w AS DOUBLE)*1000000.0/CAST(m AS DOUBLE)) AS BIGINT)
             |    ELSE CAST(0 AS BIGINT) END AS v
             |  FROM w2 CROSS JOIN m2),
             |proj AS (
             |  SELECT id, CAST(sum(c.v * v2.v) AS BIGINT) AS p
             |  FROM cen c JOIN v2 ON v2.pos = c.pos GROUP BY 1),
             |pq AS (
             |  SELECT id, CAST(round(CAST(p AS DOUBLE)/1000000.0) AS BIGINT) AS q
             |  FROM proj),
             |t AS (SELECT CAST(sum(v*v) AS BIGINT) AS total_ss FROM cen),
             |p2 AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |         CAST(sum(q*q) AS BIGINT) AS p2 FROM pq),
             |vv AS (SELECT CAST(sum(v*v) AS BIGINT) AS v2s FROM v2)
             |SELECT n_rows, total_ss, p2, v2s AS v2,
             |  CAST(round(CAST(p2 AS DOUBLE) * 1000000000000.0
             |    / (CAST(v2s AS DOUBLE) * CAST(total_ss AS DOUBLE))
             |    * 1000.0) AS BIGINT) AS ratio_milli
             |FROM p2 CROSS JOIN t CROSS JOIN vv""".stripMargin)),

    // Leave-one-source-out NB influence: accuracy of the label model on
    // each source's own docs, with and without that source in the
    // training counts — closed-form complement counts, one linear
    // scoring pass for all 20 LOO models at once.
    Q("q276_source_influence",
      (s, d) => {
        import s.implicits._
        LangModel.sourceInfluenceNb(Tables.documents(s, d), "doc_id", "text",
            "source", $"lang" === "en")
          .orderBy($"source")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, source AS src, lang = 'en' AS gold,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |tokrows AS (SELECT id, src, gold, unnest(l) AS tok FROM base),
             |counts AS (
             |  SELECT tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM tokrows GROUP BY 1),
             |scounts AS (
             |  SELECT tok, src,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1s,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0s
             |  FROM tokrows GROUP BY 1, 2),
             |gl AS (SELECT CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0
             |  FROM counts),
             |dtot AS (SELECT
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS d0
             |  FROM base),
             |lost AS (
             |  SELECT src, CAST(count(*) AS BIGINT) AS v_lost
             |  FROM scounts sc JOIN counts c USING (tok)
             |  WHERE sc.c1s + sc.c0s = c.c1 + c.c0 GROUP BY 1),
             |stot AS (SELECT src, CAST(sum(c1s) AS BIGINT) AS n1s,
             |    CAST(sum(c0s) AS BIGINT) AS n0s FROM scounts GROUP BY 1),
             |sdoc AS (SELECT src,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS d1s,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS d0s
             |  FROM base GROUP BY 1),
             |sc2 AS (
             |  SELECT stot.src, n1 - n1s AS n1c, n0 - n0s AS n0c,
             |    d1 - d1s AS d1c, d0 - d0s AS d0c,
             |    v - coalesce(v_lost, 0) AS vs
             |  FROM stot JOIN sdoc USING (src) LEFT JOIN lost USING (src)
             |  CROSS JOIN gl CROSS JOIN dtot),
             |terms AS (
             |  SELECT t.id, t.src, t.gold,
             |    CAST(round((ln(CAST(c.c1 + 1 AS DOUBLE) / CAST(g.n1 + g.v AS DOUBLE))
             |      - ln(CAST(c.c0 + 1 AS DOUBLE) / CAST(g.n0 + g.v AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS t_full,
             |    CAST(round((ln(CAST(c.c1 - s.c1s + 1 AS DOUBLE) / CAST(k.n1c + k.vs AS DOUBLE))
             |      - ln(CAST(c.c0 - s.c0s + 1 AS DOUBLE) / CAST(k.n0c + k.vs AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS t_loo
             |  FROM tokrows t JOIN counts c USING (tok)
             |  JOIN scounts s ON s.tok = t.tok AND s.src = t.src
             |  JOIN sc2 k ON k.src = t.src CROSS JOIN gl g),
             |dscore AS (
             |  SELECT id, src, gold, CAST(sum(t_full) AS BIGINT) AS s_full,
             |    CAST(sum(t_loo) AS BIGINT) AS s_loo
             |  FROM terms GROUP BY 1, 2, 3),
             |pri AS (
             |  SELECT k.src,
             |    CAST(round((ln(CAST(d1 AS DOUBLE)) - ln(CAST(d0 AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS p_full,
             |    CAST(round((ln(CAST(d1c AS DOUBLE)) - ln(CAST(d0c AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS p_loo
             |  FROM sc2 k CROSS JOIN dtot),
             |fin AS (
             |  SELECT d.src, d.gold,
             |    (p.p_full + d.s_full >= 0) AS pred_full,
             |    (p.p_loo + d.s_loo >= 0) AS pred_loo
             |  FROM dscore d JOIN pri p USING (src)),
             |agg AS (
             |  SELECT src AS source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(round(CAST(sum(CASE WHEN pred_full = gold THEN 1 ELSE 0 END) AS DOUBLE)
             |      * 1000 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_full_milli,
             |    CAST(round(CAST(sum(CASE WHEN pred_loo = gold THEN 1 ELSE 0 END) AS DOUBLE)
             |      * 1000 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_loo_milli
             |  FROM fin GROUP BY 1)
             |SELECT source, n_docs, acc_full_milli, acc_loo_milli,
             |  acc_loo_milli - acc_full_milli AS delta_milli
             |FROM agg ORDER BY source""".stripMargin)),

    // Content-defined chunking dedup report: rolling-hash cut points
    // (8-char PolyHash window, mask 32), chunk-hash duplication and
    // mean chunk length per source — the chunk-store storage estimate.
    Q("q277_cdc_chunks",
      (s, d) => {
        import s.implicits._
        Dedup.cdcChunkStats(Tables.documents(s, d), "doc_id", "text",
            "source", w = 8, mask = 32)
          .orderBy($"source")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, source AS src, text,
             |    CAST(length(text) AS BIGINT) AS ll
             |  FROM documents),
             |cuts AS (
             |  SELECT id, src, text, ll,
             |    CASE WHEN ll - 7 >= 1 THEN
             |      list_filter(list_transform(list_filter(
             |        generate_series(CAST(1 AS BIGINT), ll - 7),
             |        b -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |            list_transform(generate_series(1, 8),
             |              j -> CAST(ascii(substring(text, CAST(b + j - 1 AS INT), 1)) AS BIGINT))),
             |            (a, c) -> (a*31 + c) % 1000000007) % 32 = 0),
             |        b -> b + 8), s2 -> s2 <= ll)
             |    ELSE CAST([] AS BIGINT[]) END AS ca
             |  FROM base),
             |st AS (
             |  SELECT id, src, text, ll,
             |    list_prepend(CAST(1 AS BIGINT), ca) AS starts
             |  FROM cuts),
             |ch AS (
             |  SELECT id, src,
             |    unnest(list_transform(starts, (s0, i) ->
             |      substring(text, CAST(s0 AS INT),
             |        CAST(coalesce(starts[i+1], ll + 1) - s0 AS INT)))) AS chunk
             |  FROM st),
             |hs AS (
             |  SELECT id, src,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(chunk)),
             |        j -> CAST(ascii(substring(chunk, j, 1)) AS BIGINT))),
             |      (a, c) -> (a*31 + c) % 1000000007) AS h,
             |    CAST(length(chunk) AS BIGINT) AS len
             |  FROM ch)
             |SELECT src AS source, CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
             |  CAST(round(CAST((count(*) - count(DISTINCT h)) * 1000 AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_milli,
             |  CAST(round(CAST(sum(len) AS DOUBLE) * 1000
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_len_milli
             |FROM hs GROUP BY 1 ORDER BY source""".stripMargin)),

    // Fellegi–Sunter record-linkage weights by EM over agreement
    // patterns: dirty supplier names re-linked within nation blocks on
    // (edit-distance, acctbal-bucket, address-initial) agreements; the
    // oracle replays both EM rounds pattern-for-pattern.
    Q("q278_fs_em",
      (s, d) => {
        import s.implicits._
        val sup = Tables.supplier(s, d)
        val dirty = sup.select(
          concat(substring($"s_name", 1, 11), lit("X"),
            substring($"s_name", 13, 6)).as("d_name"),
          $"s_nationkey".as("d_nat"), $"s_acctbal".as("d_bal"),
          ($"s_suppkey" % 10).as("d_k"))
        val pairs = dirty.join(sup, $"d_nat" === $"s_nationkey")
          .select(
            (levenshtein($"d_name", $"s_name") <= 2).as("a_name"),
            (floor($"d_bal".cast("double") / 1000.0)
              === floor($"s_acctbal".cast("double") / 1000.0)).as("a_acct"),
            ($"d_k" === $"s_suppkey" % 10).as("a_addr"))
        graft.ops.FuzzyLink.fellegiSunterEm(pairs,
            Seq("a_name", "a_acct", "a_addr"), iters = 2)
          .orderBy($"a_name", $"a_acct", $"a_addr")
      },
      Some("""WITH dirty AS (
             |  SELECT substring(s_name, 1, 11) || 'X' || substring(s_name, 13, 6) AS d_name,
             |    s_nationkey AS d_nat, s_acctbal AS d_bal,
             |    s_suppkey % 10 AS d_k
             |  FROM supplier),
             |pr AS (
             |  SELECT (levenshtein(d_name, s.s_name) <= 2) AS a_name,
             |    (floor(CAST(d_bal AS DOUBLE) / 1000.0)
             |      = floor(CAST(s.s_acctbal AS DOUBLE) / 1000.0)) AS a_acct,
             |    (d_k = s.s_suppkey % 10) AS a_addr
             |  FROM dirty JOIN supplier s ON s.s_nationkey = d_nat),
             |pat AS (SELECT a_name, a_acct, a_addr, CAST(count(*) AS BIGINT) AS n
             |        FROM pr GROUP BY 1, 2, 3),
             |e1 AS (
             |  SELECT *, CAST(round(wm / (wm + wu) * 1000000) AS BIGINT) AS r FROM (
             |    SELECT pat.*,
             |      CAST(500000 AS DOUBLE)
             |        * CAST(CASE WHEN a_name THEN 900000 ELSE 100000 END AS DOUBLE)
             |        * CAST(CASE WHEN a_acct THEN 900000 ELSE 100000 END AS DOUBLE)
             |        * CAST(CASE WHEN a_addr THEN 900000 ELSE 100000 END AS DOUBLE) AS wm,
             |      CAST(500000 AS DOUBLE)
             |        * CAST(CASE WHEN a_name THEN 100000 ELSE 900000 END AS DOUBLE)
             |        * CAST(CASE WHEN a_acct THEN 100000 ELSE 900000 END AS DOUBLE)
             |        * CAST(CASE WHEN a_addr THEN 100000 ELSE 900000 END AS DOUBLE) AS wu
             |    FROM pat)),
             |c1 AS (
             |  SELECT
             |    CAST(round(CAST(sum(CASE WHEN a_name THEN n*r ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*r) AS DOUBLE)) AS BIGINT) AS m_name,
             |    CAST(round(CAST(sum(CASE WHEN a_name THEN n*(1000000-r) ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*(1000000-r)) AS DOUBLE)) AS BIGINT) AS u_name,
             |    CAST(round(CAST(sum(CASE WHEN a_acct THEN n*r ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*r) AS DOUBLE)) AS BIGINT) AS m_acct,
             |    CAST(round(CAST(sum(CASE WHEN a_acct THEN n*(1000000-r) ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*(1000000-r)) AS DOUBLE)) AS BIGINT) AS u_acct,
             |    CAST(round(CAST(sum(CASE WHEN a_addr THEN n*r ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*r) AS DOUBLE)) AS BIGINT) AS m_addr,
             |    CAST(round(CAST(sum(CASE WHEN a_addr THEN n*(1000000-r) ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*(1000000-r)) AS DOUBLE)) AS BIGINT) AS u_addr,
             |    CAST(round(CAST(sum(n*r) AS DOUBLE)
             |      / CAST(sum(n)*1000000 AS DOUBLE) * 1000000.0) AS BIGINT) AS p
             |  FROM e1),
             |e2 AS (
             |  SELECT *, CAST(round(wm / (wm + wu) * 1000000) AS BIGINT) AS r FROM (
             |    SELECT pat.*, c1.*,
             |      CAST(p AS DOUBLE)
             |        * CAST(CASE WHEN a_name THEN m_name ELSE 1000000 - m_name END AS DOUBLE)
             |        * CAST(CASE WHEN a_acct THEN m_acct ELSE 1000000 - m_acct END AS DOUBLE)
             |        * CAST(CASE WHEN a_addr THEN m_addr ELSE 1000000 - m_addr END AS DOUBLE) AS wm,
             |      CAST(1000000 - p AS DOUBLE)
             |        * CAST(CASE WHEN a_name THEN u_name ELSE 1000000 - u_name END AS DOUBLE)
             |        * CAST(CASE WHEN a_acct THEN u_acct ELSE 1000000 - u_acct END AS DOUBLE)
             |        * CAST(CASE WHEN a_addr THEN u_addr ELSE 1000000 - u_addr END AS DOUBLE) AS wu
             |    FROM pat CROSS JOIN c1)),
             |c2 AS (
             |  SELECT
             |    CAST(round(CAST(sum(CASE WHEN a_name THEN n*r ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*r) AS DOUBLE)) AS BIGINT) AS m_name,
             |    CAST(round(CAST(sum(CASE WHEN a_name THEN n*(1000000-r) ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*(1000000-r)) AS DOUBLE)) AS BIGINT) AS u_name,
             |    CAST(round(CAST(sum(CASE WHEN a_acct THEN n*r ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*r) AS DOUBLE)) AS BIGINT) AS m_acct,
             |    CAST(round(CAST(sum(CASE WHEN a_acct THEN n*(1000000-r) ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*(1000000-r)) AS DOUBLE)) AS BIGINT) AS u_acct,
             |    CAST(round(CAST(sum(CASE WHEN a_addr THEN n*r ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*r) AS DOUBLE)) AS BIGINT) AS m_addr,
             |    CAST(round(CAST(sum(CASE WHEN a_addr THEN n*(1000000-r) ELSE 0 END) AS DOUBLE)
             |      * 1000000.0 / CAST(sum(n*(1000000-r)) AS DOUBLE)) AS BIGINT) AS u_addr,
             |    CAST(round(CAST(sum(n*r) AS DOUBLE)
             |      / CAST(sum(n)*1000000 AS DOUBLE) * 1000000.0) AS BIGINT) AS p
             |  FROM e2)
             |SELECT a_name, a_acct, a_addr, n AS n_pairs,
             |  CAST(round(wm / (wm + wu) * 1000000) AS BIGINT) AS r_micro,
             |  m_name AS m_a_name_micro, u_name AS u_a_name_micro,
             |  m_acct AS m_a_acct_micro, u_acct AS u_a_acct_micro,
             |  m_addr AS m_a_addr_micro, u_addr AS u_a_addr_micro,
             |  p AS p_micro
             |FROM (
             |  SELECT pat.*, c2.*,
             |    CAST(p AS DOUBLE)
             |      * CAST(CASE WHEN a_name THEN m_name ELSE 1000000 - m_name END AS DOUBLE)
             |      * CAST(CASE WHEN a_acct THEN m_acct ELSE 1000000 - m_acct END AS DOUBLE)
             |      * CAST(CASE WHEN a_addr THEN m_addr ELSE 1000000 - m_addr END AS DOUBLE) AS wm,
             |    CAST(1000000 - p AS DOUBLE)
             |      * CAST(CASE WHEN a_name THEN u_name ELSE 1000000 - u_name END AS DOUBLE)
             |      * CAST(CASE WHEN a_acct THEN u_acct ELSE 1000000 - u_acct END AS DOUBLE)
             |      * CAST(CASE WHEN a_addr THEN u_addr ELSE 1000000 - u_addr END AS DOUBLE) AS wu
             |  FROM pat CROSS JOIN c2)
             |ORDER BY a_name, a_acct, a_addr""".stripMargin)),

    // EIGHTH streaming operator in the gate: IVF-cell occupancy over an
    // embedding stream in 8 micro-batches — nearest-seed assignment by
    // exact integer L2, per-cell counts add-monoid-merged into the V2
    // doc store; the oracle recomputes the single-pass occupancy.
    Q("q279_stream_cell_occupancy",
      (s, d) => {
        import s.implicits._
        import graft.streaming.StreamSketch
        import graft.io.MemDocStore
        val emb = Tables.embeddings(s, d)
        val micro = (c: org.apache.spark.sql.Column) =>
          transform(c, x => round(x.cast("double") * 1000000, 0).cast("long"))
        val cents = graft.ext.IvfIndex.materializeLocal(s,
          emb.orderBy($"vec_id").limit(8)
            .select($"vec_id".as("cid"), micro($"embedding").as("cm")))
        val root = graft.core.Scratch.dir("q279_replay")
        emb.select($"vec_id", $"embedding").repartition(8)
          .write.mode("overwrite").parquet(s"$root/data")
        MemDocStore.drop("q279_cells")
        val stream = s.readStream
          .schema(s.read.parquet(s"$root/data").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/data")
        val q = StreamSketch.runCellCounts(stream, "q279_cells", cents)
        q.processAllAvailable()
        q.stop()
        StreamSketch.counters(s, "q279_cells")
          .select($"cid", $"cnt").orderBy($"cid")
      },
      Some(s"""WITH v AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS vm
             |  FROM embeddings),
             |seeds AS (SELECT vec_id AS cid, vm AS cm FROM v ORDER BY vec_id LIMIT 8),
             |asg AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT v.vec_id, s.cid,
             |      row_number() OVER (PARTITION BY v.vec_id
             |        ORDER BY ${d2Sql("v.vm", "s.cm")}, s.cid) AS rn
             |    FROM v CROSS JOIN seeds s) WHERE rn = 1)
             |SELECT cid, CAST(count(*) AS BIGINT) AS cnt
             |FROM asg GROUP BY 1 ORDER BY cid""".stripMargin)),

    // ROC threshold sweep of the token-count score predicting lang=en:
    // the operating-point table (tpr/fpr/Youden J per threshold).
    Q("q280_roc_sweep",
      (s, d) => {
        import s.implicits._
        val scored = Tables.documents(s, d).select(
          size(graft.ext.TextAnalysis.tokens($"text")).cast("long").as("score"),
          ($"lang" === "en").as("gold"))
        graft.ops.Eval.rocSweep(scored, "score", "gold", (0L to 100L by 5L))
          .orderBy($"t")
      },
      Some("""WITH rows_ AS (
             |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS s,
             |    lang = 'en' AS y
             |  FROM documents),
             |grid AS (SELECT unnest(generate_series(0, 100, 5)) AS t),
             |counts AS (
             |  SELECT t,
             |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
             |    CAST(sum(CASE WHEN y AND s >= t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN NOT y AND s >= t THEN 1 ELSE 0 END) AS BIGINT) AS fp
             |  FROM rows_ CROSS JOIN grid GROUP BY 1)
             |SELECT t, n_pos, n_neg, tp, fp,
             |  CAST(round(CAST(tp * 1000 AS DOUBLE) / CAST(n_pos AS DOUBLE)) AS BIGINT) AS tpr_milli,
             |  CAST(round(CAST(fp * 1000 AS DOUBLE) / CAST(n_neg AS DOUBLE)) AS BIGINT) AS fpr_milli,
             |  CAST(round(CAST(tp * 1000 AS DOUBLE) / CAST(n_pos AS DOUBLE)) AS BIGINT)
             |    - CAST(round(CAST(fp * 1000 AS DOUBLE) / CAST(n_neg AS DOUBLE)) AS BIGINT) AS youden_milli
             |FROM counts ORDER BY t""".stripMargin)),

    // Heaps'-law vocabulary-growth exponent per source (milli-ln
    // points, exact integer OLS).
    Q("q281_heaps_per_source",
      (s, d) => {
        import s.implicits._
        LangModel.heapsOls(Tables.documents(s, d), "source", "doc_id", "text")
          .select($"grp".as("source"), $"n_points", $"tokens_total",
            $"vocab_total", $"slope_micro", $"r2_milli")
          .orderBy($"source")
      },
      Some("""WITH base AS (
             |  SELECT source AS grp, doc_id AS id,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |b2 AS (SELECT grp, id, CAST(len(l) AS BIGINT) AS ntok FROM base),
             |fo AS (
             |  SELECT grp, tok, min(id) AS fid FROM (
             |    SELECT grp, id, unnest(l) AS tok FROM base) GROUP BY 1, 2),
             |npd AS (SELECT grp, fid AS id, CAST(count(*) AS BIGINT) AS n_new
             |        FROM fo GROUP BY 1, 2),
             |pts AS (
             |  SELECT b2.grp, b2.id,
             |    CAST(sum(ntok) OVER (PARTITION BY b2.grp ORDER BY b2.id) AS BIGINT) AS cum_tok,
             |    CAST(sum(coalesce(n_new, 0)) OVER (PARTITION BY b2.grp ORDER BY b2.id) AS BIGINT) AS cum_voc
             |  FROM b2 LEFT JOIN npd ON npd.grp = b2.grp AND npd.id = b2.id),
             |xy AS (
             |  SELECT grp, cum_tok, cum_voc,
             |    CAST(round(ln(CAST(cum_tok AS DOUBLE)) * 1000) AS BIGINT) AS x,
             |    CAST(round(ln(CAST(cum_voc AS DOUBLE)) * 1000) AS BIGINT) AS y
             |  FROM pts),
             |st AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    CAST(max(cum_tok) AS BIGINT) AS tokens_total,
             |    CAST(max(cum_voc) AS BIGINT) AS vocab_total,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
             |    CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM xy GROUP BY 1)
             |SELECT grp AS source, n AS n_points, tokens_total, vocab_total,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0 THEN
             |    CAST(round(CAST(n*sxy - sx*sy AS DOUBLE)
             |      / CAST(n*sxx - sx*sx AS DOUBLE) * 1000000) AS BIGINT)
             |  END AS slope_micro,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0
             |        AND CAST(n*syy - sy*sy AS DOUBLE) > 0 THEN
             |    CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
             |      / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             |      * 1000) AS BIGINT)
             |  END AS r2_milli
             |FROM st ORDER BY source""".stripMargin)),

    // Deterministic token-dropout augmentation: LCG on (doc, position)
    // decides survival; the oracle certifies the exact surviving
    // sequence through its PolyHash fingerprint.
    Q("q282_token_dropout",
      (s, d) => {
        import s.implicits._
        CorpusOps.tokenDropout(Tables.documents(s, d), "doc_id", "text",
            dropPct = 10)
          .select($"id".as("doc_id"), $"n_tokens", $"n_kept", $"aug_hash")
          .orderBy($"doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |k AS (
             |  SELECT id, CAST(len(l) AS BIGINT) AS n_tokens,
             |    list_filter(l, (x, i) ->
             |      ((id * 31 + i) * 1103515245 + 12345) % 1000000007 % 100 >= 10) AS kept
             |  FROM base)
             |SELECT id AS doc_id, n_tokens, CAST(len(kept) AS BIGINT) AS n_kept,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(generate_series(1, length(array_to_string(kept, ' '))),
             |      j -> CAST(ascii(substring(array_to_string(kept, ' '), j, 1)) AS BIGINT))),
             |    (a, c) -> (a*31 + c) % 1000000007) AS aug_hash
             |FROM k ORDER BY doc_id""".stripMargin)),

    // Pairwise 1-D Wasserstein distance between source length
    // distributions — mass × distance moved, exact on the discrete
    // length domain.
    Q("q283_wasserstein_sources",
      (s, d) => {
        import s.implicits._
        graft.ops.Drift.wasserstein1dByGroup(Tables.documents(s, d),
            "source", "n_chars")
          .select($"grp_a".as("src_a"), $"grp_b".as("src_b"),
            $"n_a", $"n_b", $"w1_milli")
          .orderBy($"src_a", $"src_b")
      },
      Some("""WITH vals AS (
             |  SELECT source AS grp, CAST(n_chars AS BIGINT) AS v FROM documents),
             |counts AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS n
             |           FROM vals GROUP BY 1, 2),
             |grid AS (
             |  SELECT v, CAST(coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS BIGINT) AS gap
             |  FROM (SELECT DISTINCT v FROM vals)),
             |grps AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_tot
             |         FROM vals GROUP BY 1),
             |cdf AS (
             |  SELECT g.grp, gr.v, gr.gap, g.n_tot,
             |    CAST(sum(coalesce(c.n, 0)) OVER (PARTITION BY g.grp ORDER BY gr.v)
             |      AS BIGINT) AS cum
             |  FROM grps g CROSS JOIN grid gr
             |  LEFT JOIN counts c ON c.grp = g.grp AND c.v = gr.v)
             |SELECT a.grp AS src_a, b.grp AS src_b,
             |  a.n_tot AS n_a, b.n_tot AS n_b,
             |  CAST(round(CAST(sum(abs(a.cum*b.n_tot - b.cum*a.n_tot) * a.gap) AS DOUBLE)
             |    * 1000 / CAST(a.n_tot * b.n_tot AS DOUBLE)) AS BIGINT) AS w1_milli
             |FROM cdf a JOIN cdf b ON a.grp < b.grp AND a.v = b.v
             |GROUP BY 1, 2, 3, 4 ORDER BY src_a, src_b""".stripMargin)),

    // Association rules over order baskets: support/confidence/lift,
    // top-15 by lift (popularity-corrected affinity).
    Q("q284_assoc_rules",
      (s, d) => {
        import s.implicits._
        graft.ops.Assoc.rulesTopK(Tables.lineitem(s, d), "l_orderkey",
            "l_partkey", k = 15, minItem = 3L, minPair = 2L)
      },
      Some("""WITH bi AS (
             |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
             |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM bi),
             |item AS (SELECT it, CAST(count(*) AS BIGINT) AS n_it
             |         FROM bi GROUP BY 1 HAVING count(*) >= 3),
             |p AS (
             |  SELECT x.it AS ante, y.it AS cons, ia.n_it AS n_ante,
             |    ic.n_it AS n_cons, CAST(count(*) AS BIGINT) AS n_both
             |  FROM bi x JOIN bi y ON x.bk = y.bk AND x.it != y.it
             |  JOIN item ia ON ia.it = x.it JOIN item ic ON ic.it = y.it
             |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
             |SELECT ante, cons, n_ante, n_cons, n_both,
             |  CAST(round(CAST(n_both * 1000 AS DOUBLE) / CAST(n_ante AS DOUBLE))
             |    AS BIGINT) AS conf_milli,
             |  CAST(round(CAST(n_both * n_baskets AS DOUBLE) * 1000000.0
             |    / CAST(n_ante * n_cons AS DOUBLE)) AS BIGINT) AS lift_micro
             |FROM p CROSS JOIN nb
             |ORDER BY lift_micro DESC, ante, cons LIMIT 15""".stripMargin)),

    // Deterministic mixup augmentation: rank-successor pairing, LCG λ,
    // exact integer blend certified through checksum/min/max.
    Q("q285_mixup",
      (s, d) => {
        import s.implicits._
        graft.ext.Similarity.mixupAugment(Tables.embeddings(s, d), "embedding")
          .orderBy($"id")
      },
      Some("""WITH rws AS (
             |  SELECT vec_id AS id,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS am,
             |    CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS r
             |  FROM embeddings),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM rws),
             |p AS (
             |  SELECT a.id, b.id AS partner_id, a.am, b.am AS bm,
             |    (a.id * 1103515245 + 12345) % 1000000007 % 1000 AS lam
             |  FROM rws a CROSS JOIN nn JOIN rws b ON (a.r % n_total) + 1 = b.r),
             |m AS (
             |  SELECT id, partner_id, lam,
             |    list_transform(am, (x,i) ->
             |      CAST(round(CAST(lam*x + (1000-lam)*bm[i] AS DOUBLE)/1000.0) AS BIGINT)) AS mix
             |  FROM p)
             |SELECT id, partner_id, lam AS lambda_milli,
             |  CAST(len(mix) AS BIGINT) AS n_dims,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), mix),
             |    (a, b) -> a + b) AS checksum_micro,
             |  CAST(list_min(mix) AS BIGINT) AS min_micro,
             |  CAST(list_max(mix) AS BIGINT) AS max_micro
             |FROM m ORDER BY id""".stripMargin)),

    // Split-conformal calibration per label: centroid-distance
    // nonconformity, the ⌈0.9(n+1)⌉-th order statistic as threshold,
    // held-out coverage audit.
    Q("q286_conformal",
      (s, d) => {
        import s.implicits._
        Ranking.conformalCalibrate(Tables.embeddings(s, d), "label",
            "embedding", alphaPct = 10)
          .orderBy($"label")
      },
      Some(s"""WITH sp AS (
             |  SELECT vec_id AS id, CAST(label AS BIGINT) AS grp, embedding AS emb,
             |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(vec_id AS VARCHAR))),
             |        j -> CAST(ascii(substring(CAST(vec_id AS VARCHAR), j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) % 100 < 50) AS is_cal
             |  FROM embeddings),
             |dims AS (
             |  SELECT grp,
             |    unnest(list_transform(emb,
             |      (x,i) -> {'pos': CAST(i AS BIGINT),
             |                'xm': CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM sp WHERE is_cal),
             |agg AS (
             |  SELECT grp, pos, CAST(sum(xm) AS BIGINT) AS s,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM dims GROUP BY 1, 2),
             |cent AS (
             |  SELECT grp, list(CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT)
             |    ORDER BY pos) AS cent
             |  FROM agg GROUP BY 1),
             |nc AS (
             |  SELECT sp.grp, sp.id, sp.is_cal,
             |    1000000 - CAST(round(${cosSql("sp.emb", "cent.cent")} * 1000000)
             |      AS BIGINT) AS nc
             |  FROM sp JOIN cent ON cent.grp = sp.grp),
             |cal AS (
             |  SELECT grp, id, nc,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY nc, id)
             |      AS BIGINT) AS rnk
             |  FROM nc WHERE is_cal),
             |cs AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n_cal,
             |    least(CAST(floor(CAST(90*(count(*)+1) + 99 AS DOUBLE)/100.0)
             |      AS BIGINT), CAST(count(*) AS BIGINT)) AS k
             |  FROM cal GROUP BY 1),
             |qh AS (
             |  SELECT cal.grp, cs.n_cal, cs.k, cal.nc AS qhat_nc
             |  FROM cal JOIN cs ON cs.grp = cal.grp AND cal.rnk = cs.k)
             |SELECT t.grp AS label, q.n_cal, q.k, q.qhat_nc,
             |  CAST(count(*) AS BIGINT) AS n_test,
             |  CAST(sum(CASE WHEN t.nc <= q.qhat_nc THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_covered,
             |  CAST(round(CAST(sum(CASE WHEN t.nc <= q.qhat_nc THEN 1 ELSE 0 END)
             |      * 1000 AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cov_milli
             |FROM nc t JOIN qh q ON q.grp = t.grp
             |WHERE NOT t.is_cal
             |GROUP BY 1, 2, 3, 4 ORDER BY label""".stripMargin)),

    // NINTH streaming operator in the gate: fixed-width value-histogram
    // maintenance over the events stream in 8 micro-batches (addition
    // monoid ≡ single pass), with p50/p90 bin flags off the stored
    // cumulative counts.
    Q("q287_stream_histogram",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        import graft.streaming.StreamSketch
        import graft.io.MemDocStore
        val ev = Tables.events(s, d).select($"value")
        val root = graft.core.Scratch.dir("q287_replay")
        ev.repartition(8).write.mode("overwrite").parquet(s"$root/data")
        MemDocStore.drop("q287_hist")
        val stream = s.readStream
          .schema(s.read.parquet(s"$root/data").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/data")
        val q = StreamSketch.runHistogram(stream, "q287_hist", "value",
          width = 8.0, bins = 64)
        q.processAllAvailable()
        q.stop()
        // 64-row bin table: bounded windows by construction
        val wc = Window.orderBy($"bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy()
        StreamSketch.counters(s, "q287_hist")
          .withColumn("cum", sum($"cnt").over(wc))
          .withColumn("total", sum($"cnt").over(wt))
          .select($"bin", $"cnt", $"cum",
            ($"cum" * 2 >= $"total" && ($"cum" - $"cnt") * 2 < $"total")
              .as("is_p50"),
            ($"cum" * 10 >= $"total" * 9 && ($"cum" - $"cnt") * 10 < $"total" * 9)
              .as("is_p90"))
          .orderBy($"bin")
      },
      Some("""WITH b AS (
             |  SELECT CAST(least(greatest(floor(CAST(value AS DOUBLE) / 8.0), 0), 63)
             |    AS BIGINT) AS bin
             |  FROM events),
             |c AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
             |cc AS (
             |  SELECT bin, cnt,
             |    CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
             |    CAST(sum(cnt) OVER () AS BIGINT) AS total
             |  FROM c)
             |SELECT bin, cnt, cum,
             |  (cum*2 >= total AND (cum - cnt)*2 < total) AS is_p50,
             |  (cum*10 >= total*9 AND (cum - cnt)*10 < total*9) AS is_p90
             |FROM cc ORDER BY bin""".stripMargin)),

    // Label-noise screen: share of each panel vector's 10 nearest
    // neighbors carrying a different label (Confident-Learning-lite).
    Q("q288_label_noise",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Ranking.labelNoiseKnn(emb.filter($"vec_id" % 10 === 0), emb, "label",
            k = 10, suspectMin = 6)
          .orderBy($"q_id")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label,
             |  embedding AS q_emb FROM embeddings WHERE vec_id % 10 = 0),
             |j AS (
             |  SELECT q_id, q_label, e.vec_id AS n_id,
             |    CAST(e.label AS BIGINT) AS n_label,
             |    CAST(round(${cosSql("q_emb", "e.embedding")} * 1000000) AS BIGINT) AS sim_micro
             |  FROM q, embeddings e WHERE e.vec_id != q_id),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |    ORDER BY sim_micro DESC, n_id) AS rnk
             |  FROM j)
             |SELECT q_id, q_label,
             |  CAST(sum(CASE WHEN n_label != q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_diff,
             |  CAST(round(CAST(sum(CASE WHEN n_label != q_label THEN 1 ELSE 0 END)
             |    * 1000 AS DOUBLE) / 10.0) AS BIGINT) AS noise_milli,
             |  (CAST(sum(CASE WHEN n_label != q_label THEN 1 ELSE 0 END) AS BIGINT) >= 6)
             |    AS suspect
             |FROM r WHERE rnk <= 10 GROUP BY 1, 2 ORDER BY q_id""".stripMargin)),

    // In-batch InfoNCE: nearest same-label positive, other panel
    // anchors as negatives, micro-rounded exponentials summed exactly.
    Q("q289_infonce_eval",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Ranking.infoNceEval(emb.filter($"vec_id" % 25 === 0), emb, "label")
          .orderBy($"q_id")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label,
             |  embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0),
             |ps AS (
             |  SELECT q.q_id, q.q_label, q.q_emb, e.vec_id AS n_id,
             |    CAST(round(${cosSql("q.q_emb", "e.embedding")} * 1000000) AS BIGINT) AS s
             |  FROM q JOIN embeddings e
             |    ON e.vec_id != q.q_id AND CAST(e.label AS BIGINT) = q.q_label),
             |pos AS (
             |  SELECT q_id, q_label, q_emb, n_id AS pos_id, s AS s_pos FROM (
             |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rnk
             |    FROM ps) WHERE rnk = 1),
             |ng AS (
             |  SELECT p.q_id, p.q_label, p.pos_id, p.s_pos,
             |    CAST(round(${cosSql("p.q_emb", "o.q_emb")} * 1000000) AS BIGINT) AS s_neg
             |  FROM pos p JOIN q o ON o.q_id != p.q_id),
             |ag AS (
             |  SELECT q_id, q_label, pos_id, s_pos,
             |    CAST(count(*) AS BIGINT) AS n_negs,
             |    CAST(sum(CAST(round(exp(CAST(s_neg AS DOUBLE)/1000000.0)*1000000)
             |      AS BIGINT)) AS BIGINT) AS neg_sum
             |  FROM ng GROUP BY 1, 2, 3, 4),
             |fin AS (
             |  SELECT q_id, q_label, pos_id, s_pos, n_negs,
             |    CAST(round(exp(CAST(s_pos AS DOUBLE)/1000000.0)*1000000) AS BIGINT) AS e_pos,
             |    neg_sum
             |  FROM ag)
             |SELECT q_id, q_label, pos_id, s_pos AS s_pos_micro, n_negs,
             |  e_pos + neg_sum AS denom_sum,
             |  CAST(round((ln(CAST(e_pos + neg_sum AS DOUBLE))
             |    - ln(CAST(e_pos AS DOUBLE))) * 1000000) AS BIGINT) AS loss_micro
             |FROM fin ORDER BY q_id""".stripMargin)),

    // Late-interaction MaxSim retrieval: 8 sub-embeddings per vector,
    // query parts each find their best match in the document, top-5.
    Q("q290_maxsim",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Ranking.maxSimTopK(emb.filter($"vec_id" % 50 === 0), emb,
            m = 8, subDim = 8, k = 5)
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH sub AS (
             |  SELECT vec_id, s,
             |    list_transform(embedding[(s*8+1):(s*8+8)],
             |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS sub
             |  FROM embeddings CROSS JOIN range(0, 8) ss(s)),
             |qs AS (SELECT vec_id AS q_id, s AS sq, sub AS qv FROM sub
             |       WHERE vec_id % 50 = 0),
             |ds AS (SELECT vec_id AS n_id, s AS sd, sub AS dv FROM sub),
             |pc AS (
             |  SELECT q_id, n_id, sq,
             |    max(CAST(round(${cosSql("qv", "dv")} * 1000000) AS BIGINT)) AS best
             |  FROM qs JOIN ds ON n_id != q_id
             |  GROUP BY 1, 2, 3),
             |sc AS (SELECT q_id, n_id, CAST(sum(best) AS BIGINT) AS score_micro
             |       FROM pc GROUP BY 1, 2)
             |SELECT q_id, rank, n_id, score_micro FROM (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
             |    ORDER BY score_micro DESC, n_id) AS BIGINT) AS rank
             |  FROM sc)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Per-document token attribution for the NB label model: top-3
    // tokens by |LLR| per panel doc — the classifier's explanation.
    Q("q291_token_attribution",
      (s, d) => {
        import s.implicits._
        LangModel.tokenAttributionTopK(Tables.documents(s, d), "doc_id",
            "text", $"lang" === "en",
            pmod(graft.functions.PolyHash.polyHash($"doc_id".cast("string")),
              lit(100L)) < 80,
            $"doc_id" % 50 === 0, k = 3)
          .select($"id".as("doc_id"), $"rnk", $"tok", $"n_occ", $"llr_micro")
          .orderBy($"doc_id", $"rnk")
      },
      Some(s"""WITH ph AS (
             |  SELECT doc_id, lang = 'en' AS gold,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        j -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) % 100 < 80 AS is_train,
             |    doc_id % 50 = 0 AS in_panel,
             |    string_split_regex(trim(text), '\\s+') AS l
             |  FROM documents),
             |tokrows AS (SELECT doc_id, gold, is_train, in_panel, unnest(l) AS tok
             |            FROM ph),
             |counts AS (
             |  SELECT tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM tokrows WHERE is_train GROUP BY 1),
             |consts AS (
             |  SELECT CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0
             |  FROM counts),
             |model AS (
             |  SELECT tok,
             |    CAST(round((ln(CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))
             |      - ln(CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS llr_micro
             |  FROM counts CROSS JOIN consts),
             |dt AS (
             |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n_occ
             |  FROM tokrows WHERE in_panel GROUP BY 1, 2),
             |rk AS (
             |  SELECT dt.doc_id, dt.tok, dt.n_occ, m.llr_micro,
             |    CAST(row_number() OVER (PARTITION BY dt.doc_id
             |      ORDER BY abs(m.llr_micro) DESC, m.llr_micro DESC, dt.tok)
             |      AS BIGINT) AS rnk
             |  FROM dt JOIN model m ON m.tok = dt.tok)
             |SELECT doc_id, rnk, tok, n_occ, llr_micro
             |FROM rk WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // Agglomerative merge log over the label centroids: 3 unrolled
    // weighted-centroid-linkage rounds, argmin by (cos distance, ids).
    Q("q292_hac_merges",
      (s, d) => {
        import s.implicits._
        val items = graft.ext.Hac.labelCentroidItems(
          Tables.embeddings(s, d), "label", "embedding")
        graft.ext.Hac.mergeLog(s, items, rounds = 3).orderBy($"rnd")
      },
      Some(s"""WITH dims AS (
             |  SELECT CAST(label AS BIGINT) AS id,
             |    unnest(list_transform(embedding,
             |      (x,i) -> {'pos': CAST(i AS BIGINT),
             |                'xm': CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM embeddings),
             |agg AS (
             |  SELECT id, pos, CAST(sum(xm) AS BIGINT) AS sm,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM dims GROUP BY 1, 2),
             |r0 AS (
             |  SELECT id, list(CAST(round(CAST(sm AS DOUBLE) / n) AS BIGINT)
             |    ORDER BY pos) AS cent, min(n) AS size
             |  FROM agg GROUP BY id),
             |p1 AS (
             |  SELECT a.id AS id_a, b.id AS id_b, a.cent AS ca, b.cent AS cb,
             |    a.size AS sa, b.size AS sb,
             |    1000000 - CAST(round(${cosSql("a.cent", "b.cent")} * 1000000) AS BIGINT) AS dist_micro
             |  FROM r0 a JOIN r0 b ON a.id < b.id),
             |b1 AS (SELECT * FROM p1 ORDER BY dist_micro, id_a, id_b LIMIT 1),
             |r1 AS (
             |  SELECT id, cent, size FROM r0
             |  WHERE id NOT IN (SELECT id_a FROM b1 UNION ALL SELECT id_b FROM b1)
             |  UNION ALL
             |  SELECT id_a, list_transform(ca, (x,i) ->
             |      CAST(round(CAST(sa*x + sb*cb[i] AS DOUBLE)
             |        / CAST(sa+sb AS DOUBLE)) AS BIGINT)),
             |    sa + sb
             |  FROM b1),
             |p2 AS (
             |  SELECT a.id AS id_a, b.id AS id_b, a.cent AS ca, b.cent AS cb,
             |    a.size AS sa, b.size AS sb,
             |    1000000 - CAST(round(${cosSql("a.cent", "b.cent")} * 1000000) AS BIGINT) AS dist_micro
             |  FROM r1 a JOIN r1 b ON a.id < b.id),
             |b2 AS (SELECT * FROM p2 ORDER BY dist_micro, id_a, id_b LIMIT 1),
             |r2 AS (
             |  SELECT id, cent, size FROM r1
             |  WHERE id NOT IN (SELECT id_a FROM b2 UNION ALL SELECT id_b FROM b2)
             |  UNION ALL
             |  SELECT id_a, list_transform(ca, (x,i) ->
             |      CAST(round(CAST(sa*x + sb*cb[i] AS DOUBLE)
             |        / CAST(sa+sb AS DOUBLE)) AS BIGINT)),
             |    sa + sb
             |  FROM b2),
             |p3 AS (
             |  SELECT a.id AS id_a, b.id AS id_b,
             |    a.size AS sa, b.size AS sb,
             |    1000000 - CAST(round(${cosSql("a.cent", "b.cent")} * 1000000) AS BIGINT) AS dist_micro
             |  FROM r2 a JOIN r2 b ON a.id < b.id),
             |b3 AS (SELECT * FROM p3 ORDER BY dist_micro, id_a, id_b LIMIT 1)
             |SELECT CAST(1 AS BIGINT) AS rnd, id_a AS cid_a, id_b AS cid_b,
             |  dist_micro, sa + sb AS new_size FROM b1
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), id_a, id_b, dist_micro, sa + sb FROM b2
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), id_a, id_b, dist_micro, sa + sb FROM b3
             |ORDER BY rnd""".stripMargin)),

    // Balanced training shards: token-ranked snake deal into 8 shards,
    // per-shard mass and deviation from the ideal split.
    Q("q293_shard_manifest",
      (s, d) => {
        import s.implicits._
        CorpusOps.shardManifest(Tables.documents(s, d), "doc_id", "text",
            shards = 8)
          .orderBy($"shard")
      },
      Some("""WITH dcs AS (
             |  SELECT doc_id AS id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntok
             |  FROM documents),
             |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY ntok DESC, id)
             |  AS BIGINT) AS rnk FROM dcs),
             |asg AS (SELECT *, (rnk - 1) // 8 AS blk, (rnk - 1) % 8 AS w FROM rk),
             |sh AS (SELECT CASE WHEN blk % 2 = 0 THEN w ELSE 7 - w END AS shard,
             |  ntok FROM asg),
             |ag AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(ntok) AS BIGINT) AS sum_tokens FROM sh GROUP BY 1),
             |t AS (SELECT CAST(sum(sum_tokens) AS BIGINT) AS total FROM ag)
             |SELECT shard, n_docs, sum_tokens,
             |  CAST(round((CAST(sum_tokens AS DOUBLE) - CAST(total AS DOUBLE)/8.0)
             |    / (CAST(total AS DOUBLE)/8.0) * 1000.0) AS BIGINT) AS dev_milli
             |FROM ag CROSS JOIN t ORDER BY shard""".stripMargin)),

    // Cross-source dedup flow: after exact-hash dedup, which source's
    // rows canonicalize into which source's keeper.
    Q("q294_dedup_flow",
      (s, d) => {
        import s.implicits._
        Dedup.dedupFlowMatrix(Tables.documents(s, d), "doc_id",
            concat_ws(" ",
              slice(graft.ext.TextAnalysis.tokens($"text"), 1, 2)),
            "source")
          .orderBy($"src_keep", $"src_dup")
      },
      Some("""WITH rws AS (
             |  SELECT doc_id AS id, source AS src,
             |    array_to_string(string_split_regex(trim(text), '\s+')[1:2], ' ') AS h
             |  FROM documents),
             |keep AS (SELECT h, min(id) AS keep_id, count(*) AS n
             |         FROM rws GROUP BY 1 HAVING count(*) > 1),
             |ks AS (SELECT id AS keep_id, src AS src_keep FROM rws)
             |SELECT k2.src_keep, r.src AS src_dup,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM rws r JOIN keep USING (h) JOIN ks k2 ON k2.keep_id = keep.keep_id
             |WHERE r.id != keep.keep_id
             |GROUP BY 1, 2 ORDER BY src_keep, src_dup""".stripMargin)),

    // Cluster↔label alignment over the 8-seed quantizer: entropies,
    // mutual information, homogeneity — "do the cells mean anything".
    Q("q295_cluster_homogeneity",
      (s, d) => {
        import s.implicits._
        graft.ext.IvfIndex.clusterHomogeneity(Tables.embeddings(s, d),
          "label", "embedding", k = 8)
      },
      Some(s"""WITH v AS (
             |  SELECT vec_id AS id, CAST(label AS BIGINT) AS lab,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS vm
             |  FROM embeddings),
             |seeds AS (SELECT id AS cid, vm AS cm FROM v ORDER BY id LIMIT 8),
             |asg AS (
             |  SELECT id, lab, cell FROM (
             |    SELECT v.id, v.lab, s.cid AS cell,
             |      row_number() OVER (PARTITION BY v.id
             |        ORDER BY ${d2Sql("v.vm", "s.cm")}, s.cid) AS rn
             |    FROM v CROSS JOIN seeds s) WHERE rn = 1),
             |cl AS (SELECT cell, lab, CAST(count(*) AS BIGINT) AS n_cl
             |       FROM asg GROUP BY 1, 2),
             |cc AS (SELECT cell, CAST(sum(n_cl) AS BIGINT) AS n_c FROM cl GROUP BY 1),
             |lc AS (SELECT lab, CAST(sum(n_cl) AS BIGINT) AS n_l FROM cl GROUP BY 1),
             |t AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n FROM cl),
             |hl AS (
             |  SELECT CAST(sum(CAST(round(
             |    -(CAST(n_l AS DOUBLE)/CAST(n AS DOUBLE))
             |    * ln(CAST(n_l AS DOUBLE)/CAST(n AS DOUBLE)) * 1000000) AS BIGINT))
             |    AS BIGINT) AS h_label_micro
             |  FROM lc CROSS JOIN t),
             |hc AS (
             |  SELECT CAST(sum(CAST(round(
             |    -(CAST(n_cl AS DOUBLE)/CAST(n AS DOUBLE))
             |    * ln(CAST(n_cl AS DOUBLE)/CAST(n_c AS DOUBLE)) * 1000000) AS BIGINT))
             |    AS BIGINT) AS h_cond_micro
             |  FROM cl JOIN cc USING (cell) CROSS JOIN t),
             |nc2 AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cc)
             |SELECT n AS n_rows, n_cells, h_label_micro, h_cond_micro,
             |  h_label_micro - h_cond_micro AS mi_micro,
             |  CASE WHEN h_label_micro > 0 THEN
             |    CAST(round((CAST(1.0 AS DOUBLE)
             |      - CAST(h_cond_micro AS DOUBLE)/CAST(h_label_micro AS DOUBLE))
             |      * 1000.0) AS BIGINT)
             |  ELSE CAST(0 AS BIGINT) END AS homogeneity_milli
             |FROM t CROSS JOIN nc2 CROSS JOIN hl CROSS JOIN hc""".stripMargin)),

    // IVFPQ: coarse 8-cell inverted file (full vector as one PQ
    // subspace) + the q267 fine codebooks; queries probe 2 cells and
    // rank by ADC over ONLY the probed lists. Both quantizer tables go
    // through the versioned store and are SERVED FROM THE RELOAD — the
    // build/serve split at the composed-index level (q238's seam),
    // bit-identical because every component is 64-bit integer.
    Q("q341_ivfpq",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q341_ivfpq")
        Versioned.write(Pq.trainCodebooks(s, emb, m = 1, subDim = 64, k = 8),
          dir, "coarse", "00000001_aaa")
        Versioned.write(Pq.trainCodebooks(s, emb, m = 8, subDim = 8, k = 4),
          dir, "fine", "00000001_aaa")
        val coarse = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "coarse"))
        val fine = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "fine"))
        Pq.ivfPqTopK(emb.filter($"vec_id" % 50 === 0), emb, coarse, fine,
            dim = 64, nProbe = 2, m = 8, subDim = 8, k = 5)
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH sub AS (
             |  SELECT vec_id, s,
             |    list_transform(embedding[(s*8+1):(s*8+8)],
             |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS sub
             |  FROM embeddings CROSS JOIN range(0, 8) ss(s)),
             |fullv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
             |  FROM embeddings),
             |cseeds AS (
             |  SELECT vec_id AS cid, fv AS cent FROM fullv
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
             |cd0 AS (
             |  SELECT fullv.vec_id, cseeds.cid,
             |    ${d2Sql("fullv.fv", "cseeds.cent")} AS dd
             |  FROM fullv CROSS JOIN cseeds),
             |ca0 AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
             |    FROM cd0) WHERE rn = 1),
             |cfp AS (
             |  SELECT vec_id, unnest(list_transform(fv,
             |    (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}), recursive := true)
             |  FROM fullv),
             |ccbp AS (
             |  SELECT ca0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM ca0 JOIN cfp p ON p.vec_id = ca0.vec_id
             |  GROUP BY 1, 2),
             |ccb AS (SELECT cid, list(c ORDER BY pos) AS cent FROM ccbp GROUP BY 1),
             |cells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT fullv.vec_id, ccb.cid,
             |      ${d2Sql("fullv.fv", "ccb.cent")} AS dd,
             |      row_number() OVER (PARTITION BY fullv.vec_id
             |        ORDER BY ${d2Sql("fullv.fv", "ccb.cent")}, ccb.cid) AS rn
             |    FROM fullv CROSS JOIN ccb) WHERE rn = 1),
             |probes AS (
             |  SELECT q_id, cell FROM (
             |    SELECT q.vec_id AS q_id, ccb.cid AS cell,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY ${d2Sql("q.fv", "ccb.cent")}, ccb.cid) AS pr
             |    FROM fullv q CROSS JOIN ccb WHERE q.vec_id % 50 = 0)
             |  WHERE pr <= 2),
             |seeds AS (
             |  SELECT s, vec_id AS cid, sub AS cent FROM sub
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
             |d0 AS (
             |  SELECT sub.vec_id, sub.s, seeds.cid,
             |    ${d2Sql("sub.sub", "seeds.cent")} AS dd
             |  FROM sub JOIN seeds ON seeds.s = sub.s),
             |a0 AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |    FROM d0) WHERE rn = 1),
             |subp AS (
             |  SELECT vec_id, s,
             |    unnest(list_transform(sub, (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}),
             |      recursive := true)
             |  FROM sub),
             |cbp AS (
             |  SELECT a0.s, a0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM a0 JOIN subp p ON p.vec_id = a0.vec_id AND p.s = a0.s
             |  GROUP BY 1, 2, 3),
             |cb AS (SELECT s, cid, list(c ORDER BY pos) AS cent FROM cbp GROUP BY 1, 2),
             |d1 AS (
             |  SELECT sub.vec_id, sub.s, cb.cid,
             |    ${d2Sql("sub.sub", "cb.cent")} AS dd
             |  FROM sub JOIN cb ON cb.s = sub.s),
             |codes AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |    FROM d1) WHERE rn = 1),
             |qsub AS (SELECT vec_id AS q_id, s, sub FROM sub WHERE vec_id % 50 = 0),
             |tab AS (
             |  SELECT q_id, cb.s, cb.cid, ${d2Sql("qsub.sub", "cb.cent")} AS dt
             |  FROM qsub JOIN cb ON cb.s = qsub.s),
             |cand AS (
             |  SELECT p.q_id, cells.vec_id
             |  FROM cells JOIN probes p ON p.cell = cells.cell
             |  WHERE p.q_id != cells.vec_id),
             |adc AS (
             |  SELECT cand.q_id, cand.vec_id AS n_id,
             |    CAST(sum(t.dt) AS BIGINT) AS adc_d2
             |  FROM cand JOIN codes c ON c.vec_id = cand.vec_id
             |  JOIN tab t ON t.q_id = cand.q_id AND t.s = c.s AND t.cid = c.cid
             |  GROUP BY 1, 2),
             |topadc AS (
             |  SELECT q_id, n_id, adc_d2,
             |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS BIGINT) AS rank
             |  FROM adc QUALIFY rank <= 5),
             |ex AS (
             |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, ${d2Sql("q.fv", "c.fv")} AS ed
             |  FROM fullv q JOIN fullv c ON q.vec_id % 50 = 0 AND c.vec_id != q.vec_id),
             |ext AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ed, n_id) AS rn
             |    FROM ex) WHERE rn <= 5)
             |SELECT t.q_id AS q_id, t.rank, t.n_id, t.adc_d2,
             |  (e.n_id IS NOT NULL) AS in_exact
             |FROM topadc t LEFT JOIN ext e ON e.q_id = t.q_id AND e.n_id = t.n_id
             |ORDER BY t.q_id, t.rank""".stripMargin)),

    // IVF probe-budget sweep: recall@5 of exact-rerank-within-probed-
    // lists at nProbe ∈ {1,2,4,8} against the full exact top-5, one
    // dataflow for the whole grid — the tuning curve an IVF deployment
    // reads before pinning its probe budget.
    Q("q346_ivf_probe_sweep",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val coarse = graft.ext.IvfIndex.materializeLocal(s,
          Pq.trainCodebooks(s, emb, m = 1, subDim = 64, k = 8))
        Pq.ivfProbeSweep(emb.filter($"vec_id" % 50 === 0), emb, coarse,
            dim = 64, probeGrid = Seq(1, 2, 4, 8), k = 5)
          .orderBy($"n_probe")
      },
      Some(s"""WITH fullv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
             |  FROM embeddings),
             |cseeds AS (
             |  SELECT vec_id AS cid, fv AS cent FROM fullv
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
             |cd0 AS (
             |  SELECT fullv.vec_id, cseeds.cid,
             |    ${d2Sql("fullv.fv", "cseeds.cent")} AS dd
             |  FROM fullv CROSS JOIN cseeds),
             |ca0 AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
             |    FROM cd0) WHERE rn = 1),
             |cfp AS (
             |  SELECT vec_id, unnest(list_transform(fv,
             |    (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}), recursive := true)
             |  FROM fullv),
             |ccbp AS (
             |  SELECT ca0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM ca0 JOIN cfp p ON p.vec_id = ca0.vec_id
             |  GROUP BY 1, 2),
             |ccb AS (SELECT cid, list(c ORDER BY pos) AS cent FROM ccbp GROUP BY 1),
             |cells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT fullv.vec_id, ccb.cid,
             |      row_number() OVER (PARTITION BY fullv.vec_id
             |        ORDER BY ${d2Sql("fullv.fv", "ccb.cent")}, ccb.cid) AS rn
             |    FROM fullv CROSS JOIN ccb) WHERE rn = 1),
             |probes AS (
             |  SELECT q_id, cell, pr FROM (
             |    SELECT q.vec_id AS q_id, ccb.cid AS cell,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY ${d2Sql("q.fv", "ccb.cent")}, ccb.cid) AS pr
             |    FROM fullv q CROSS JOIN ccb WHERE q.vec_id % 50 = 0)
             |  WHERE pr <= 8),
             |cand AS (
             |  SELECT p.q_id, cells.vec_id AS n_id, p.pr,
             |    ${d2Sql("q.fv", "c.fv")} AS dd
             |  FROM cells JOIN probes p ON p.cell = cells.cell
             |  JOIN fullv q ON q.vec_id = p.q_id
             |  JOIN fullv c ON c.vec_id = cells.vec_id
             |  WHERE p.q_id != cells.vec_id),
             |ex AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY ${d2Sql("q.fv", "c.fv")}, c.vec_id) AS rn
             |    FROM fullv q JOIN fullv c
             |      ON q.vec_id % 50 = 0 AND c.vec_id != q.vec_id)
             |  WHERE rn <= 5),
             |grid AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS n_probe),
             |ranked AS (
             |  SELECT g.n_probe, cand.q_id, cand.n_id FROM cand CROSS JOIN grid g
             |  WHERE cand.pr <= g.n_probe
             |  QUALIFY row_number() OVER (PARTITION BY g.n_probe, cand.q_id
             |    ORDER BY cand.dd, cand.n_id) <= 5),
             |hits AS (
             |  SELECT r.n_probe, r.q_id,
             |    CAST(sum(CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_hit
             |  FROM ranked r LEFT JOIN ex e
             |    ON e.q_id = r.q_id AND e.n_id = r.n_id
             |  GROUP BY 1, 2),
             |panel AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id % 50 = 0)
             |SELECT g.n_probe, CAST(count(*) AS BIGINT) AS n_queries,
             |  CAST(round(CAST(sum(coalesce(h.n_hit, 0)) AS DOUBLE)
             |    * CAST(1000 AS DOUBLE)
             |    / CAST(count(*) * 5 AS DOUBLE)) AS BIGINT) AS recall_milli
             |FROM panel CROSS JOIN grid g
             |LEFT JOIN hits h ON h.n_probe = g.n_probe AND h.q_id = panel.q_id
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental ANN index maintenance: quantizers trained on the
    // PRIOR corpus stay frozen; the delta batch (10% of vectors)
    // assigns to the persisted coarse cells + fine codebooks and the
    // appended cells/codes tables publish as the next version; serving
    // runs index-side from the merged RELOAD (no raw corpus embedding
    // touched). Oracle: train on prior, assign ALL, serve — so green
    // proves assign-only maintenance ≡ the full re-encode against the
    // same frozen quantizers.
    Q("q376_incremental_ivfpq",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q376_annidx")
        val prior = emb.filter($"vec_id" % 10 =!= 0)
        // original build: quantizers + assignments from the prior corpus
        Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
          k = 8), dir, "anncoarse", "00000001_aaa")
        Versioned.write(Pq.trainCodebooks(s, prior, m = 8, subDim = 8,
          k = 4), dir, "annfine", "00000001_aaa")
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "anncoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "annfine"))
        Versioned.write(Pq.encode(prior, coarse0, m = 1, subDim = 64)
          .select($"vec_id", $"cid".as("cell")),
          dir, "anncells", "00000001_aaa")
        Versioned.write(Pq.encode(prior, fine0, m = 8, subDim = 8),
          dir, "anncodes", "00000001_aaa")
        Versioned.write(emb.filter($"vec_id" % 10 === 0),
          dir, "annraw", "00000002_bbb")
        graft.pipeline.Incremental.ivfPqIndexCycle(s, dir, "anncoarse",
            "annfine", "anncells", "anncodes", "annraw",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, newTag = "00000002_bbb")
          .orderBy($"q_id", $"rank")
      },
      Some(ivfPqCycleOracleSql())),

    // Tombstone DELETION lane for the ANN index: a takedown batch
    // anti-joins its vec_ids out of BOTH versioned index tables (cells
    // and codes) and serving runs against the purged reload — a deleted
    // vector can never be a candidate (candidates generate FROM the
    // cells table) and never a top-k result. Quantizers stay frozen
    // (deletion purges postings, it does not retrain; cellDrift flags
    // any distribution shift on the next ingest). Oracle = the full
    // rebuild over the surviving vectors against the same frozen
    // quantizers — full-reprocess-minus-deleted.
    Q("q386_ann_delete",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q386_anndel")
        // original full build over the complete corpus
        Versioned.write(Pq.trainCodebooks(s, emb, m = 1, subDim = 64,
          k = 8), dir, "adelcoarse", "00000001_aaa")
        Versioned.write(Pq.trainCodebooks(s, emb, m = 8, subDim = 8,
          k = 4), dir, "adelfine", "00000001_aaa")
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "adelcoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "adelfine"))
        Versioned.write(Pq.encode(emb, coarse0, m = 1, subDim = 64)
          .select($"vec_id", $"cid".as("cell")),
          dir, "adelcells", "00000001_aaa")
        Versioned.write(Pq.encode(emb, fine0, m = 8, subDim = 8),
          dir, "adelcodes", "00000001_aaa")
        Versioned.write(emb.filter($"vec_id" % 13 === 0).select($"vec_id"),
          dir, "adeltomb", "00000002_bbb")
        graft.pipeline.Incremental.annDeleteCycle(s, dir, "adelcoarse",
            "adelfine", "adelcells", "adelcodes", "adeltomb",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, newTag = "00000002_bbb")
          .orderBy($"q_id", $"rank")
      },
      Some(annDeleteOracleSql)),

    // IVFPQ cells/codes over BUCKET-PARTITIONED roots — the vector twin
    // of the q395/q397 stores, completing the partitioned index-state
    // family: a delta's assignments rewrite only the id-range buckets
    // its vec_ids map to; the KB-sized quantizer objects stay
    // object-versioned (annReclusterCycle's drift gate owns them).
    // Same fixture and semantics as q376 — oracle = the full re-encode
    // against the same frozen quantizers.
    Q("q401_ivfpq_partitioned",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q401_pann")
        val bw = 64L
        val bucketOf = graft.pipeline.Incremental.idBucket($"vec_id", bw)
        val prior = emb.filter($"vec_id" % 10 =!= 0)
        Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
          k = 8), dir, "panncoarse", "00000001_aaa")
        Versioned.write(Pq.trainCodebooks(s, prior, m = 8, subDim = 8,
          k = 4), dir, "pannfine", "00000001_aaa")
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "panncoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "pannfine"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, coarse0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
            .withColumn("bucket", bucketOf),
          dir, "panncells", Seq("bucket"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, fine0, m = 8, subDim = 8)
            .withColumn("bucket", bucketOf),
          dir, "panncodes", Seq("bucket"))
        Versioned.write(emb.filter($"vec_id" % 10 === 0),
          dir, "pannraw", "00000002_bbb")
        graft.pipeline.Incremental.ivfPqPartitionedCycle(s, dir,
            "panncoarse", "pannfine", "panncells", "panncodes", "pannraw",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, bucketWidth = bw)
          .orderBy($"q_id", $"rank")
      },
      Some(ivfPqCycleOracleSql())),

    // Tombstone deletion over the bucket-partitioned IVFPQ tables —
    // q386's 100 TB twin: the purge reads and rewrites only the
    // tombstones' buckets in BOTH posting tables; serving runs against
    // the purged reload (a deleted vector can never be a candidate).
    // Oracle = the full rebuild over survivors (q386's).
    Q("q402_ann_partitioned_delete",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q402_panndel")
        val bw = 64L
        val bucketOf = graft.pipeline.Incremental.idBucket($"vec_id", bw)
        Versioned.write(Pq.trainCodebooks(s, emb, m = 1, subDim = 64,
          k = 8), dir, "pdelcoarse", "00000001_aaa")
        Versioned.write(Pq.trainCodebooks(s, emb, m = 8, subDim = 8,
          k = 4), dir, "pdelfine", "00000001_aaa")
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "pdelcoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "pdelfine"))
        Versioned.writePartitionedFull(
          Pq.encode(emb, coarse0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
            .withColumn("bucket", bucketOf),
          dir, "pdelcells", Seq("bucket"))
        Versioned.writePartitionedFull(
          Pq.encode(emb, fine0, m = 8, subDim = 8)
            .withColumn("bucket", bucketOf),
          dir, "pdelcodes", Seq("bucket"))
        Versioned.write(emb.filter($"vec_id" % 13 === 0).select($"vec_id"),
          dir, "pdeltomb", "00000002_bbb")
        graft.pipeline.Incremental.annDeletePartitionedCycle(s, dir,
            "pdelcoarse", "pdelfine", "pdelcells", "pdelcodes", "pdeltomb",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, bucketWidth = bw)
          .orderBy($"q_id", $"rank")
      },
      Some(annDeleteOracleSql)),

    // CHANGEFEED-DRIVEN IVFPQ MAINTENANCE — the ANN member of the
    // corpus-follows-the-lake family (q427 dedup, q428 retrieval): the
    // embedding corpus is a generation-pinned lake root (facade
    // appends at g2, a pinned-DV takedown at g3) and the
    // bucket-partitioned cells/codes tables follow the changefeed —
    // upserts re-encode from the target snapshot against the FROZEN
    // quantizers, removals purge from BOTH posting tables, only
    // touched id-range buckets rewrite, and a taken-down vector can
    // never be a candidate. Oracle = the full re-encode + ADC serve
    // with the indexed corpus restricted to exactly the survivors.
    Q("q429_ivfpq_changefeed",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q429_acf")
        Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
          .filter(_.getName.startsWith("acf_root__")).foreach(_.delete()))
        val bw = 64L
        val bucketOf = graft.pipeline.Incremental.idBucket($"vec_id", bw)
        val bemb = emb.withColumn("bucket", bucketOf)
        val prior = emb.filter($"vec_id" % 10 =!= 0)
        val g1 = "00000001_aaa"
        graft.io.LakeTable.commitSnapshot(s, dir, "acf_root", g1,
          Seq(graft.io.LakeTable.RootPublish("acf_emb", "bucket",
            bemb.filter($"vec_id" % 10 =!= 0).localCheckpoint(true))))
        Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
          k = 8), dir, "acfcoarse", g1)
        Versioned.write(Pq.trainCodebooks(s, prior, m = 8, subDim = 8,
          k = 4), dir, "acffine", g1)
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "acfcoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "acffine"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, coarse0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
            .withColumn("bucket", bucketOf),
          dir, "acfcells", Seq("bucket"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, fine0, m = 8, subDim = 8)
            .withColumn("bucket", bucketOf),
          dir, "acfcodes", Seq("bucket"))
        // g2: the %10 vectors land through the write facade (touched
        // buckets republished whole — unchanged rows never feed)
        val tb = bemb.filter($"vec_id" % 10 === 0)
          .select($"bucket").distinct()
        graft.io.LakeTable.commitSnapshot(s, dir, "acf_root",
          "00000002_bbb",
          Seq(graft.io.LakeTable.RootPublish("acf_emb", "bucket",
            bemb.join(tb, Seq("bucket"), "left_semi")
              .localCheckpoint(true))))
        // g3: the %13 takedown of ORIGINAL vectors as a pinned delete
        // batch (zero data files touched)
        Versioned.commitSnapshotDeleteVectors(s, dir, "acf_root",
          "acf_emb", "bucket", "vec_id",
          bemb.filter($"vec_id" % 13 === 0 && $"vec_id" % 10 =!= 0)
            .select($"bucket", $"vec_id").localCheckpoint(true),
          "00000003_ccc")
        graft.pipeline.Incremental.ivfPqChangefeedCycle(s, dir,
            "acf_root", "acf_emb", "bucket", "acfcoarse", "acffine",
            "acfcells", "acfcodes", g1, "00000003_ccc",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, bucketWidth = bw)
          .orderBy($"q_id", $"rank")
      },
      Some(ivfPqCycleOracleSql(
        "NOT (vec_id % 13 = 0 AND vec_id % 10 <> 0)"))),

    // DRIFT-GATED changefeed IVFPQ maintenance — q429 composed with the
    // q377/q379 honesty stat: before the feed window touches any index
    // state, the upsert batch's cell-share drift against the prior
    // index is measured (Pq.cellDrift, exact integer TV) and a window
    // past the threshold REFUSES incremental maintenance (assign-only
    // against frozen quantizers would silently degrade recall — the
    // refusal routes the caller to the annReclusterCycle rebuild arm;
    // ChangefeedSpec pins the refusal and the no-state-touched
    // guarantee). Here the window admits, and the output carries the
    // window's tv_milli so the oracle proves decision ∧ serve together:
    // the DuckDB side replays the same TV statistic over the same two
    // slices, and green means the gate read the same number.
    Q("q430_ivfpq_changefeed_gated",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q430_agf")
        Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
          .filter(_.getName.startsWith("agf_root__")).foreach(_.delete()))
        val bw = 64L
        val bucketOf = graft.pipeline.Incremental.idBucket($"vec_id", bw)
        val bemb = emb.withColumn("bucket", bucketOf)
        val prior = emb.filter($"vec_id" % 10 =!= 0)
        val g1 = "00000001_aaa"
        graft.io.LakeTable.commitSnapshot(s, dir, "agf_root", g1,
          Seq(graft.io.LakeTable.RootPublish("agf_emb", "bucket",
            bemb.filter($"vec_id" % 10 =!= 0).localCheckpoint(true))))
        Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
          k = 8), dir, "agfcoarse", g1)
        Versioned.write(Pq.trainCodebooks(s, prior, m = 8, subDim = 8,
          k = 4), dir, "agffine", g1)
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "agfcoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "agffine"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, coarse0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
            .withColumn("bucket", bucketOf),
          dir, "agfcells", Seq("bucket"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, fine0, m = 8, subDim = 8)
            .withColumn("bucket", bucketOf),
          dir, "agfcodes", Seq("bucket"))
        val tb = bemb.filter($"vec_id" % 10 === 0)
          .select($"bucket").distinct()
        graft.io.LakeTable.commitSnapshot(s, dir, "agf_root",
          "00000002_bbb",
          Seq(graft.io.LakeTable.RootPublish("agf_emb", "bucket",
            bemb.join(tb, Seq("bucket"), "left_semi")
              .localCheckpoint(true))))
        Versioned.commitSnapshotDeleteVectors(s, dir, "agf_root",
          "agf_emb", "bucket", "vec_id",
          bemb.filter($"vec_id" % 13 === 0 && $"vec_id" % 10 =!= 0)
            .select($"bucket", $"vec_id").localCheckpoint(true),
          "00000003_ccc")
        graft.pipeline.Incremental.ivfPqChangefeedGatedCycle(s, dir,
            "agf_root", "agf_emb", "bucket", "agfcoarse", "agffine",
            "agfcells", "agfcodes", g1, "00000003_ccc",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, bucketWidth = bw, tvMilli = 999L)
          .orderBy($"q_id", $"rank")
      },
      Some(ivfPqCycleOracleSql(
        "NOT (vec_id % 13 = 0 AND vec_id % 10 <> 0)",
        tvPreds = Some(("vec_id % 10 <> 0", "vec_id % 10 = 0"))))),

    // SELF-HEALING changefeed IVFPQ maintenance — q430's gate with the
    // q379 rebuild arm lifted onto the LAKE lane, so the consumer loop
    // never stops: the prior index is trained on everything BELOW the
    // first component's upper tail (micro-int <= 250000) and the feed
    // window lands exactly that tail — a genuine distribution break
    // whose cell-share drift the gate measures. tv past the threshold makes
    // the cycle RETRAIN both quantizers on the target snapshot's
    // merge-on-read corpus (pinned takedowns excluded from the new
    // codebooks), republish them as the next quantizer version, and
    // rewrite both posting tables whole; below the threshold it is
    // q429's O(feed) maintenance. Neither engine hardcodes the branch:
    // the output carries (tv_milli, path) and the oracle replays BOTH
    // complete chains plus the same TV statistic, gating each branch's
    // rows on it — green proves decision ∧ chosen path together.
    Q("q432_ivfpq_changefeed_auto",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q432_aau")
        // rerun hygiene: wipe the manifests AND the quantizer object
        // versions (a prior rep's rebuild published a newer version
        // that readLatest would otherwise resolve as fixture state)
        Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
          .filter(f => f.getName.startsWith("aau_root__") ||
            f.getName.startsWith("aaucoarse__") ||
            f.getName.startsWith("aaufine__"))
          .foreach(graft.core.Scratch.deleteRecursively))
        val bw = 64L
        val bucketOf = graft.pipeline.Incremental.idBucket($"vec_id", bw)
        // the distribution break, in micro-int space on BOTH engines:
        // the prior index never saw the first component's upper tail,
        // and the feed window lands exactly that tail — a small batch
        // concentrated in the few nearest cells, the strongest
        // cell-share drift a real ingest produces
        val hs = round(element_at($"embedding", 1).cast("double")
          * 1000000, 0).cast("long") > 250000L
        val bemb = emb.withColumn("bucket", bucketOf)
        val prior = emb.filter(!hs)
        val g1 = "00000001_aaa"
        graft.io.LakeTable.commitSnapshot(s, dir, "aau_root", g1,
          Seq(graft.io.LakeTable.RootPublish("aau_emb", "bucket",
            bemb.filter(!hs).localCheckpoint(true))))
        Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
          k = 8), dir, "aaucoarse", g1)
        Versioned.write(Pq.trainCodebooks(s, prior, m = 8, subDim = 8,
          k = 4), dir, "aaufine", g1)
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "aaucoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "aaufine"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, coarse0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
            .withColumn("bucket", bucketOf),
          dir, "aaucells", Seq("bucket"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, fine0, m = 8, subDim = 8)
            .withColumn("bucket", bucketOf),
          dir, "aaucodes", Seq("bucket"))
        // g2: the other half-space lands (touched buckets whole)
        val tb = bemb.filter(hs).select($"bucket").distinct()
        graft.io.LakeTable.commitSnapshot(s, dir, "aau_root",
          "00000002_bbb",
          Seq(graft.io.LakeTable.RootPublish("aau_emb", "bucket",
            bemb.join(tb, Seq("bucket"), "left_semi")
              .localCheckpoint(true))))
        // g3: the %13 takedown of ORIGINAL vectors as a pinned batch
        Versioned.commitSnapshotDeleteVectors(s, dir, "aau_root",
          "aau_emb", "bucket", "vec_id",
          bemb.filter($"vec_id" % 13 === 0 && !hs)
            .select($"bucket", $"vec_id").localCheckpoint(true),
          "00000003_ccc")
        graft.pipeline.Incremental.ivfPqChangefeedAutoCycle(s, dir,
            "aau_root", "aau_emb", "bucket", "aaucoarse", "aaufine",
            "aaucells", "aaucodes", g1, "00000003_ccc",
            emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
            m = 8, subDim = 8, k = 5, kCells = 8, kSub = 4,
            bucketWidth = bw, tvMilli = 250L, newTag = "00000004_idx")
          .orderBy($"q_id", $"rank")
      },
      Some({
        val hsSql = "CAST(round(CAST(embedding[1] AS DOUBLE)*1000000) " +
          "AS BIGINT) > 250000"
        ivfPqAutoOracleSql(250L,
          trainPriorWhere = s"NOT ($hsSql)",
          upsertWhere = hsSql,
          survivorsWhere = s"NOT (vec_id % 13 = 0 AND NOT ($hsSql))")
      })),

    // The AUTONOMOUS consumer — followManifest × the self-healing auto
    // cycle, window by window: the tail-batch window may TRIP the gate
    // and rebuild mid-loop (publishing the retrained quantizer as the
    // next version), and the following takedown window then maintains
    // INCREMENTALLY against whatever quantizer the previous window left
    // behind — the composition a single-window gate cannot exercise.
    // The final serve's ADC distances are a function of WHICH quantizer
    // won window 1, so the branched oracle (assign twin trained on the
    // prior corpus, rebuild twin retrained on the g2 snapshot = the
    // full table, both indexing the g3 survivors, rows gated on the
    // replayed window-1 tv) verifies the whole trail from the output
    // alone.
    Q("q433_ivfpq_follow_auto",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = graft.core.Scratch.dir("q433_afl")
        Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
          .filter(f => f.getName.startsWith("afl_root__") ||
            f.getName.startsWith("aflcoarse__") ||
            f.getName.startsWith("aflfine__"))
          .foreach(graft.core.Scratch.deleteRecursively))
        val bw = 64L
        val bucketOf = graft.pipeline.Incremental.idBucket($"vec_id", bw)
        val hs = round(element_at($"embedding", 1).cast("double")
          * 1000000, 0).cast("long") > 250000L
        val bemb = emb.withColumn("bucket", bucketOf)
        val prior = emb.filter(!hs)
        val g1 = "00000001_aaa"
        graft.io.LakeTable.commitSnapshot(s, dir, "afl_root", g1,
          Seq(graft.io.LakeTable.RootPublish("afl_emb", "bucket",
            bemb.filter(!hs).localCheckpoint(true))))
        Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
          k = 8), dir, "aflcoarse", g1)
        Versioned.write(Pq.trainCodebooks(s, prior, m = 8, subDim = 8,
          k = 4), dir, "aflfine", g1)
        val coarse0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "aflcoarse"))
        val fine0 = graft.ext.IvfIndex.materializeLocal(s,
          Versioned.readLatest(s, dir, "aflfine"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, coarse0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
            .withColumn("bucket", bucketOf),
          dir, "aflcells", Seq("bucket"))
        Versioned.writePartitionedFull(
          Pq.encode(prior, fine0, m = 8, subDim = 8)
            .withColumn("bucket", bucketOf),
          dir, "aflcodes", Seq("bucket"))
        // g2: the tail batch; g3: the %13 takedown of ORIGINAL vectors
        val tb = bemb.filter(hs).select($"bucket").distinct()
        graft.io.LakeTable.commitSnapshot(s, dir, "afl_root",
          "00000002_bbb",
          Seq(graft.io.LakeTable.RootPublish("afl_emb", "bucket",
            bemb.join(tb, Seq("bucket"), "left_semi")
              .localCheckpoint(true))))
        Versioned.commitSnapshotDeleteVectors(s, dir, "afl_root",
          "afl_emb", "bucket", "vec_id",
          bemb.filter($"vec_id" % 13 === 0 && !hs)
            .select($"bucket", $"vec_id").localCheckpoint(true),
          "00000003_ccc")
        // the consumer loop: one AUTO window per committed tag window;
        // a rebuild publishes its quantizer at "<toTag>_idx" (sorts
        // after the batch tag, before the next one)
        var serve: org.apache.spark.sql.DataFrame = null
        val cursor = Versioned.followManifest(dir, "afl_root", g1) {
          (a, b) =>
            serve = graft.pipeline.Incremental.ivfPqChangefeedAutoCycle(
              s, dir, "afl_root", "afl_emb", "bucket", "aflcoarse",
              "aflfine", "aflcells", "aflcodes", a, b,
              emb.filter($"vec_id" % 50 === 1), dim = 64, nProbe = 2,
              m = 8, subDim = 8, k = 5, kCells = 8, kSub = 4,
              bucketWidth = bw, tvMilli = 250L, newTag = s"${b}_idx")
        }
        require(cursor == "00000003_ccc",
          s"consumer did not catch up: cursor '$cursor'")
        // the per-window (tv, path) trail describes the LAST window; the
        // window-1 decision is visible through the ADC values themselves
        serve.select($"q_id", $"rank", $"n_id", $"adc_d2")
          .orderBy($"q_id", $"rank")
      },
      Some({
        val hsSql = "CAST(round(CAST(embedding[1] AS DOUBLE)*1000000) " +
          "AS BIGINT) > 250000"
        ivfPqAutoOracleSql(250L,
          trainPriorWhere = s"NOT ($hsSql)",
          upsertWhere = hsSql,
          survivorsWhere = s"NOT (vec_id % 13 = 0 AND NOT ($hsSql))",
          trainRebuildWhere = Some("TRUE"),
          carryTv = false)
      })),


    // The frozen-quantizer honesty stat: per-cell population drift
    // between the prior index and the delta batch, with the
    // total-variation rebuild trigger — the number an incrementally
    // maintained IVF index must report so quantizer staleness is
    // measured, not assumed away.
    Q("q377_ann_cell_drift",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val prior = emb.filter($"vec_id" % 10 =!= 0)
        val delta = emb.filter($"vec_id" % 10 === 0)
        val coarse = graft.ext.IvfIndex.materializeLocal(s,
          Pq.trainCodebooks(s, prior, m = 1, subDim = 64, k = 8))
        def cellsOf(df: org.apache.spark.sql.DataFrame) =
          Pq.encode(df, coarse, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell"))
        Pq.cellDrift(coarse, cellsOf(prior), cellsOf(delta))
          .orderBy($"cell")
      },
      Some(s"""WITH fullv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
             |  FROM embeddings),
             |cseeds AS (
             |  SELECT vec_id AS cid, fv AS cent FROM fullv
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings
             |    WHERE vec_id % 10 <> 0 ORDER BY vec_id LIMIT 8)),
             |cd0 AS (
             |  SELECT fullv.vec_id, cseeds.cid,
             |    ${d2Sql("fullv.fv", "cseeds.cent")} AS dd
             |  FROM fullv CROSS JOIN cseeds WHERE fullv.vec_id % 10 <> 0),
             |ca0 AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
             |    FROM cd0) WHERE rn = 1),
             |cfp AS (
             |  SELECT vec_id, unnest(list_transform(fv,
             |    (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}), recursive := true)
             |  FROM fullv),
             |ccbp AS (
             |  SELECT ca0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM ca0 JOIN cfp p ON p.vec_id = ca0.vec_id
             |  GROUP BY 1, 2),
             |ccb AS (SELECT cid, list(c ORDER BY pos) AS cent FROM ccbp GROUP BY 1),
             |cells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT fullv.vec_id, ccb.cid,
             |      ${d2Sql("fullv.fv", "ccb.cent")} AS dd,
             |      row_number() OVER (PARTITION BY fullv.vec_id
             |        ORDER BY ${d2Sql("fullv.fv", "ccb.cent")}, ccb.cid) AS rn
             |    FROM fullv CROSS JOIN ccb) WHERE rn = 1),
             |base AS (
             |  SELECT ccb.cid AS cell,
             |    coalesce(p.n_prior, 0) AS n_prior,
             |    coalesce(q.n_delta, 0) AS n_delta
             |  FROM ccb
             |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n_prior
             |    FROM cells WHERE vec_id % 10 <> 0 GROUP BY 1) p
             |    ON p.cell = ccb.cid
             |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n_delta
             |    FROM cells WHERE vec_id % 10 = 0 GROUP BY 1) q
             |    ON q.cell = ccb.cid),
             |t AS (SELECT CAST(sum(n_prior) AS BIGINT) AS tp,
             |        CAST(sum(n_delta) AS BIGINT) AS td FROM base),
             |m AS (
             |  SELECT cell, n_prior, n_delta,
             |    CAST(round(CAST(n_prior AS DOUBLE) * CAST(1000 AS DOUBLE)
             |      / CAST(tp AS DOUBLE)) AS BIGINT) AS prior_milli,
             |    CAST(round(CAST(n_delta AS DOUBLE) * CAST(1000 AS DOUBLE)
             |      / CAST(td AS DOUBLE)) AS BIGINT) AS delta_milli
             |  FROM base CROSS JOIN t),
             |m2 AS (SELECT *, abs(delta_milli - prior_milli) AS drift_milli
             |  FROM m),
             |tv AS (SELECT CAST(sum(drift_milli) AS BIGINT) // 2 AS tv_milli
             |  FROM m2)
             |SELECT cell, n_prior, n_delta, prior_milli, delta_milli,
             |  drift_milli, tv_milli, tv_milli > 250 AS rebuild
             |FROM m2 CROSS JOIN tv ORDER BY cell""".stripMargin)),

    // Drift-triggered CONDITIONAL re-cluster: two cycles over the same
    // prior index + delta, one with a lax TV threshold (frozen-quantizer
    // assign path) and one with a strict threshold (full retrain on
    // prior ∪ delta). Neither side hardcodes the branch — the Spark
    // cycle reads its own integer drift stat, the oracle derives the
    // SAME stat from its replay and gates each branch's rows on it, so
    // green proves decision ∧ chosen path both match bit-for-bit.
    Q("q379_ann_recluster",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val prior = emb.filter($"vec_id" % 10 =!= 0)
        val delta = emb.filter($"vec_id" % 10 === 0)
        def setup(tag: String): String = {
          val dir = graft.core.Scratch.dir(s"q379_recluster_$tag")
          Versioned.write(Pq.trainCodebooks(s, prior, m = 1, subDim = 64,
            k = 8), dir, "rcoarse", "00000001_aaa")
          val c0 = graft.ext.IvfIndex.materializeLocal(s,
            Versioned.readLatest(s, dir, "rcoarse"))
          Versioned.write(Pq.encode(prior, c0, m = 1, subDim = 64)
            .select($"vec_id", $"cid".as("cell")),
            dir, "rcells", "00000001_aaa")
          Versioned.write(prior, dir, "rprior", "00000001_aaa")
          Versioned.write(delta, dir, "rdelta", "00000002_bbb")
          dir
        }
        // the two cycles SHARE one fixture dir (one coarse train + one
        // prior encode, not two): their inputs are the same original
        // versions — `_next` prefixes never match a `rcoarse`/`rcells`
        // listing — and each publishes under its own ordered tag, with
        // cycle a's output path pinned at resolve time before b writes
        val dir0 = setup("shared")
        val a = graft.pipeline.Incremental.annReclusterCycle(s, dir0,
            "rcoarse", "rcells", "rprior", "rdelta", dim = 64, kCells = 8,
            tvMilli = 900L, newTag = "00000002_bbb")
          .withColumn("cycle", lit("a"))
        val b = graft.pipeline.Incremental.annReclusterCycle(s, dir0,
            "rcoarse", "rcells", "rprior", "rdelta", dim = 64, kCells = 8,
            tvMilli = 1L, newTag = "00000003_ccc")
          .withColumn("cycle", lit("b"))
        a.unionByName(b)
          .select($"cycle", $"path", $"tv_milli", $"cell", $"n_vec")
          .orderBy($"cycle", $"cell")
      },
      Some(s"""WITH fullv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
             |  FROM embeddings),
             |cseeds AS (
             |  SELECT vec_id AS cid, fv AS cent FROM fullv
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings
             |    WHERE vec_id % 10 <> 0 ORDER BY vec_id LIMIT 8)),
             |cd0 AS (
             |  SELECT fullv.vec_id, cseeds.cid,
             |    ${d2Sql("fullv.fv", "cseeds.cent")} AS dd
             |  FROM fullv CROSS JOIN cseeds WHERE fullv.vec_id % 10 <> 0),
             |ca0 AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
             |    FROM cd0) WHERE rn = 1),
             |cfp AS (
             |  SELECT vec_id, unnest(list_transform(fv,
             |    (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}), recursive := true)
             |  FROM fullv),
             |ccbp AS (
             |  SELECT ca0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM ca0 JOIN cfp p ON p.vec_id = ca0.vec_id
             |  GROUP BY 1, 2),
             |ccb AS (SELECT cid, list(c ORDER BY pos) AS cent FROM ccbp GROUP BY 1),
             |cells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT fullv.vec_id, ccb.cid,
             |      ${d2Sql("fullv.fv", "ccb.cent")} AS dd,
             |      row_number() OVER (PARTITION BY fullv.vec_id
             |        ORDER BY ${d2Sql("fullv.fv", "ccb.cent")}, ccb.cid) AS rn
             |    FROM fullv CROSS JOIN ccb) WHERE rn = 1),
             |base AS (
             |  SELECT ccb.cid AS cell,
             |    coalesce(p.n_prior, 0) AS n_prior,
             |    coalesce(q.n_delta, 0) AS n_delta
             |  FROM ccb
             |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n_prior
             |    FROM cells WHERE vec_id % 10 <> 0 GROUP BY 1) p
             |    ON p.cell = ccb.cid
             |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n_delta
             |    FROM cells WHERE vec_id % 10 = 0 GROUP BY 1) q
             |    ON q.cell = ccb.cid),
             |t AS (SELECT CAST(sum(n_prior) AS BIGINT) AS tp,
             |        CAST(sum(n_delta) AS BIGINT) AS td FROM base),
             |m2 AS (
             |  SELECT cell,
             |    abs(CAST(round(CAST(n_delta AS DOUBLE) * CAST(1000 AS DOUBLE)
             |          / CAST(td AS DOUBLE)) AS BIGINT)
             |      - CAST(round(CAST(n_prior AS DOUBLE) * CAST(1000 AS DOUBLE)
             |          / CAST(tp AS DOUBLE)) AS BIGINT)) AS drift_milli
             |  FROM base CROSS JOIN t),
             |tv AS (SELECT CAST(sum(drift_milli) AS BIGINT) // 2 AS tv_milli
             |  FROM m2),
             |rseeds AS (
             |  SELECT vec_id AS cid, fv AS cent FROM fullv
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings
             |    ORDER BY vec_id LIMIT 8)),
             |rd0 AS (
             |  SELECT fullv.vec_id, rseeds.cid,
             |    ${d2Sql("fullv.fv", "rseeds.cent")} AS dd
             |  FROM fullv CROSS JOIN rseeds),
             |ra0 AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
             |    FROM rd0) WHERE rn = 1),
             |rcbp AS (
             |  SELECT ra0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM ra0 JOIN cfp p ON p.vec_id = ra0.vec_id
             |  GROUP BY 1, 2),
             |rcb AS (SELECT cid, list(c ORDER BY pos) AS cent FROM rcbp GROUP BY 1),
             |rcells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT fullv.vec_id, rcb.cid,
             |      ${d2Sql("fullv.fv", "rcb.cent")} AS dd,
             |      row_number() OVER (PARTITION BY fullv.vec_id
             |        ORDER BY ${d2Sql("fullv.fv", "rcb.cent")}, rcb.cid) AS rn
             |    FROM fullv CROSS JOIN rcb) WHERE rn = 1),
             |apop AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vec
             |  FROM cells GROUP BY 1),
             |rpop AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vec
             |  FROM rcells GROUP BY 1),
             |sel AS (SELECT 'a' AS cycle, CAST(900 AS BIGINT) AS thr
             |  UNION ALL SELECT 'b', CAST(1 AS BIGINT))
             |SELECT cycle, path, tv_milli, cell, n_vec FROM (
             |  SELECT sel.cycle, 'assign' AS path, tv.tv_milli, p.cell, p.n_vec
             |  FROM sel CROSS JOIN tv JOIN apop p ON tv.tv_milli <= sel.thr
             |  UNION ALL
             |  SELECT sel.cycle, 'rebuild', tv.tv_milli, p.cell, p.n_vec
             |  FROM sel CROSS JOIN tv JOIN rpop p ON tv.tv_milli > sel.thr)
             |ORDER BY cycle, cell""".stripMargin))
  )

  /** CTEs shared by every IVFPQ oracle chain: micro-int subvectors and
    * full vectors, their positional explosions (Lloyd-step inputs), and
    * the `%50 = 1` query panel.
    */
  private def ivfPqSharedCtes: String =
    """sub AS (
      |  SELECT vec_id, s,
      |    list_transform(embedding[(s*8+1):(s*8+8)],
      |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS sub
      |  FROM embeddings CROSS JOIN range(0, 8) ss(s)),
      |fullv AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
      |  FROM embeddings),
      |cfp AS (
      |  SELECT vec_id, unnest(list_transform(fv,
      |    (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}), recursive := true)
      |  FROM fullv),
      |subp AS (
      |  SELECT vec_id, s,
      |    unnest(list_transform(sub, (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}),
      |      recursive := true)
      |  FROM sub),
      |qsub AS (SELECT vec_id AS q_id, s, sub FROM sub WHERE vec_id % 50 = 1)"""
      .stripMargin

  /** One full IVFPQ train → assign → ADC chain, suffix-namespaced so
    * two chains with DIFFERENT training corpora can coexist in a single
    * oracle (the q432 branched replay): coarse (k=8) and fine (m=8,
    * k=4) codebooks train on `trainWhere`'s rows (seeds = lowest
    * vec_ids, one exact-integer Lloyd step — [[graft.ext.Pq
    * .trainCodebooks]]), `corpusWhere`'s rows index, the shared `qsub`
    * panel probes 2 lists. Emits CTEs ending in `adc$sfx`; expects
    * [[ivfPqSharedCtes]] in scope. Both predicates are SQL over the
    * raw `embeddings` table (vec_id, embedding).
    */
  private def ivfPqServeCtes(sfx: String, trainWhere: String,
                             corpusWhere: String): String =
    s"""trainv$sfx AS (SELECT vec_id FROM embeddings WHERE $trainWhere),
       |corpv$sfx AS (SELECT vec_id FROM embeddings WHERE $corpusWhere),
       |cseeds$sfx AS (
       |  SELECT vec_id AS cid, fv AS cent FROM fullv
       |  WHERE vec_id IN (SELECT vec_id FROM trainv$sfx
       |    ORDER BY vec_id LIMIT 8)),
       |cd0$sfx AS (
       |  SELECT fullv.vec_id, cseeds$sfx.cid,
       |    ${d2Sql("fullv.fv", s"cseeds$sfx.cent")} AS dd
       |  FROM fullv CROSS JOIN cseeds$sfx
       |  WHERE fullv.vec_id IN (SELECT vec_id FROM trainv$sfx)),
       |ca0$sfx AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
       |    FROM cd0$sfx) WHERE rn = 1),
       |ccbp$sfx AS (
       |  SELECT ca0$sfx.cid, p.pos,
       |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
       |  FROM ca0$sfx JOIN cfp p ON p.vec_id = ca0$sfx.vec_id
       |  GROUP BY 1, 2),
       |ccb$sfx AS (SELECT cid, list(c ORDER BY pos) AS cent FROM ccbp$sfx GROUP BY 1),
       |cells$sfx AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT fullv.vec_id, ccb$sfx.cid,
       |      ${d2Sql("fullv.fv", s"ccb$sfx.cent")} AS dd,
       |      row_number() OVER (PARTITION BY fullv.vec_id
       |        ORDER BY ${d2Sql("fullv.fv", s"ccb$sfx.cent")}, ccb$sfx.cid) AS rn
       |    FROM fullv CROSS JOIN ccb$sfx
       |    WHERE fullv.vec_id IN (SELECT vec_id FROM corpv$sfx)) WHERE rn = 1),
       |probes$sfx AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.vec_id AS q_id, ccb$sfx.cid AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${d2Sql("q.fv", s"ccb$sfx.cent")}, ccb$sfx.cid) AS pr
       |    FROM fullv q CROSS JOIN ccb$sfx WHERE q.vec_id % 50 = 1)
       |  WHERE pr <= 2),
       |seeds$sfx AS (
       |  SELECT s, vec_id AS cid, sub AS cent FROM sub
       |  WHERE vec_id IN (SELECT vec_id FROM trainv$sfx
       |    ORDER BY vec_id LIMIT 4)),
       |d0$sfx AS (
       |  SELECT sub.vec_id, sub.s, seeds$sfx.cid,
       |    ${d2Sql("sub.sub", s"seeds$sfx.cent")} AS dd
       |  FROM sub JOIN seeds$sfx ON seeds$sfx.s = sub.s
       |  WHERE sub.vec_id IN (SELECT vec_id FROM trainv$sfx)),
       |a0$sfx AS (
       |  SELECT vec_id, s, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
       |    FROM d0$sfx) WHERE rn = 1),
       |cbp$sfx AS (
       |  SELECT a0$sfx.s, a0$sfx.cid, p.pos,
       |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
       |  FROM a0$sfx JOIN subp p ON p.vec_id = a0$sfx.vec_id AND p.s = a0$sfx.s
       |  GROUP BY 1, 2, 3),
       |cb$sfx AS (SELECT s, cid, list(c ORDER BY pos) AS cent FROM cbp$sfx GROUP BY 1, 2),
       |d1$sfx AS (
       |  SELECT sub.vec_id, sub.s, cb$sfx.cid,
       |    ${d2Sql("sub.sub", s"cb$sfx.cent")} AS dd
       |  FROM sub JOIN cb$sfx ON cb$sfx.s = sub.s
       |  WHERE sub.vec_id IN (SELECT vec_id FROM corpv$sfx)),
       |codes$sfx AS (
       |  SELECT vec_id, s, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
       |    FROM d1$sfx) WHERE rn = 1),
       |tab$sfx AS (
       |  SELECT q_id, cb$sfx.s, cb$sfx.cid, ${d2Sql("qsub.sub", s"cb$sfx.cent")} AS dt
       |  FROM qsub JOIN cb$sfx ON cb$sfx.s = qsub.s),
       |cand$sfx AS (
       |  SELECT p.q_id, cells$sfx.vec_id
       |  FROM cells$sfx JOIN probes$sfx p ON p.cell = cells$sfx.cell
       |  WHERE p.q_id != cells$sfx.vec_id),
       |adc$sfx AS (
       |  SELECT cand$sfx.q_id, cand$sfx.vec_id AS n_id,
       |    CAST(sum(t.dt) AS BIGINT) AS adc_d2
       |  FROM cand$sfx JOIN codes$sfx c ON c.vec_id = cand$sfx.vec_id
       |  JOIN tab$sfx t ON t.q_id = cand$sfx.q_id AND t.s = c.s AND t.cid = c.cid
       |  GROUP BY 1, 2)""".stripMargin

  /** The [[graft.ext.Pq.cellDrift]] total-variation replay: per-cell
    * populations of the `priorWhere` and `deltaWhere` slices (both SQL
    * over `embeddings`), assigned against the `ccb$sfx` quantizer,
    * milli shares, integer TV. Emits a one-row `tv(tv_milli)` CTE.
    */
  private def ivfPqDriftCtes(sfx: String, priorWhere: String,
                             deltaWhere: String): String =
    s"""cellsAll AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT fullv.vec_id, ccb$sfx.cid,
       |      row_number() OVER (PARTITION BY fullv.vec_id
       |        ORDER BY ${d2Sql("fullv.fv", s"ccb$sfx.cent")}, ccb$sfx.cid) AS rn
       |    FROM fullv CROSS JOIN ccb$sfx) WHERE rn = 1),
       |dbase AS (
       |  SELECT ccb$sfx.cid AS cell,
       |    coalesce(p.n_prior, 0) AS n_prior,
       |    coalesce(q.n_delta, 0) AS n_delta
       |  FROM ccb$sfx
       |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n_prior
       |    FROM cellsAll WHERE vec_id IN
       |      (SELECT vec_id FROM embeddings WHERE $priorWhere)
       |    GROUP BY 1) p ON p.cell = ccb$sfx.cid
       |  LEFT JOIN (SELECT cell, CAST(count(*) AS BIGINT) AS n_delta
       |    FROM cellsAll WHERE vec_id IN
       |      (SELECT vec_id FROM embeddings WHERE $deltaWhere)
       |    GROUP BY 1) q ON q.cell = ccb$sfx.cid),
       |dtot AS (SELECT CAST(sum(n_prior) AS BIGINT) AS tp,
       |  CAST(sum(n_delta) AS BIGINT) AS td FROM dbase),
       |dm AS (
       |  SELECT abs(
       |    CAST(round(CAST(n_delta AS DOUBLE) * CAST(1000 AS DOUBLE)
       |      / CAST(td AS DOUBLE)) AS BIGINT)
       |    - CAST(round(CAST(n_prior AS DOUBLE) * CAST(1000 AS DOUBLE)
       |      / CAST(tp AS DOUBLE)) AS BIGINT)) AS dr
       |  FROM dbase CROSS JOIN dtot),
       |tv AS (SELECT CAST(sum(dr) AS BIGINT) // 2 AS tv_milli FROM dm)"""
      .stripMargin

  /** Full-reprocess oracle for the incremental IVFPQ cycles
    * (q376 object lane, q401 partitioned lane): train on the prior
    * (`vec_id % 10 <> 0`) corpus, assign `corpusWhere`'s vectors
    * against the frozen quantizers, serve. With `tvPreds =
    * Some((priorWhere, deltaWhere))` the oracle ALSO replays the
    * [[graft.ext.Pq.cellDrift]] total-variation statistic between
    * those two slices' cell populations and carries `tv_milli` on
    * every row — the q430 gate proves decision ∧ serve together.
    */
  private def ivfPqCycleOracleSql(
      corpusWhere: String = "TRUE",
      tvPreds: Option[(String, String)] = None): String = {
    val driftCtes = tvPreds.map { case (priorW, deltaW) =>
      ",\n" + ivfPqDriftCtes("", priorW, deltaW)
    }.getOrElse("")
    val finalSelect =
      if (tvPreds.isDefined)
        """SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
          |    ORDER BY adc_d2, n_id) AS BIGINT) AS rank,
          |  n_id, adc_d2, tv.tv_milli
          |FROM adc CROSS JOIN tv QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin
      else
        """SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
          |    ORDER BY adc_d2, n_id) AS BIGINT) AS rank,
          |  n_id, adc_d2
          |FROM adc QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin
    s"""WITH $ivfPqSharedCtes,
       |${ivfPqServeCtes("", "vec_id % 10 <> 0", corpusWhere)}$driftCtes
       |$finalSelect""".stripMargin
  }

  /** Branched oracle for the SELF-HEALING changefeed cycle (q432): two
    * complete IVFPQ chains — the ASSIGN twin (quantizers trained on the
    * prior corpus) and the REBUILD twin (retrained on the survivors) —
    * plus the drift replay against the PRIOR quantizer; each branch's
    * rows are gated on the replayed tv vs `thr`, so neither engine
    * hardcodes the branch and green proves decision ∧ chosen path
    * together (the q379 pattern, lifted onto the lake lane).
    *
    * The replay gates on tv ALONE — it assumes a warm prior index
    * (q432's fixture trains on a non-empty corpus). The cycle's
    * cold-index force (tp=0, td>0 → rebuild at tv=0) rides
    * [[graft.ext.Pq.cellDrift]]'s flag, whose empty-side cases IvfSpec
    * pins.
    */
  private def ivfPqAutoOracleSql(thr: Long, trainPriorWhere: String,
                                 upsertWhere: String,
                                 survivorsWhere: String,
                                 trainRebuildWhere: Option[String] = None,
                                 carryTv: Boolean = true): String = {
    val tvCols = if (carryTv) ", tv.tv_milli" else ""
    val pathA = if (carryTv) ", 'assign' AS path" else ""
    val pathR = if (carryTv) ", 'rebuild' AS path" else ""
    s"""WITH $ivfPqSharedCtes,
       |${ivfPqServeCtes("_a", trainPriorWhere, survivorsWhere)},
       |${ivfPqServeCtes("_r",
          trainRebuildWhere.getOrElse(survivorsWhere), survivorsWhere)},
       |${ivfPqDriftCtes("_a", trainPriorWhere, upsertWhere)},
       |srv_a AS (
       |  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_d2, n_id) AS BIGINT) AS rank, n_id, adc_d2
       |  FROM adc_a QUALIFY rank <= 5),
       |srv_r AS (
       |  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY adc_d2, n_id) AS BIGINT) AS rank, n_id, adc_d2
       |  FROM adc_r QUALIFY rank <= 5)
       |SELECT q_id, rank, n_id, adc_d2$tvCols$pathA
       |FROM srv_a CROSS JOIN tv WHERE tv.tv_milli <= $thr
       |UNION ALL
       |SELECT q_id, rank, n_id, adc_d2$tvCols$pathR
       |FROM srv_r CROSS JOIN tv WHERE tv.tv_milli > $thr
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Full-rebuild-over-survivors oracle for the ANN deletion lanes
    * (q386 object lane, q402 partitioned lane).
    */
  private def annDeleteOracleSql: String =
    s"""WITH sub AS (
             |  SELECT vec_id, s,
             |    list_transform(embedding[(s*8+1):(s*8+8)],
             |      x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS sub
             |  FROM embeddings CROSS JOIN range(0, 8) ss(s)),
             |fullv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS fv
             |  FROM embeddings),
             |cseeds AS (
             |  SELECT vec_id AS cid, fv AS cent FROM fullv
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings
             |    ORDER BY vec_id LIMIT 8)),
             |cd0 AS (
             |  SELECT fullv.vec_id, cseeds.cid,
             |    ${d2Sql("fullv.fv", "cseeds.cent")} AS dd
             |  FROM fullv CROSS JOIN cseeds),
             |ca0 AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
             |    FROM cd0) WHERE rn = 1),
             |cfp AS (
             |  SELECT vec_id, unnest(list_transform(fv,
             |    (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}), recursive := true)
             |  FROM fullv),
             |ccbp AS (
             |  SELECT ca0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM ca0 JOIN cfp p ON p.vec_id = ca0.vec_id
             |  GROUP BY 1, 2),
             |ccb AS (SELECT cid, list(c ORDER BY pos) AS cent FROM ccbp GROUP BY 1),
             |cells AS (
             |  SELECT vec_id, cid AS cell FROM (
             |    SELECT fullv.vec_id, ccb.cid,
             |      ${d2Sql("fullv.fv", "ccb.cent")} AS dd,
             |      row_number() OVER (PARTITION BY fullv.vec_id
             |        ORDER BY ${d2Sql("fullv.fv", "ccb.cent")}, ccb.cid) AS rn
             |    FROM fullv CROSS JOIN ccb) WHERE rn = 1),
             |probes AS (
             |  SELECT q_id, cell FROM (
             |    SELECT q.vec_id AS q_id, ccb.cid AS cell,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY ${d2Sql("q.fv", "ccb.cent")}, ccb.cid) AS pr
             |    FROM fullv q CROSS JOIN ccb WHERE q.vec_id % 50 = 1)
             |  WHERE pr <= 2),
             |seeds AS (
             |  SELECT s, vec_id AS cid, sub AS cent FROM sub
             |  WHERE vec_id IN (SELECT vec_id FROM embeddings
             |    ORDER BY vec_id LIMIT 4)),
             |d0 AS (
             |  SELECT sub.vec_id, sub.s, seeds.cid,
             |    ${d2Sql("sub.sub", "seeds.cent")} AS dd
             |  FROM sub JOIN seeds ON seeds.s = sub.s),
             |a0 AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |    FROM d0) WHERE rn = 1),
             |subp AS (
             |  SELECT vec_id, s,
             |    unnest(list_transform(sub, (x,i) -> {'pos': CAST(i AS BIGINT), 'xm': x}),
             |      recursive := true)
             |  FROM sub),
             |cbp AS (
             |  SELECT a0.s, a0.cid, p.pos,
             |    CAST(round(CAST(sum(p.xm) AS DOUBLE)/count(*)) AS BIGINT) AS c
             |  FROM a0 JOIN subp p ON p.vec_id = a0.vec_id AND p.s = a0.s
             |  GROUP BY 1, 2, 3),
             |cb AS (SELECT s, cid, list(c ORDER BY pos) AS cent FROM cbp GROUP BY 1, 2),
             |d1 AS (
             |  SELECT sub.vec_id, sub.s, cb.cid,
             |    ${d2Sql("sub.sub", "cb.cent")} AS dd
             |  FROM sub JOIN cb ON cb.s = sub.s),
             |codes AS (
             |  SELECT vec_id, s, cid FROM (
             |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, cid) AS rn
             |    FROM d1) WHERE rn = 1),
             |qsub AS (SELECT vec_id AS q_id, s, sub FROM sub WHERE vec_id % 50 = 1),
             |tab AS (
             |  SELECT q_id, cb.s, cb.cid, ${d2Sql("qsub.sub", "cb.cent")} AS dt
             |  FROM qsub JOIN cb ON cb.s = qsub.s),
             |cand AS (
             |  SELECT p.q_id, cells.vec_id
             |  FROM cells JOIN probes p ON p.cell = cells.cell
             |  WHERE p.q_id != cells.vec_id AND cells.vec_id % 13 <> 0),
             |adc AS (
             |  SELECT cand.q_id, cand.vec_id AS n_id,
             |    CAST(sum(t.dt) AS BIGINT) AS adc_d2
             |  FROM cand JOIN codes c ON c.vec_id = cand.vec_id
             |  JOIN tab t ON t.q_id = cand.q_id AND t.s = c.s AND t.cid = c.cid
             |  GROUP BY 1, 2)
             |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
             |    ORDER BY adc_d2, n_id) AS BIGINT) AS rank,
             |  n_id, adc_d2
             |FROM adc QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin
}
