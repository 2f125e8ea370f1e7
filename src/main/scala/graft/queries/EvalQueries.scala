package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{LangModel, Ranking}
import graft.ops.Eval

/** Wave 28 — ranking-quality evaluation and agreement statistics: the
  * measurement half of a retrieval/curation pipeline. Graded-relevance
  * nDCG over a query panel, rank-biased overlap between two document
  * orderings, hard-negative mining for contrastive training pairs,
  * centroid silhouette as the clustering-quality score, multi-rater
  * Fleiss' kappa, and the Zipf rank–frequency fit as a corpus-health
  * fingerprint. Every oracle replays the exact fixed-point arithmetic
  * (micro-unit logs and cosines, integer sufficient statistics, one
  * double-division shape).
  */
object EvalQueries extends QueryPack {

  /** DuckDB replica of the sequential-fold double cosine between two
    * list columns (the [[graft.ext.Similarity.cosineNative]] kernel).
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

  val all: Seq[Q] = Seq(

    // Graded-relevance nDCG@10 for a deterministic query panel against
    // the whole corpus: the exact-eval harness that certifies the ANN
    // retrievers. Relevance graded off the label distance; discounts
    // are micro-unit 1/log2(rank+1); nDCG an integer ratio.
    Q("q261_ndcg_eval",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Ranking.ndcgEval(emb.filter($"vec_id" % 25 === 0), emb, "label", k = 10)
          .orderBy($"q_id")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label,
             |  embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0),
             |j AS (
             |  SELECT q_id, q_label, e.vec_id AS n_id,
             |    CAST(e.label AS BIGINT) AS n_label,
             |    CAST(round(${cosSql("q_emb", "e.embedding")} * 1000000) AS BIGINT) AS sim_micro
             |  FROM q, embeddings e WHERE e.vec_id != q_id),
             |r AS (
             |  SELECT *, CAST(CASE WHEN q_label = n_label THEN 2
             |    WHEN abs(q_label - n_label) = 1 THEN 1 ELSE 0 END AS BIGINT) AS rel
             |  FROM j),
             |rk AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim_micro DESC, n_id) AS rnk,
             |    row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id) AS irnk
             |  FROM r),
             |agg AS (
             |  SELECT q_id, q_label,
             |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
             |    CAST(sum(CASE WHEN rnk <= 10 THEN rel *
             |      CAST(round(1000000 * ln(2) / ln(rnk + 1)) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS dcg_micro,
             |    CAST(sum(CASE WHEN irnk <= 10 THEN rel *
             |      CAST(round(1000000 * ln(2) / ln(irnk + 1)) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS idcg_micro
             |  FROM rk GROUP BY 1, 2)
             |SELECT q_id, q_label, n_rel, dcg_micro, idcg_micro,
             |  CASE WHEN idcg_micro > 0 THEN
             |    CAST(round(CAST(dcg_micro * 1000 AS DOUBLE)
             |      / CAST(idcg_micro AS DOUBLE)) AS BIGINT)
             |  ELSE CAST(0 AS BIGINT) END AS ndcg_milli
             |FROM agg ORDER BY q_id""".stripMargin)),

    // Fleiss' kappa per language over a 3-rater panel derived
    // deterministically from the documents (char-length bucket, token
    // -count bucket, id bucket) — the multi-annotator agreement audit.
    Q("q262_fleiss_kappa",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val r1 = docs.select($"lang", $"doc_id".as("item"),
          ($"n_chars" % 3).cast("long").as("cat"))
        val r2 = docs.select($"lang", $"doc_id".as("item"),
          (size(graft.ext.TextAnalysis.tokens($"text")) % 3).cast("long").as("cat"))
        val r3 = docs.select($"lang", $"doc_id".as("item"),
          (floor($"doc_id" / 3).cast("long") % 3).as("cat"))
        Eval.fleissKappa(r1.unionByName(r2).unionByName(r3), "lang", "item", "cat")
          .select($"grp".as("lang"), $"n_items", $"n_raters",
            $"po_micro", $"pe_micro", $"kappa_micro")
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
             |g2 AS (SELECT lang, CAST(sum(c_j*c_j) AS BIGINT) AS pe_num
             |       FROM cj GROUP BY 1)
             |SELECT g1.lang, n_items, n_raters,
             |  CAST(round(CAST(s2 - n_items*n_raters AS DOUBLE)
             |    / CAST(n_items*n_raters*(n_raters-1) AS DOUBLE) * 1000000) AS BIGINT) AS po_micro,
             |  CAST(round(CAST(pe_num AS DOUBLE)
             |    / CAST((n_items*n_raters)*(n_items*n_raters) AS DOUBLE) * 1000000) AS BIGINT) AS pe_micro,
             |  CASE WHEN CAST(pe_num AS DOUBLE)
             |      / CAST((n_items*n_raters)*(n_items*n_raters) AS DOUBLE) = 1.0
             |    THEN NULL
             |  ELSE CAST(round(
             |    (CAST(s2 - n_items*n_raters AS DOUBLE)
             |       / CAST(n_items*n_raters*(n_raters-1) AS DOUBLE)
             |     - CAST(pe_num AS DOUBLE)
             |       / CAST((n_items*n_raters)*(n_items*n_raters) AS DOUBLE))
             |    / (1.0 - CAST(pe_num AS DOUBLE)
             |       / CAST((n_items*n_raters)*(n_items*n_raters) AS DOUBLE))
             |    * 1000000) AS BIGINT) END AS kappa_micro
             |FROM g1 JOIN g2 USING (lang) ORDER BY lang""".stripMargin)),

    // Rank-biased overlap between two top-20 document orderings (by
    // char length vs by token count): how much two quality rankings
    // agree, weighted toward the head — with the per-depth overlap
    // trace and running truncated-RBO sum.
    Q("q263_rbo",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        // Top-20 extractions are TakeOrdered (orderBy+limit); the rank
        // window then runs on 20 rows — bounded by construction.
        val a = docs.select($"doc_id".as("id"), $"n_chars")
          .orderBy($"n_chars".desc, $"id".asc).limit(20)
          .withColumn("rnk", row_number().over(
            Window.orderBy($"n_chars".desc, $"id".asc)).cast("long"))
        val b = docs
          .select($"doc_id".as("id"),
            size(graft.ext.TextAnalysis.tokens($"text")).as("ntok"))
          .orderBy($"ntok".desc, $"id".asc).limit(20)
          .withColumn("rnk", row_number().over(
            Window.orderBy($"ntok".desc, $"id".asc)).cast("long"))
        Ranking.rboByDepth(a, b, depth = 20).orderBy($"d")
      },
      Some("""WITH ta AS (
             |  SELECT doc_id AS id,
             |    CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk_a
             |  FROM documents QUALIFY rnk_a <= 20),
             |tb AS (
             |  SELECT doc_id AS id,
             |    CAST(row_number() OVER (
             |      ORDER BY len(string_split_regex(trim(text), '\s+')) DESC, doc_id)
             |      AS BIGINT) AS rnk_b
             |  FROM documents QUALIFY rnk_b <= 20),
             |bt AS (SELECT ta.id, rnk_a, rnk_b FROM ta JOIN tb USING (id)),
             |dd AS (SELECT unnest(generate_series(1, 20)) AS d),
             |ov AS (
             |  SELECT dd.d, CAST(count(b.id) AS BIGINT) AS overlap
             |  FROM dd LEFT JOIN bt b ON b.rnk_a <= dd.d AND b.rnk_b <= dd.d
             |  GROUP BY dd.d),
             |t AS (
             |  SELECT d, overlap,
             |    CAST(round(CAST(overlap * 1000 AS DOUBLE) / CAST(d AS DOUBLE)) AS BIGINT) AS agree_milli,
             |    CAST(round((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
             |      * pow(CAST(0.9 AS DOUBLE), CAST(d AS DOUBLE) - 1.0)
             |      * 1000000000.0) AS BIGINT) AS weight_nano
             |  FROM ov),
             |t2 AS (
             |  SELECT d, overlap, agree_milli, weight_nano,
             |    CAST(round(CAST(weight_nano * agree_milli AS DOUBLE) / 1000.0) AS BIGINT) AS contrib_nano
             |  FROM t)
             |SELECT d, overlap, agree_milli, weight_nano,
             |  CAST(sum(contrib_nano) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rbo_cum_nano
             |FROM t2 ORDER BY d""".stripMargin)),

    // Centroid silhouette per label: the O(n·k) clustering-quality
    // score over the embedding space (cosine distance to own vs
    // nearest-other label centroid).
    Q("q264_silhouette",
      (s, d) => {
        import s.implicits._
        Ranking.silhouetteByLabel(Tables.embeddings(s, d), "label", "embedding")
          .orderBy($"label")
      },
      Some(s"""WITH dims AS (
             |  SELECT label,
             |    unnest(list_transform(embedding,
             |      (x,i) -> {'pos': CAST(i AS BIGINT),
             |                'xm': CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM embeddings),
             |agg AS (
             |  SELECT label, pos, CAST(sum(xm) AS BIGINT) AS s,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM dims GROUP BY 1, 2),
             |cent AS (
             |  SELECT label, pos,
             |    CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS c
             |  FROM agg),
             |arrs AS (
             |  SELECT CAST(label AS BIGINT) AS cgrp, list(c ORDER BY pos) AS cent
             |  FROM cent GROUP BY 1),
             |sc AS (
             |  SELECT CAST(e.label AS BIGINT) AS grp, e.vec_id AS id, a.cgrp,
             |    CAST(round(${cosSql("e.embedding", "a.cent")} * 1000000) AS BIGINT) AS cos_micro
             |  FROM embeddings e CROSS JOIN arrs a),
             |pr AS (
             |  SELECT grp, id,
             |    max(CASE WHEN cgrp = grp THEN cos_micro END) AS own_micro,
             |    max(CASE WHEN cgrp != grp THEN cos_micro END) AS other_micro
             |  FROM sc GROUP BY 1, 2),
             |sv AS (
             |  SELECT grp,
             |    CASE WHEN greatest(1000000 - own_micro, 1000000 - other_micro) > 0
             |      THEN CAST(round(
             |        CAST(((1000000 - other_micro) - (1000000 - own_micro)) * 1000 AS DOUBLE)
             |        / CAST(greatest(1000000 - own_micro, 1000000 - other_micro) AS DOUBLE))
             |        AS BIGINT)
             |    ELSE CAST(0 AS BIGINT) END AS s_milli
             |  FROM pr)
             |SELECT grp AS label, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(round(CAST(sum(s_milli) AS DOUBLE) / count(*)) AS BIGINT) AS mean_s_milli,
             |  CAST(min(s_milli) AS BIGINT) AS min_s_milli,
             |  CAST(max(s_milli) AS BIGINT) AS max_s_milli
             |FROM sv GROUP BY 1 ORDER BY label""".stripMargin)),

    // Hard-negative mining: top-3 most-similar other-label vectors per
    // anchor — the contrastive-pair generator, exact over a broadcast
    // anchor panel.
    Q("q265_hard_negatives",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Ranking.hardNegatives(emb.filter($"vec_id" % 25 === 0), emb, "label", k = 3)
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS q_label,
             |  embedding AS q_emb FROM embeddings WHERE vec_id % 25 = 0),
             |j AS (
             |  SELECT q_id, q_label, e.vec_id AS n_id,
             |    CAST(e.label AS BIGINT) AS n_label,
             |    round(${cosSql("q_emb", "e.embedding")}, 6) + 0.0 AS sim
             |  FROM q, embeddings e WHERE CAST(e.label AS BIGINT) != q_label)
             |SELECT q_id, q_label, rank, n_id, n_label, sim FROM (
             |  SELECT *, CAST(row_number() OVER (
             |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rank
             |  FROM j)
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // Zipf rank–frequency OLS per language over the top-100 token
    // ranks: slope/intercept/R² from exact integer micro-log sums.
    Q("q266_zipf_slope",
      (s, d) => {
        import s.implicits._
        LangModel.zipfOls(Tables.documents(s, d), "lang", "text", topR = 100)
          .select($"grp".as("lang"), $"n_ranks", $"slope_micro",
            $"intercept_micro", $"r2_milli")
          .orderBy($"lang")
      },
      Some("""WITH tokrows AS (
             |  SELECT lang AS grp, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |counts AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS c
             |           FROM tokrows GROUP BY 1, 2),
             |rk AS (
             |  SELECT grp, c,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY c DESC, tok)
             |      AS BIGINT) AS rnk
             |  FROM counts QUALIFY rnk <= 100),
             |pts AS (
             |  SELECT grp,
             |    CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
             |  FROM rk),
             |s AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
             |    CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM pts GROUP BY 1)
             |SELECT grp AS lang, n AS n_ranks,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0 THEN
             |    CAST(round(CAST(n*sxy - sx*sy AS DOUBLE)
             |      / CAST(n*sxx - sx*sx AS DOUBLE) * 1000000) AS BIGINT)
             |  END AS slope_micro,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0 THEN
             |    CAST(round((CAST(sy AS DOUBLE)
             |        - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
             |          * CAST(sx AS DOUBLE))
             |      / CAST(n AS DOUBLE)) AS BIGINT)
             |  END AS intercept_micro,
             |  CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0
             |        AND CAST(n*syy - sy*sy AS DOUBLE) > 0 THEN
             |    CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
             |      / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             |      * 1000) AS BIGINT)
             |  END AS r2_milli
             |FROM s ORDER BY lang""".stripMargin)),

    // Corpus BLEU-2 + ROUGE-1 per source over consecutive-doc
    // candidate/reference pairs: clipped n-gram matches and candidate
    // totals summed across pairs BEFORE the precision ratios; brevity
    // penalty and the geometric mean close in one shared double chain.
    Q("q368_bleu_rouge",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val rk = Tables.documents(s, d).select($"source", $"doc_id", $"text")
          .withColumn("rn", row_number().over(
            Window.partitionBy($"source").orderBy($"doc_id")).cast("long"))
        val pairs = rk.as("c").join(rk.as("r"),
            col("c.source") === col("r.source")
              && col("r.rn") === col("c.rn") + 1L)
          .select(col("c.source").as("source"), col("c.rn").as("pid"),
            col("c.text").as("cand"), col("r.text").as("ref"))
        LangModel.bleuRougeByGroup(pairs, "source", "pid", "cand", "ref")
          .select($"grp".as("source"), $"n_pairs", $"c_len", $"r_len",
            $"m1", $"m2", $"bleu_micro", $"rouge1_micro")
          .orderBy($"source")
      },
      Some("""WITH rk AS (
             |  SELECT source, text,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
             |      AS BIGINT) AS rn
             |  FROM documents),
             |p AS (SELECT c.source, c.rn AS pid,
             |    string_split_regex(trim(c.text), '\s+') AS cl,
             |    string_split_regex(trim(r.text), '\s+') AS rl
             |  FROM rk c JOIN rk r ON r.source = c.source AND r.rn = c.rn + 1),
             |cu AS (SELECT source, pid, unnest(cl) AS g FROM p),
             |ru AS (SELECT source, pid, unnest(rl) AS g FROM p),
             |cb AS (SELECT source, pid, unnest(list_filter(list_transform(cl,
             |      (x, i) -> CASE WHEN i <= len(cl) - 1
             |        THEN x || ' ' || cl[i + 1] END),
             |    v -> v IS NOT NULL)) AS g FROM p),
             |rb AS (SELECT source, pid, unnest(list_filter(list_transform(rl,
             |      (x, i) -> CASE WHEN i <= len(rl) - 1
             |        THEN x || ' ' || rl[i + 1] END),
             |    v -> v IS NOT NULL)) AS g FROM p),
             |m1 AS (SELECT source, CAST(sum(least(cc, rc)) AS BIGINT) AS m1
             |  FROM (SELECT source, pid, g, CAST(count(*) AS BIGINT) AS cc
             |        FROM cu GROUP BY 1, 2, 3) a
             |  JOIN (SELECT source, pid, g, CAST(count(*) AS BIGINT) AS rc
             |        FROM ru GROUP BY 1, 2, 3) b USING (source, pid, g)
             |  GROUP BY 1),
             |m2 AS (SELECT source, CAST(sum(least(cc, rc)) AS BIGINT) AS m2
             |  FROM (SELECT source, pid, g, CAST(count(*) AS BIGINT) AS cc
             |        FROM cb GROUP BY 1, 2, 3) a
             |  JOIN (SELECT source, pid, g, CAST(count(*) AS BIGINT) AS rc
             |        FROM rb GROUP BY 1, 2, 3) b USING (source, pid, g)
             |  GROUP BY 1),
             |lens AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(len(cl)) AS BIGINT) AS c_len,
             |    CAST(sum(len(rl)) AS BIGINT) AS r_len,
             |    CAST(sum(greatest(len(cl) - 1, 0)) AS BIGINT) AS c2_len
             |  FROM p GROUP BY 1),
             |j AS (SELECT lens.source, n_pairs, c_len, r_len, c2_len,
             |    coalesce(m1.m1, 0) AS m1, coalesce(m2.m2, 0) AS m2
             |  FROM lens LEFT JOIN m1 ON m1.source = lens.source
             |  LEFT JOIN m2 ON m2.source = lens.source)
             |SELECT source, n_pairs, c_len, r_len, m1, m2,
             |  CASE WHEN m1 = 0 OR m2 = 0 OR c_len = 0 OR c2_len = 0 THEN 0
             |    ELSE CAST(round((CASE WHEN c_len >= r_len
             |        THEN CAST(1 AS DOUBLE)
             |        ELSE exp(CAST(1 AS DOUBLE)
             |          - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)) END)
             |      * exp((ln(CAST(m1 AS DOUBLE) / CAST(c_len AS DOUBLE))
             |        + ln(CAST(m2 AS DOUBLE) / CAST(c2_len AS DOUBLE)))
             |        / CAST(2 AS DOUBLE))
             |      * 1000000.0) AS BIGINT) END AS bleu_micro,
             |  CASE WHEN r_len = 0 THEN 0
             |    ELSE CAST(round(CAST(m1 AS DOUBLE) * 1000000.0
             |      / CAST(r_len AS DOUBLE)) AS BIGINT) END AS rouge1_micro
             |FROM j ORDER BY source""".stripMargin)),

    // Dawid–Skene latent-truth EM over a 3-rater panel: each rater is
    // the is-English ground truth XOR a deterministic flip pattern of a
    // different rate, so DS must recover asymmetric error profiles from
    // disagreement alone. The oracle replays BOTH full EM rounds —
    // integer M-step sums, clamped micro rates, rater-ordered
    // likelihood folds — bit-for-bit.
    Q("q383_dawid_skene",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val g = $"lang" === "en"
        def rater(id: Long, flip: org.apache.spark.sql.Column) =
          docs.select($"doc_id".as("item"), lit(id).as("rater"),
            (g =!= flip).as("y"))
        val panel = rater(1L, $"doc_id" % 7 === 0)
          .unionByName(rater(2L, $"n_chars" % 5 === 0))
          .unionByName(rater(3L, $"doc_id" % 3 === 0))
        graft.ops.Eval.dawidSkene(panel, "item", "rater", "y", iters = 2)
          .orderBy($"rater")
      },
      Some(s"""WITH r AS (
             |  SELECT doc_id AS item, CAST(1 AS BIGINT) AS rater,
             |    CAST((lang = 'en') <> (doc_id % 7 = 0) AS BIGINT) AS y
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id, CAST(2 AS BIGINT),
             |    CAST((lang = 'en') <> (n_chars % 5 = 0) AS BIGINT)
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id, CAST(3 AS BIGINT),
             |    CAST((lang = 'en') <> (doc_id % 3 = 0) AS BIGINT)
             |  FROM documents),
             |m0 AS (
             |  SELECT item, CAST(round(CAST(sum(y) AS DOUBLE)
             |    * CAST(1000000 AS DOUBLE) / CAST(count(*) AS DOUBLE))
             |    AS BIGINT) AS mu
             |  FROM r GROUP BY 1),
             |r1m AS (
             |  SELECT rater, CAST(sum(mu * y) AS BIGINT) AS num1,
             |    CAST(sum(mu) AS BIGINT) AS den1,
             |    CAST(sum((1000000 - mu) * y) AS BIGINT) AS num0,
             |    CAST(sum(1000000 - mu) AS BIGINT) AS den0
             |  FROM r JOIN m0 USING (item) GROUP BY 1),
             |r1c AS (
             |  SELECT rater,
             |    CASE WHEN den1 > 0 THEN least(greatest(CAST(round(
             |        CAST(num1 AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |        / CAST(den1 AS DOUBLE)) AS BIGINT), 1), 999999)
             |      ELSE 500000 END AS pi1,
             |    CASE WHEN den0 > 0 THEN least(greatest(CAST(round(
             |        CAST(num0 AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |        / CAST(den0 AS DOUBLE)) AS BIGINT), 1), 999999)
             |      ELSE 500000 END AS pi0
             |  FROM r1m),
             |p1 AS (
             |  SELECT least(greatest(CAST(round(CAST(sum(mu) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT), 1), 999999) AS p
             |  FROM m0),
             |e1f AS (
             |  SELECT r.item,
             |    list_transform(list(r.y * c.pi1 + (1 - r.y) * (1000000 - c.pi1)
             |      ORDER BY r.rater), x -> CAST(x AS DOUBLE)) AS l1,
             |    list_transform(list(r.y * c.pi0 + (1 - r.y) * (1000000 - c.pi0)
             |      ORDER BY r.rater), x -> CAST(x AS DOUBLE)) AS l0
             |  FROM r JOIN r1c c USING (rater) GROUP BY r.item),
             |e1 AS (
             |  SELECT item,
             |    (CAST(p AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |      * list_reduce(list_prepend(CAST(1 AS DOUBLE), l1),
             |          (a, b) -> a * (b / CAST(1000000 AS DOUBLE))) AS a,
             |    (CAST(1000000 - p AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |      * list_reduce(list_prepend(CAST(1 AS DOUBLE), l0),
             |          (a, b) -> a * (b / CAST(1000000 AS DOUBLE))) AS b
             |  FROM e1f CROSS JOIN p1),
             |m1 AS (
             |  SELECT item, CASE WHEN a + b > 0 THEN CAST(round(
             |      a * CAST(1000000 AS DOUBLE) / (a + b)) AS BIGINT)
             |    ELSE 500000 END AS mu
             |  FROM e1),
             |r2m AS (
             |  SELECT rater, CAST(sum(mu * y) AS BIGINT) AS num1,
             |    CAST(sum(mu) AS BIGINT) AS den1,
             |    CAST(sum((1000000 - mu) * y) AS BIGINT) AS num0,
             |    CAST(sum(1000000 - mu) AS BIGINT) AS den0
             |  FROM r JOIN m1 USING (item) GROUP BY 1),
             |r2c AS (
             |  SELECT rater,
             |    CASE WHEN den1 > 0 THEN least(greatest(CAST(round(
             |        CAST(num1 AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |        / CAST(den1 AS DOUBLE)) AS BIGINT), 1), 999999)
             |      ELSE 500000 END AS pi1,
             |    CASE WHEN den0 > 0 THEN least(greatest(CAST(round(
             |        CAST(num0 AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |        / CAST(den0 AS DOUBLE)) AS BIGINT), 1), 999999)
             |      ELSE 500000 END AS pi0
             |  FROM r2m),
             |p2 AS (
             |  SELECT least(greatest(CAST(round(CAST(sum(mu) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT), 1), 999999) AS p
             |  FROM m1),
             |e2f AS (
             |  SELECT r.item,
             |    list_transform(list(r.y * c.pi1 + (1 - r.y) * (1000000 - c.pi1)
             |      ORDER BY r.rater), x -> CAST(x AS DOUBLE)) AS l1,
             |    list_transform(list(r.y * c.pi0 + (1 - r.y) * (1000000 - c.pi0)
             |      ORDER BY r.rater), x -> CAST(x AS DOUBLE)) AS l0
             |  FROM r JOIN r2c c USING (rater) GROUP BY r.item),
             |e2 AS (
             |  SELECT item,
             |    (CAST(p AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |      * list_reduce(list_prepend(CAST(1 AS DOUBLE), l1),
             |          (a, b) -> a * (b / CAST(1000000 AS DOUBLE))) AS a,
             |    (CAST(1000000 - p AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |      * list_reduce(list_prepend(CAST(1 AS DOUBLE), l0),
             |          (a, b) -> a * (b / CAST(1000000 AS DOUBLE))) AS b
             |  FROM e2f CROSS JOIN p2),
             |m2 AS (
             |  SELECT item, CASE WHEN a + b > 0 THEN CAST(round(
             |      a * CAST(1000000 AS DOUBLE) / (a + b)) AS BIGINT)
             |    ELSE 500000 END AS mu
             |  FROM e2),
             |post AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(CASE WHEN mu >= 500000 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_pos
             |  FROM m2)
             |SELECT rater, pi1 AS pi1_micro, pi0 AS pi0_micro,
             |  p AS prior_micro, n_items, n_pos
             |FROM r2c CROSS JOIN p2 CROSS JOIN post
             |ORDER BY rater""".stripMargin))
  )
}
