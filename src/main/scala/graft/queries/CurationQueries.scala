package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{CorpusOps, Dedup, LangModel}
import graft.ops.{Eval, Privacy}

/** Wave 25 — training-data curation closers: substring-level duplicated
  * spans (extraction + scrub), the seed-trained Naive Bayes corpus
  * filter, per-language perplexity bucketing (the CCNet recipe),
  * privacy-release audits, and annotation-agreement QA. Each query
  * pairs an `ext`/`ops` operator with a DuckDB oracle that replays the
  * identical arithmetic (PolyHash folds, micro-nat logs of integer
  * ratios, exact integer counts).
  */
object CurationQueries extends QueryPack {

  /** DuckDB replica of [[graft.functions.PolyHash]] over an expression. */
  private def phSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, length($e)),
       |        i -> CAST(ascii(substring($e, i, 1)) AS BIGINT))),
       |      (a,b) -> (a*31 + b) % 1000000007)""".stripMargin

  /** Shared oracle CTEs for the duplicated-span queries: 5-gram hashes
    * with 0-based positions, duplicated-window rows, and maximal spans.
    */
  private val spanCtes: String =
    s"""toksx AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       |  FROM documents),
       |gl AS (
       |  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
       |    CASE WHEN len(l) >= 5 THEN list_transform(generate_series(1, len(l) - 4),
       |      i -> list_aggregate(l[i:i+4], 'string_agg', ' '))
       |    ELSE [] END AS gs
       |  FROM toksx),
       |hs AS (
       |  SELECT doc_id, n_tokens,
       |    list_transform(gs, s -> ${phSql("s")}) AS hl
       |  FROM gl),
       |g AS (
       |  SELECT doc_id,
       |    unnest(list_transform(hl, (h, i) -> {'h': h, 'pos': CAST(i - 1 AS BIGINT)}),
       |           recursive := true)
       |  FROM hs),
       |duph AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
       |d AS (SELECT doc_id, pos FROM g JOIN duph USING (h)),
       |isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
       |         THEN 1 ELSE 0 END AS brk
       |  FROM d),
       |isl2 AS (
       |  SELECT doc_id, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl),
       |spans AS (
       |  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
       |  FROM isl2 GROUP BY doc_id, island)""".stripMargin

  def all: Seq[Q] = mainQs ++ samplingQs

  private def mainQs: Seq[Q] = Seq(

    // Substring-level duplicated-span COVERAGE (the ExactSubstr dedup
    // removal signal): sliding 5-gram windows hashed corpus-wide, any
    // window occurring >= 2 times marks its token extent, marked
    // windows merge into maximal per-doc spans. Linear passes + per-doc
    // windows — never a pair join.
    Q("q242_dup_span_coverage",
      (s, d) => {
        import s.implicits._
        Dedup.duplicatedSpanCoverage(Tables.documents(s, d), "doc_id", "text", n = 5)
          .select($"id".as("doc_id"), $"n_tokens", $"n_spans",
            $"covered_tokens", $"coverage_micro")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $spanCtes,
             |per AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |    CAST(sum(e - s + 1) AS BIGINT) AS covered
             |  FROM spans GROUP BY 1)
             |SELECT t.doc_id, t.n_tokens,
             |  coalesce(n_spans, 0) AS n_spans,
             |  coalesce(covered, 0) AS covered_tokens,
             |  coalesce(covered, 0) * 1000000 // n_tokens AS coverage_micro
             |FROM gl t LEFT JOIN per USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Scrub pass: cut every duplicated span, keep remnant segments of
    // >= 5 tokens, re-joined as text — what actually ships to training
    // after substring dedup.
    Q("q243_span_scrub",
      (s, d) => {
        import s.implicits._
        Dedup.scrubDuplicatedSpans(Tables.documents(s, d), "doc_id", "text",
            n = 5, minTokens = 5)
          .select($"id".as("doc_id"), $"seg_index", $"seg_start",
            $"seg_len", $"seg_text")
          .orderBy($"doc_id", $"seg_index")
      },
      Some(s"""WITH $spanCtes,
             |gaps AS (
             |  SELECT doc_id,
             |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), -1) + 1 AS seg_start,
             |    s - coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), -1) - 1 AS seg_len
             |  FROM spans),
             |tails AS (
             |  SELECT sp.doc_id, max(e) + 1 AS seg_start,
             |    min(t.n_tokens) - max(e) - 1 AS seg_len
             |  FROM spans sp JOIN gl t USING (doc_id) GROUP BY sp.doc_id),
             |clean AS (
             |  SELECT doc_id, CAST(0 AS BIGINT) AS seg_start, n_tokens AS seg_len
             |  FROM gl WHERE doc_id NOT IN (SELECT doc_id FROM spans)),
             |segs AS (
             |  SELECT * FROM gaps UNION ALL
             |  SELECT * FROM tails UNION ALL
             |  SELECT * FROM clean),
             |idx AS (
             |  SELECT doc_id, seg_start, seg_len,
             |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY seg_start) AS BIGINT)
             |      AS seg_index
             |  FROM segs WHERE seg_len >= 5)
             |SELECT i.doc_id, seg_index,
             |  CAST(seg_start AS BIGINT) AS seg_start,
             |  CAST(seg_len AS BIGINT) AS seg_len,
             |  array_to_string(t.l[CAST(seg_start + 1 AS INT) : CAST(seg_start + seg_len AS INT)], ' ')
             |    AS seg_text
             |FROM idx i JOIN toksx t USING (doc_id)
             |ORDER BY doc_id, seg_index""".stripMargin)),

    // Seed-trained Naive Bayes corpus filter (the fasttext-style
    // quality/domain classifier): fit on the 80% hash-split train
    // subset with gold = (lang = 'en'), score EVERY document — held-out
    // rows audit the classifier — with Laplace-smoothed micro-nat
    // log-likelihood ratios, an OOV term, and a class prior.
    Q("q244_nb_classifier",
      (s, d) => {
        import s.implicits._
        LangModel.naiveBayesClassify(Tables.documents(s, d), "doc_id", "text",
            $"lang" === "en",
            pmod(graft.functions.PolyHash.polyHash($"doc_id".cast("string")),
              lit(100L)) < 80)
          .select($"id".as("doc_id"), $"gold", $"is_train", $"n_tokens",
            $"n_oov", $"score_micro", $"pred")
          .orderBy($"doc_id")
      },
      Some(s"""WITH ph AS (
             |  SELECT doc_id, lang = 'en' AS gold,
             |    ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 80 AS is_train,
             |    string_split_regex(trim(text), '\\s+') AS l
             |  FROM documents),
             |tokrows AS (SELECT doc_id, gold, is_train, unnest(l) AS tok FROM ph),
             |counts AS (
             |  SELECT tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM tokrows WHERE is_train GROUP BY 1),
             |consts AS (
             |  SELECT CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
             |    (SELECT CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT)
             |       FROM ph WHERE is_train) AS d1,
             |    (SELECT CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT)
             |       FROM ph WHERE is_train) AS d0
             |  FROM counts),
             |cc AS (
             |  SELECT v, n1, n0,
             |    CAST(round((ln(1.0 / CAST(n1 + v AS DOUBLE))
             |              - ln(1.0 / CAST(n0 + v AS DOUBLE))) * 1000000) AS BIGINT)
             |      AS oov_micro,
             |    CAST(round((ln(CAST(d1 AS DOUBLE)) - ln(CAST(d0 AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS prior_micro
             |  FROM consts),
             |model AS (
             |  SELECT tok,
             |    CAST(round((ln(CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))
             |              - ln(CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS llr_micro
             |  FROM counts CROSS JOIN cc),
             |scored AS (
             |  SELECT t.doc_id, t.gold, t.is_train,
             |    CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(sum(CASE WHEN m.llr_micro IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_oov,
             |    CAST(sum(coalesce(m.llr_micro, 0)) AS BIGINT) AS sm
             |  FROM tokrows t LEFT JOIN model m ON t.tok = m.tok
             |  GROUP BY 1, 2, 3)
             |SELECT doc_id, gold, is_train, n_tokens, n_oov,
             |  CAST(prior_micro + sm + n_oov * oov_micro AS BIGINT) AS score_micro,
             |  (prior_micro + sm + n_oov * oov_micro) >= 0 AS pred
             |FROM scored CROSS JOIN cc
             |ORDER BY doc_id""".stripMargin)),

    // CCNet-style per-language perplexity bucketing: one unigram LM per
    // language, per-doc average NLL, per-language percentile tertiles →
    // head/middle/tail, rolled up per (lang, bucket).
    Q("q245_ccnet_buckets",
      (s, d) => {
        import s.implicits._
        val nll = LangModel.docNllByGroup(Tables.documents(s, d),
          "lang", "doc_id", "text")
        CorpusOps.percentileNormalize(nll, "grp", "id", $"avg_nll_micro")
          .withColumn("bucket",
            least(lit(2L), expr("pct_micro * 3 div 1000000")))
          .groupBy($"grp".as("lang"), $"bucket")
          .agg(count(lit(1)).as("n_docs"),
            min($"avg_nll_micro").as("min_nll_micro"),
            max($"avg_nll_micro").as("max_nll_micro"),
            sum($"avg_nll_micro").as("sum_nll_micro"))
          .withColumn("bucket_name",
            when($"bucket" === 0, "head")
              .when($"bucket" === 1, "middle").otherwise("tail"))
          .orderBy($"lang", $"bucket")
      },
      Some("""WITH toksx AS (
             |  SELECT lang, doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |model AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c,
             |    CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT) AS n
             |  FROM toksx GROUP BY lang, tok),
             |m2 AS (
             |  SELECT lang, tok,
             |    CAST(round((ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE))) * 1000000)
             |      AS BIGINT) AS nll_micro
             |  FROM model),
             |docs AS (
             |  SELECT t.lang, t.doc_id,
             |    CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(sum(m2.nll_micro) AS BIGINT) AS sum_nll_micro
             |  FROM toksx t JOIN m2 ON t.lang = m2.lang AND t.tok = m2.tok
             |  GROUP BY 1, 2),
             |avgd AS (
             |  SELECT lang, doc_id,
             |    CAST(round(CAST(sum_nll_micro AS DOUBLE) / n_tokens) AS BIGINT)
             |      AS avg_nll_micro
             |  FROM docs),
             |ranked AS (
             |  SELECT lang, doc_id, avg_nll_micro,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY avg_nll_micro, doc_id) AS BIGINT) AS rnk,
             |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_stratum
             |  FROM avgd),
             |pct AS (
             |  SELECT lang, avg_nll_micro,
             |    CASE WHEN n_stratum = 1 THEN 0
             |         ELSE (rnk - 1) * 1000000 // (n_stratum - 1) END AS pct_micro
             |  FROM ranked),
             |bk AS (
             |  SELECT lang, avg_nll_micro,
             |    least(2, pct_micro * 3 // 1000000) AS bucket
             |  FROM pct)
             |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  min(avg_nll_micro) AS min_nll_micro,
             |  max(avg_nll_micro) AS max_nll_micro,
             |  CAST(sum(avg_nll_micro) AS BIGINT) AS sum_nll_micro,
             |  CASE bucket WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
             |    ELSE 'tail' END AS bucket_name
             |FROM bk GROUP BY lang, bucket
             |ORDER BY lang, bucket""".stripMargin)),

    // k-anonymity census across a generalization ladder over the
    // customer quasi-identifiers (nation, segment, balance bucket at
    // 100 / 1000 / suppressed), k = 5 — the privacy-release audit.
    Q("q246_k_anonymity",
      (s, d) => {
        import s.implicits._
        Privacy.kAnonymityLadder(Tables.customer(s, d), Seq(
            "balance_100" -> Seq($"c_nationkey", $"c_mktsegment",
              floor($"c_acctbal" / 100).cast("long")),
            "balance_1000" -> Seq($"c_nationkey", $"c_mktsegment",
              floor($"c_acctbal" / 1000).cast("long")),
            "balance_dropped" -> Seq($"c_nationkey", $"c_mktsegment")),
            k = 5L)
          .orderBy($"level_ord")
      },
      Some("""WITH l0 AS (
             |  SELECT count(*) AS sz FROM customer
             |  GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 100) AS BIGINT)),
             |l1 AS (
             |  SELECT count(*) AS sz FROM customer
             |  GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT)),
             |l2 AS (
             |  SELECT count(*) AS sz FROM customer
             |  GROUP BY c_nationkey, c_mktsegment),
             |r0 AS (
             |  SELECT CAST(0 AS BIGINT) AS level_ord, 'balance_100' AS level,
             |    CAST(count(*) AS BIGINT) AS n_classes,
             |    CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS records_at_risk,
             |    CAST(min(sz) AS BIGINT) AS min_class
             |  FROM l0),
             |r1 AS (
             |  SELECT CAST(1 AS BIGINT), 'balance_1000',
             |    CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT),
             |    CAST(min(sz) AS BIGINT)
             |  FROM l1),
             |r2 AS (
             |  SELECT CAST(2 AS BIGINT), 'balance_dropped',
             |    CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT),
             |    CAST(min(sz) AS BIGINT)
             |  FROM l2)
             |SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |ORDER BY level_ord""".stripMargin)),

    // Cohen's kappa inter-annotator agreement per language: two
    // deterministic "annotators" (token-count gate vs char-count gate)
    // on every document; chance-corrected agreement from exact 2x2
    // confusion counts.
    Q("q247_cohen_kappa",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        Eval.cohenKappa(docs, "lang",
            size(split(trim($"text"), "\\s+")) >= 55,
            $"n_chars" >= 300)
          .select($"grp".as("lang"), $"n", $"n00", $"n01", $"n10", $"n11",
            $"po_micro", $"pe_micro", $"kappa_micro")
          .orderBy($"lang")
      },
      Some("""WITH f AS (
             |  SELECT lang,
             |    len(string_split_regex(trim(text), '\s+')) >= 55 AS a,
             |    n_chars >= 300 AS b
             |  FROM documents),
             |g AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11
             |  FROM f GROUP BY 1),
             |k AS (
             |  SELECT lang, n, n00, n01, n10, n11,
             |    (n10 + n11) * (n01 + n11) + (n00 + n01) * (n00 + n10) AS chance
             |  FROM g)
             |SELECT lang, n, n00, n01, n10, n11,
             |  CAST(round(CAST(n00 + n11 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
             |    AS BIGINT) AS po_micro,
             |  CAST(round(CAST(chance AS DOUBLE) / CAST(n * n AS DOUBLE) * 1000000)
             |    AS BIGINT) AS pe_micro,
             |  CASE WHEN n * n = chance THEN NULL
             |    ELSE CAST(round(CAST(n * (n00 + n11) - chance AS DOUBLE)
             |      / CAST(n * n - chance AS DOUBLE) * 1000000) AS BIGINT)
             |  END AS kappa_micro
             |FROM k ORDER BY lang""".stripMargin)),

    // Temperature-α (α = 1/2) source rebalance: target share ∝ √count,
    // largest-remainder allocation of a 10k-unit budget. sqrt is
    // IEEE-exactly-rounded, so the derived weights are engine-portable.
    Q("q248_temperature_mix",
      (s, d) => {
        import s.implicits._
        CorpusOps.temperatureMix(Tables.documents(s, d), "source", budget = 10000L)
          .orderBy($"source")
      },
      Some("""WITH c AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents GROUP BY 1),
             |w AS (
             |  SELECT source, n_docs,
             |    CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS weight
             |  FROM c),
             |t AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM w),
             |b AS (
             |  SELECT source, n_docs, weight,
             |    10000 * weight // wsum AS base,
             |    (10000 * weight) % wsum AS rem
             |  FROM w CROSS JOIN t),
             |l AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS leftover FROM b),
             |r AS (
             |  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) AS rk
             |  FROM b)
             |SELECT source, n_docs, weight,
             |  CAST(weight * 1000000 // (SELECT wsum FROM t) AS BIGINT) AS share_micro,
             |  CAST(base + CASE WHEN rk <= (SELECT leftover FROM l) THEN 1 ELSE 0 END
             |    AS BIGINT) AS alloc
             |FROM r ORDER BY source""".stripMargin)),

    // C4/Gopher-style quality-rule FUNNEL: rules fire in order, each
    // doc charged to the first rule it fails; per-rule in/killed/out.
    Q("q249_filter_funnel",
      (s, d) => {
        import s.implicits._
        val toksC = split(trim($"text"), "\\s+")
        val sumLen = aggregate(toksC, lit(0L), (acc, x) => acc + length(x))
        val grams2 = graft.ext.TextAnalysis.gramsFromTokens(toksC, 2)
        CorpusOps.filterFunnel(Tables.documents(s, d), Seq(
          "min_tokens" -> (size(toksC) >= 40),
          "max_tokens" -> (size(toksC) <= 90),
          "mean_word_len" ->
            (sumLen >= size(toksC) * 3 && sumLen <= size(toksC) * 12),
          "low_repetition" ->
            ((size(grams2) - size(array_distinct(grams2))) * 5 <= size(grams2))))
          .orderBy($"rule_ord")
      },
      Some("""WITH base AS (
             |  SELECT string_split_regex(trim(text), '\s+') AS l FROM documents),
             |g AS (
             |  SELECT l, list_filter(list_transform(l,
             |      (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |    v -> v IS NOT NULL) AS gs
             |  FROM base),
             |feats AS (
             |  SELECT len(l) AS nt,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(l, x -> CAST(length(x) AS BIGINT))), (a,b) -> a + b) AS sl,
             |    len(gs) AS ng, len(list_distinct(gs)) AS nd
             |  FROM g),
             |f AS (
             |  SELECT CASE
             |    WHEN NOT (nt >= 40) THEN 0
             |    WHEN NOT (nt <= 90) THEN 1
             |    WHEN NOT (sl >= 3*nt AND sl <= 12*nt) THEN 2
             |    WHEN NOT ((ng - nd)*5 <= ng) THEN 3
             |    ELSE -1 END AS killer
             |  FROM feats),
             |k AS (SELECT killer, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
             |rules AS (SELECT * FROM (VALUES
             |  (CAST(0 AS BIGINT), 'min_tokens'), (CAST(1 AS BIGINT), 'max_tokens'),
             |  (CAST(2 AS BIGINT), 'mean_word_len'),
             |  (CAST(3 AS BIGINT), 'low_repetition')) AS t(rule_ord, rule)),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM k),
             |j AS (
             |  SELECT rule_ord, rule, CAST(coalesce(n, 0) AS BIGINT) AS n_killed
             |  FROM rules LEFT JOIN k ON killer = rule_ord),
             |runr AS (
             |  SELECT rule_ord, rule, n_killed,
             |    CAST(coalesce(sum(n_killed) OVER (ORDER BY rule_ord
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS before
             |  FROM j)
             |SELECT rule_ord, rule,
             |  CAST(total - before AS BIGINT) AS n_in, n_killed,
             |  CAST(total - before - n_killed AS BIGINT) AS n_out
             |FROM runr CROSS JOIN tot ORDER BY rule_ord""".stripMargin)),

    // Inter-label embedding similarity map: exact micro-int centroids
    // per label, pairwise centroid cosine — the domain-closeness
    // summary behind mixing / dedup-blocking decisions.
    Q("q250_label_centroid_cosines",
      (s, d) => {
        import s.implicits._
        graft.ext.Similarity.groupCentroidCosines(
            Tables.embeddings(s, d), "label", "embedding")
          .select($"grp_a".cast("long").as("label_a"),
            $"grp_b".cast("long").as("label_b"),
            $"n_a", $"n_b", $"cos_micro")
          .orderBy($"label_a", $"label_b")
      },
      Some("""WITH dims AS (
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
             |  SELECT label, pos, n,
             |    CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS c
             |  FROM agg),
             |arrs AS (
             |  SELECT label, min(n) AS n_rows, list(c ORDER BY pos) AS cent
             |  FROM cent GROUP BY label),
             |p AS (
             |  SELECT a.label AS label_a, b.label AS label_b,
             |    a.n_rows AS n_a, b.n_rows AS n_b, a.cent AS ca, b.cent AS cb
             |  FROM arrs a JOIN arrs b ON a.label < b.label)
             |SELECT CAST(label_a AS BIGINT) AS label_a,
             |  CAST(label_b AS BIGINT) AS label_b,
             |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  CAST(round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(ca, (x,i) -> CAST(x AS DOUBLE) * CAST(cb[i] AS DOUBLE))),
             |      (p,v) -> p + v)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ca, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             |         (p,v) -> p + v))
             |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(cb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             |         (p,v) -> p + v)))
             |    * 1000000) AS BIGINT) AS cos_micro
             |FROM p ORDER BY label_a, label_b""".stripMargin)),

    // HITS hubs/authorities on the DIRECTED customer→supplier bipartite
    // graph (exact integer fixed-point, 2 rounds; the oracle replays
    // every floor). Customers accumulate hub mass, suppliers authority.
    Q("q251_hits",
      (s, d) => {
        import s.implicits._
        val edges = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("src"), ($"l_suppkey" + 1000000L).as("dst"))
          .distinct()
        graft.ext.LinkGraph.hitsMicro(edges, iters = 2)
          .orderBy($"node_id")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
             |a1r AS (
             |  SELECT n.id, CAST(coalesce(t.s, 0) AS BIGINT) AS a
             |  FROM nodes n LEFT JOIN (
             |    SELECT dst AS id, sum(CAST(1000000 AS BIGINT)) AS s
             |    FROM e GROUP BY 1) t ON t.id = n.id),
             |a1m AS (SELECT max(a) AS mx FROM a1r),
             |a1 AS (SELECT id, CASE WHEN mx > 0 THEN a * 1000000 // mx
             |  ELSE CAST(0 AS BIGINT) END AS a FROM a1r CROSS JOIN a1m),
             |h1r AS (
             |  SELECT n.id, CAST(coalesce(t.s, 0) AS BIGINT) AS h
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.src AS id, sum(a1.a) AS s
             |    FROM e JOIN a1 ON a1.id = e.dst GROUP BY 1) t ON t.id = n.id),
             |h1m AS (SELECT max(h) AS mx FROM h1r),
             |h1 AS (SELECT id, CASE WHEN mx > 0 THEN h * 1000000 // mx
             |  ELSE CAST(0 AS BIGINT) END AS h FROM h1r CROSS JOIN h1m),
             |a2r AS (
             |  SELECT n.id, CAST(coalesce(t.s, 0) AS BIGINT) AS a
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst AS id, sum(h1.h) AS s
             |    FROM e JOIN h1 ON h1.id = e.src GROUP BY 1) t ON t.id = n.id),
             |a2m AS (SELECT max(a) AS mx FROM a2r),
             |a2 AS (SELECT id, CASE WHEN mx > 0 THEN a * 1000000 // mx
             |  ELSE CAST(0 AS BIGINT) END AS a FROM a2r CROSS JOIN a2m),
             |h2r AS (
             |  SELECT n.id, CAST(coalesce(t.s, 0) AS BIGINT) AS h
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.src AS id, sum(a2.a) AS s
             |    FROM e JOIN a2 ON a2.id = e.dst GROUP BY 1) t ON t.id = n.id),
             |h2m AS (SELECT max(h) AS mx FROM h2r),
             |h2 AS (SELECT id, CASE WHEN mx > 0 THEN h * 1000000 // mx
             |  ELSE CAST(0 AS BIGINT) END AS h FROM h2r CROSS JOIN h2m)
             |SELECT n.id AS node_id, h2.h AS hub_micro, a2.a AS auth_micro
             |FROM nodes n JOIN h2 ON h2.id = n.id JOIN a2 ON a2.id = n.id
             |ORDER BY node_id""".stripMargin)),

    // Pairwise Jensen–Shannon divergence between source unigram
    // distributions — the text-side domain-closeness map. Per-token
    // terms rounded to pico units and summed as exact integers;
    // one-sided mass charged at ln 2 from the pair's integer leftover.
    Q("q252_js_divergence",
      (s, d) => {
        import s.implicits._
        LangModel.jsDivergencePico(Tables.documents(s, d), "source", "text")
          .orderBy($"grp_a", $"grp_b")
      },
      Some("""WITH tokrows AS (
             |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |counts AS (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM tokrows GROUP BY 1, 2),
             |ct AS (
             |  SELECT source, tok, c,
             |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
             |  FROM counts),
             |j AS (
             |  SELECT a.source AS grp_a, b.source AS grp_b,
             |    a.c AS ca, a.n AS na, b.c AS cb, b.n AS nb
             |  FROM ct a JOIN ct b ON a.tok = b.tok AND a.source < b.source),
             |terms AS (
             |  SELECT grp_a, grp_b, ca, cb, na, nb,
             |    CAST(round((
             |      CAST(ca AS DOUBLE)/CAST(na AS DOUBLE)
             |        * ln(CAST(2 AS DOUBLE) * (CAST(ca AS DOUBLE)/CAST(na AS DOUBLE))
             |             / (CAST(ca AS DOUBLE)/CAST(na AS DOUBLE)
             |                + CAST(cb AS DOUBLE)/CAST(nb AS DOUBLE)))
             |      + CAST(cb AS DOUBLE)/CAST(nb AS DOUBLE)
             |        * ln(CAST(2 AS DOUBLE) * (CAST(cb AS DOUBLE)/CAST(nb AS DOUBLE))
             |             / (CAST(ca AS DOUBLE)/CAST(na AS DOUBLE)
             |                + CAST(cb AS DOUBLE)/CAST(nb AS DOUBLE))))
             |      * CAST(500000000000 AS DOUBLE)) AS BIGINT) AS term
             |  FROM j),
             |agg AS (
             |  SELECT grp_a, grp_b,
             |    CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
             |    CAST(count(*) AS BIGINT) AS vocab_both,
             |    CAST(sum(ca) AS BIGINT) AS ca_both,
             |    CAST(sum(cb) AS BIGINT) AS cb_both,
             |    CAST(sum(term) AS BIGINT) AS s_both
             |  FROM terms GROUP BY 1, 2)
             |SELECT grp_a, grp_b, n_a, n_b, vocab_both,
             |  CAST(s_both
             |    + CAST(round(CAST(n_a - ca_both AS DOUBLE)/CAST(n_a AS DOUBLE)
             |        * ln(CAST(2 AS DOUBLE)) * CAST(500000000000 AS DOUBLE)) AS BIGINT)
             |    + CAST(round(CAST(n_b - cb_both AS DOUBLE)/CAST(n_b AS DOUBLE)
             |        * ln(CAST(2 AS DOUBLE)) * CAST(500000000000 AS DOUBLE)) AS BIGINT)
             |    AS BIGINT) AS jsd_pico
             |FROM agg ORDER BY grp_a, grp_b""".stripMargin)),

    // Source token-set overlap map: exact pairwise Jaccard over distinct
    // vocabularies PLUS the bottom-64 minwise estimate and its error —
    // certifying the constant-size sketch against ground truth.
    Q("q253_source_overlap",
      (s, d) => {
        import s.implicits._
        Dedup.groupTokenOverlap(Tables.documents(s, d), "source", "text", k = 64)
          .orderBy($"grp_a", $"grp_b")
      },
      Some(s"""WITH st AS (
             |  SELECT DISTINCT source AS grp, tok FROM (
             |    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
             |    FROM documents)),
             |sizes AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1),
             |intr AS (
             |  SELECT a.grp AS grp_a, b.grp AS grp_b, CAST(count(*) AS BIGINT) AS inter
             |  FROM st a JOIN st b ON a.tok = b.tok AND a.grp < b.grp
             |  GROUP BY 1, 2),
             |hsd AS (SELECT DISTINCT grp, ${phSql("tok")} AS h FROM st),
             |sigr AS (
             |  SELECT grp, h,
             |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
             |  FROM hsd),
             |sig AS (
             |  SELECT grp, list_sort(list(h)) AS sig FROM sigr
             |  WHERE rn <= 64 GROUP BY grp),
             |p AS (
             |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.sig AS sa, b.sig AS sb,
             |    list_sort(list_distinct(list_concat(a.sig, b.sig)))[1:64] AS uk
             |  FROM sig a JOIN sig b ON a.grp < b.grp),
             |e AS (
             |  SELECT grp_a, grp_b,
             |    CAST(len(list_intersect(list_intersect(uk, sa), sb)) * 1000000
             |      // len(uk) AS BIGINT) AS est_micro
             |  FROM p)
             |SELECT e.grp_a, e.grp_b, x.n AS n_a, y.n AS n_b,
             |  coalesce(intr.inter, 0) AS inter,
             |  CAST(coalesce(intr.inter, 0) * 1000000
             |    // (x.n + y.n - coalesce(intr.inter, 0)) AS BIGINT) AS jaccard_micro,
             |  est_micro,
             |  abs(est_micro - CAST(coalesce(intr.inter, 0) * 1000000
             |    // (x.n + y.n - coalesce(intr.inter, 0)) AS BIGINT)) AS err_micro
             |FROM e
             |JOIN sizes x ON x.grp = e.grp_a
             |JOIN sizes y ON y.grp = e.grp_b
             |LEFT JOIN intr ON intr.grp_a = e.grp_a AND intr.grp_b = e.grp_b
             |ORDER BY e.grp_a, e.grp_b""".stripMargin)),

    // Per-label embedding dispersion: each vector's cosine to its own
    // label centroid (exact micro-int centroid), aggregated — the
    // intra-source diversity report next to q250's inter-source map.
    Q("q254_label_dispersion",
      (s, d) => {
        import s.implicits._
        graft.ext.Similarity.groupDispersion(
            Tables.embeddings(s, d), "label", "embedding")
          .select($"grp".cast("long").as("label"), $"n_rows",
            $"mean_cos_micro", $"min_cos_micro", $"max_cos_micro")
          .orderBy($"label")
      },
      Some("""WITH dims AS (
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
             |arrs AS (SELECT label, list(c ORDER BY pos) AS cent FROM cent GROUP BY label),
             |rows_cos AS (
             |  SELECT e.label,
             |    CAST(round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(e.embedding,
             |          (x,i) -> CAST(x AS DOUBLE) * CAST(a.cent[i] AS DOUBLE))),
             |        (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             |           (p,v) -> p + v))
             |       * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(a.cent, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             |           (p,v) -> p + v)))
             |      * 1000000) AS BIGINT) AS cm
             |  FROM embeddings e JOIN arrs a ON a.label = e.label)
             |SELECT CAST(label AS BIGINT) AS label,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(round(CAST(sum(cm) AS DOUBLE) / count(*)) AS BIGINT) AS mean_cos_micro,
             |  min(cm) AS min_cos_micro, max(cm) AS max_cos_micro
             |FROM rows_cos GROUP BY label ORDER BY label""".stripMargin)),

    // END-TO-END curation pipeline report — the integration proof that
    // the stages compose: C4-style rule funnel → duplicated-span
    // coverage gate (<50%) → NB classifier gate, rolled up per source
    // with surviving token mass. One relational plan; the oracle
    // replays all three stages from their proven fragments.
    Q("q255_pipeline_report",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val toksC = split(trim($"text"), "\\s+")
        val sumLen = aggregate(toksC, lit(0L), (acc, x) => acc + length(x))
        val grams2 = graft.ext.TextAnalysis.gramsFromTokens(toksC, 2)
        val flagged = docs.select($"doc_id", $"source",
          size(toksC).cast("long").as("n_tokens"),
          (size(toksC) >= 40 && size(toksC) <= 90 &&
            sumLen >= size(toksC) * 3 && sumLen <= size(toksC) * 12 &&
            (size(grams2) - size(array_distinct(grams2))) * 5 <= size(grams2))
            .as("pass_filters"))
        val cov = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 5)
          .select($"id".as("doc_id"),
            ($"coverage_micro" < 500000L).as("pass_dedup"))
        val nb = LangModel.naiveBayesClassify(docs, "doc_id", "text",
            $"lang" === "en",
            pmod(graft.functions.PolyHash.polyHash($"doc_id".cast("string")),
              lit(100L)) < 80)
          .select($"id".as("doc_id"), $"pred".as("pass_class"))
        flagged.join(cov, "doc_id").join(nb, "doc_id")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_raw"),
            sum(when($"pass_filters", 1L).otherwise(0L)).as("n_pass_filters"),
            sum(when($"pass_filters" && $"pass_dedup", 1L).otherwise(0L))
              .as("n_pass_dedup"),
            sum(when($"pass_filters" && $"pass_dedup" && $"pass_class", 1L)
              .otherwise(0L)).as("n_final"),
            sum(when($"pass_filters" && $"pass_dedup" && $"pass_class",
              $"n_tokens").otherwise(0L)).as("tokens_final"))
          .orderBy($"source")
      },
      Some(s"""WITH $spanCtes,
             |per AS (
             |  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS covered
             |  FROM spans GROUP BY 1),
             |covg AS (
             |  SELECT t.doc_id,
             |    coalesce(covered, 0) * 1000000 // n_tokens < 500000 AS pass_dedup
             |  FROM gl t LEFT JOIN per USING (doc_id)),
             |ph AS (
             |  SELECT doc_id, lang = 'en' AS gold,
             |    ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 80 AS is_train, l
             |  FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS l
             |        FROM documents)),
             |tokrows AS (SELECT doc_id, gold, is_train, unnest(l) AS tok FROM ph),
             |counts AS (
             |  SELECT tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM tokrows WHERE is_train GROUP BY 1),
             |consts AS (
             |  SELECT CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
             |    (SELECT CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT)
             |       FROM ph WHERE is_train) AS d1,
             |    (SELECT CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT)
             |       FROM ph WHERE is_train) AS d0
             |  FROM counts),
             |cc AS (
             |  SELECT v, n1, n0,
             |    CAST(round((ln(1.0 / CAST(n1 + v AS DOUBLE))
             |              - ln(1.0 / CAST(n0 + v AS DOUBLE))) * 1000000) AS BIGINT)
             |      AS oov_micro,
             |    CAST(round((ln(CAST(d1 AS DOUBLE)) - ln(CAST(d0 AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS prior_micro
             |  FROM consts),
             |model AS (
             |  SELECT tok,
             |    CAST(round((ln(CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))
             |              - ln(CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS llr_micro
             |  FROM counts CROSS JOIN cc),
             |scored AS (
             |  SELECT t.doc_id,
             |    CAST(sum(CASE WHEN m.llr_micro IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_oov,
             |    CAST(sum(coalesce(m.llr_micro, 0)) AS BIGINT) AS sm
             |  FROM tokrows t LEFT JOIN model m ON t.tok = m.tok
             |  GROUP BY 1),
             |nbp AS (
             |  SELECT doc_id,
             |    (prior_micro + sm + n_oov * oov_micro) >= 0 AS pass_class
             |  FROM scored CROSS JOIN cc),
             |feats AS (
             |  SELECT doc_id, source, CAST(len(l) AS BIGINT) AS n_tokens,
             |    len(l) >= 40 AND len(l) <= 90
             |      AND sl >= 3*len(l) AND sl <= 12*len(l)
             |      AND (ng - nd)*5 <= ng AS pass_filters
             |  FROM (
             |    SELECT doc_id, source, l,
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(l, x -> CAST(length(x) AS BIGINT))), (a,b) -> a + b) AS sl,
             |      len(gs) AS ng, len(list_distinct(gs)) AS nd
             |    FROM (
             |      SELECT doc_id, source, l, list_filter(list_transform(l,
             |          (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |        v -> v IS NOT NULL) AS gs
             |      FROM (SELECT doc_id, source,
             |              string_split_regex(trim(text), '\\s+') AS l
             |            FROM documents))))
             |SELECT f.source,
             |  CAST(count(*) AS BIGINT) AS n_raw,
             |  CAST(sum(CASE WHEN pass_filters THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_pass_filters,
             |  CAST(sum(CASE WHEN pass_filters AND pass_dedup THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_pass_dedup,
             |  CAST(sum(CASE WHEN pass_filters AND pass_dedup AND pass_class
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
             |  CAST(sum(CASE WHEN pass_filters AND pass_dedup AND pass_class
             |    THEN f.n_tokens ELSE 0 END) AS BIGINT) AS tokens_final
             |FROM feats f
             |JOIN covg ON covg.doc_id = f.doc_id
             |JOIN nbp ON nbp.doc_id = f.doc_id
             |GROUP BY f.source ORDER BY f.source""".stripMargin)),

    // Personalized PageRank from a seed set (nation-0 customers):
    // teleport mass returns only to seeds — proximity-to-seeds along
    // links, in the exact integer floor discipline of q115.
    Q("q256_pagerank_personalized",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p")).distinct()
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"))
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst")))
        val seeds = Tables.customer(s, d)
          .filter($"c_nationkey" === 0).select($"c_custkey")
        graft.ext.LinkGraph.pageRankPersonalizedMicro(edges, seeds, iters = 2)
          .orderBy($"node_id")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |edges AS (
             |  SELECT c AS src, p + 1000000 AS dst FROM pairs
             |  UNION ALL SELECT p + 1000000, c FROM pairs),
             |seeds AS (SELECT DISTINCT c_custkey AS id FROM customer
             |          WHERE c_nationkey = 0),
             |ns AS (SELECT count(*) AS n FROM seeds),
             |nodes AS (SELECT DISTINCT src AS id FROM edges
             |          UNION SELECT DISTINCT dst FROM edges),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |r0 AS (SELECT n.id,
             |         CASE WHEN sd.id IS NOT NULL
             |           THEN 1000000000000 // (SELECT n FROM ns) ELSE 0 END AS rank
             |       FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id),
             |s1 AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
             |       FROM edges e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |r1 AS (SELECT n.id,
             |         CASE WHEN sd.id IS NOT NULL
             |           THEN (15 * (1000000000000 // (SELECT n FROM ns))) // 100
             |           ELSE 0 END
             |           + (85 * coalesce(s1.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id
             |         LEFT JOIN s1 ON s1.id = n.id),
             |s2 AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
             |       FROM edges e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |r2 AS (SELECT n.id,
             |         CASE WHEN sd.id IS NOT NULL
             |           THEN (15 * (1000000000000 // (SELECT n FROM ns))) // 100
             |           ELSE 0 END
             |           + (85 * coalesce(s2.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id
             |         LEFT JOIN s2 ON s2.id = n.id)
             |SELECT id AS node_id, CAST(rank AS BIGINT) AS rank_micro
             |FROM r2 ORDER BY id""".stripMargin)),

    // Degree assortativity of the undirected co-trade graph: Pearson r
    // of endpoint degrees across edges — exact integer moments, one
    // shared double. Bipartite graphs come out strongly negative.
    Q("q257_assortativity",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p")).distinct()
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"))
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst")))
        graft.ext.LinkGraph.degreeAssortativity(edges)
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |edges AS (
             |  SELECT c AS src, p + 1000000 AS dst FROM pairs
             |  UNION ALL SELECT p + 1000000, c FROM pairs),
             |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
             |        FROM edges GROUP BY 1),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
             |    CAST(sum(x.deg * y.deg) AS BIGINT) AS sxy,
             |    CAST(sum(x.deg) AS BIGINT) AS sx,
             |    CAST(sum(y.deg) AS BIGINT) AS sy,
             |    CAST(sum(x.deg * x.deg) AS BIGINT) AS sxx,
             |    CAST(sum(y.deg * y.deg) AS BIGINT) AS syy
             |  FROM edges e JOIN deg x ON x.id = e.src JOIN deg y ON y.id = e.dst)
             |SELECT n_edges, sxy, sx, sy, sxx, syy,
             |  CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |               / CAST(n_edges AS DOUBLE)) > 0
             |        AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |               / CAST(n_edges AS DOUBLE)) > 0
             |    THEN CAST(round(
             |      (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |         / CAST(n_edges AS DOUBLE))
             |      / sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |           / CAST(n_edges AS DOUBLE))
             |      / sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |           / CAST(n_edges AS DOUBLE))
             |      * 1000000) AS BIGINT)
             |    ELSE NULL END AS r_micro
             |FROM m""".stripMargin)),

    // Fixed-round 3-core peel of the co-purchase part graph (parts
    // sharing an order, df-capped): survivors + their core degree
    // after 4 peel rounds — both engines replay the identical rounds.
    Q("q258_kcore",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey")
          .filter($"l_partkey" < 400).distinct()
        val co = li.join(li.withColumnRenamed("l_partkey", "p2"), "l_orderkey")
          .filter($"l_partkey" =!= $"p2")
          .select($"l_partkey".as("src"), $"p2".as("dst")).distinct()
        graft.ext.LinkGraph.kCorePeel(co, k = 3L, rounds = 4)
          .orderBy($"node_id")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             |  WHERE l_partkey < 400),
             |e0 AS (
             |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             |  WHERE a.l_partkey <> b.l_partkey),
             |a0 AS (SELECT DISTINCT src AS id FROM e0),
             |a1 AS (SELECT src AS id FROM e0
             |       JOIN a0 x ON x.id = e0.src JOIN a0 y ON y.id = e0.dst
             |       GROUP BY src HAVING count(*) >= 3),
             |a2 AS (SELECT src AS id FROM e0
             |       JOIN a1 x ON x.id = e0.src JOIN a1 y ON y.id = e0.dst
             |       GROUP BY src HAVING count(*) >= 3),
             |a3 AS (SELECT src AS id FROM e0
             |       JOIN a2 x ON x.id = e0.src JOIN a2 y ON y.id = e0.dst
             |       GROUP BY src HAVING count(*) >= 3),
             |a4 AS (SELECT src AS id FROM e0
             |       JOIN a3 x ON x.id = e0.src JOIN a3 y ON y.id = e0.dst
             |       GROUP BY src HAVING count(*) >= 3)
             |SELECT src AS node_id, CAST(count(*) AS BIGINT) AS core_degree
             |FROM e0 JOIN a4 x ON x.id = e0.src JOIN a4 y ON y.id = e0.dst
             |GROUP BY src ORDER BY node_id""".stripMargin)),

    // SIXTH streaming operator in the conformance gate: continuous
    // Bloom-filter maintenance replayed over the documents file in 8
    // micro-batches, each ORing its bit delta into the V2 doc store.
    // Set bits are an OR-monoid (associative, commutative, idempotent)
    // so the batched state must equal the direct single-pass build the
    // oracle recomputes hash-for-hash — the streaming dedup screen.
    Q("q259_stream_bloom_replay",
      (s, d) => {
        import s.implicits._
        import graft.streaming.StreamSketch
        import graft.io.MemDocStore
        val keyed = Tables.documents(s, d).select(concat_ws(" ",
          slice(graft.ext.TextAnalysis.tokens($"text"), 1, 3)).as("key"))
        val root = graft.core.Scratch.dir("q259_replay")
        keyed.repartition(8).write.mode("overwrite").parquet(s"$root/data")
        MemDocStore.drop("q259_bloom")
        val stream = s.readStream
          .schema(s.read.parquet(s"$root/data").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/data")
        val q = StreamSketch.runBloom(stream, "q259_bloom", "key",
          m = 4096, k = 3)
        q.processAllAvailable()
        q.stop()
        StreamSketch.counters(s, "q259_bloom")
          .select($"bit").orderBy($"bit")
      },
      Some("""WITH keyed AS (
             |  SELECT DISTINCT
             |    array_to_string(string_split_regex(trim(text),'\s+')[1:3], ' ') AS key
             |  FROM documents),
             |ch AS (
             |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(key)),
             |        j -> CAST(ascii(substring(key, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h
             |  FROM keyed),
             |ii AS (SELECT unnest(generate_series(0, 2)) AS i)
             |SELECT DISTINCT
             |  ((h * ((1103515245 * (i+1)) % 1000000007)
             |    + ((12345 * (i+1) + 7) % 1000000007)) % 1000000007) % 4096 AS bit
             |FROM ch, ii ORDER BY bit""".stripMargin)),

    // Token keyness: top-5 most distinctive tokens per language vs the
    // rest of the corpus (Laplace log-likelihood ratio, micro-nats) —
    // "what words make this slice sound like itself".
    Q("q260_keyness",
      (s, d) => {
        import s.implicits._
        LangModel.keynessTopK(Tables.documents(s, d), "lang", "text", k = 5)
          .select($"grp".as("lang"), $"rnk", $"tok", $"c_grp", $"c_rest",
            $"score_micro")
          .orderBy($"lang", $"rnk")
      },
      Some("""WITH tokrows AS (
             |  SELECT lang AS grp, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |counts AS (
             |  SELECT grp, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM tokrows GROUP BY 1, 2),
             |bytok AS (SELECT tok, CAST(sum(c) AS BIGINT) AS c_all
             |          FROM counts GROUP BY 1),
             |bygrp AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g
             |          FROM counts GROUP BY 1),
             |globals AS (SELECT CAST(sum(c) AS BIGINT) AS n_all,
             |  CAST(count(DISTINCT tok) AS BIGINT) AS v FROM counts),
             |scored AS (
             |  SELECT c.grp, c.tok, c.c AS c_grp, t.c_all - c.c AS c_rest,
             |    CAST(round((ln(CAST(c.c + 1 AS DOUBLE)
             |          / CAST(g.n_g + gl.v AS DOUBLE))
             |        - ln(CAST(t.c_all - c.c + 1 AS DOUBLE)
             |          / CAST(gl.n_all - g.n_g + gl.v AS DOUBLE)))
             |      * 1000000) AS BIGINT) AS score_micro
             |  FROM counts c
             |  JOIN bytok t ON t.tok = c.tok
             |  JOIN bygrp g ON g.grp = c.grp
             |  CROSS JOIN globals gl),
             |ranked AS (
             |  SELECT grp, tok, c_grp, c_rest, score_micro,
             |    CAST(row_number() OVER (PARTITION BY grp
             |      ORDER BY score_micro DESC, tok ASC) AS BIGINT) AS rnk
             |  FROM scored)
             |SELECT grp AS lang, rnk, tok, c_grp, c_rest, score_micro
             |FROM ranked WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin)),

    // UniMax token allocation: budget = ⅓ of corpus tokens spread as
    // uniformly as sources allow under a 0.36-epoch per-source cap —
    // exact integer water-filling, remainder to the smallest caps.
    Q("q371_unimax_alloc",
      (s, d) => {
        import s.implicits._
        val per = Tables.documents(s, d)
          .select($"source",
            size(graft.ext.TextAnalysis.tokens($"text")).cast("long")
              .as("n_tok"))
          .groupBy($"source").agg(sum($"n_tok").as("tokens"))
        val budget = per.agg(sum($"tokens")).head.getLong(0) / 3L
        CorpusOps.unimaxAllocate(per, budget, maxEpochsMilli = 360L)
          .orderBy($"source")
      },
      Some("""WITH s AS (
             |  SELECT source,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+')))
             |      AS BIGINT) AS tokens
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(tokens) // 3 AS BIGINT) AS b FROM s),
             |o AS (SELECT source, tokens, tokens * 360 // 1000 AS cap,
             |    CAST(row_number() OVER
             |      (ORDER BY tokens * 360 // 1000, source) AS BIGINT) AS j,
             |    CAST(sum(tokens * 360 // 1000) OVER
             |      (ORDER BY tokens * 360 // 1000, source
             |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
             |    CAST(count(*) OVER () AS BIGINT) AS k,
             |    lead(tokens * 360 // 1000, 1) OVER
             |      (ORDER BY tokens * 360 // 1000, source) AS nextcap
             |  FROM s),
             |c AS (SELECT j, cap, p, k, nextcap FROM o
             |  UNION ALL
             |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |    CAST(max(k) AS BIGINT), CAST(min(cap) AS BIGINT) FROM o),
             |l AS (SELECT c.*, b,
             |    CASE WHEN j = k THEN (CASE WHEN p <= b
             |        THEN 9223372036854775807 ELSE -1 END)
             |      WHEN p > b THEN -1
             |      ELSE (b - p) // (k - j) END AS lam
             |  FROM c CROSS JOIN tot),
             |v AS (SELECT * FROM l
             |  WHERE cap <= lam AND (nextcap IS NULL OR nextcap > lam)),
             |js AS (SELECT CAST(min(j) AS BIGINT) AS jstar,
             |    CAST(arg_min(lam, j) AS BIGINT) AS lam,
             |    CAST(arg_min(p, j) AS BIGINT) AS pstar FROM v),
             |fin AS (SELECT o.source, o.tokens, o.cap,
             |    CASE WHEN o.j <= js.jstar THEN o.cap
             |      ELSE least(o.cap, js.lam
             |        + CASE WHEN o.j - js.jstar
             |            <= (CASE WHEN o.k = js.jstar THEN 0
             |                ELSE (b - js.pstar) % (o.k - js.jstar) END)
             |          THEN 1 ELSE 0 END) END AS alloc
             |  FROM o CROSS JOIN js CROSS JOIN tot)
             |SELECT source, tokens, cap, alloc,
             |  alloc * 1000 // tokens AS epochs_milli
             |FROM fin ORDER BY source""".stripMargin)),

    // Consistent-hash ring rebalance audit: successor-vnode shard
    // assignment under 8 and 9 shards (4 vnodes each); the moved share
    // is ~1/9 per shard instead of mod-N's ~100%.
    Q("q374_hash_ring",
      (s, d) => {
        import s.implicits._
        CorpusOps.consistentHashRebalance(Tables.documents(s, d), "doc_id",
            nShards = 8, vnodes = 4)
          .orderBy($"shard")
      },
      Some(hashRingOracleSql(nShards = 8, vnodes = 4)))
  )

  /** Salted per-stratum hash reservoir: the 5 lowest
    * PolyHash(salt|doc_id) docs per source — q77's deterministic
    * stratified sample re-expressed through the skew-safe two-phase
    * top-k (no whole-stratum sort window) with salted fresh redraws.
    */
  private def samplingQs: Seq[Q] = Seq(
    Q("q381_stratified_sample",
      (s, d) => {
        import s.implicits._
        CorpusOps.hashReservoir(Tables.documents(s, d),
            strataCols = Seq("source"), idCol = "doc_id", k = 5,
            salt = "smp7")
          .orderBy($"source", $"rnk")
      },
      Some(s"""WITH h0 AS (
             |  SELECT source, doc_id,
             |    ${phSql("'smp7|' || CAST(doc_id AS VARCHAR)")} AS ph
             |  FROM documents),
             |h AS (
             |  SELECT source, doc_id,
             |    ((ph * ph) % 1000000007 * 1103515245 + 12345)
             |      % 1000000007 AS sample_hash
             |  FROM h0)
             |SELECT source, doc_id, sample_hash,
             |  CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY sample_hash, doc_id) AS BIGINT) AS rnk
             |FROM h QUALIFY rnk <= 5
             |ORDER BY source, rnk""".stripMargin))
  )

  /** DuckDB replica of [[CorpusOps.consistentHashRebalance]]:
    * LCG-mixed polyHash ring + successor pick via the scaled
    * `pos·100 + shard` key.
    */
  private def hashRingOracleSql(nShards: Int, vnodes: Int): String = {
    def mix(e: String): String =
      s"(($e) * 2654435761 + 987654321) % 2147483647"
    def ring(name: String, n: Int): String = {
      val str = s"'s:' || CAST(sh AS VARCHAR) || ':' || CAST(v AS VARCHAR)"
      s"""$name AS (
         |  SELECT sh, ${mix(phSql(str))} AS pos
         |  FROM (SELECT unnest(generate_series(0, ${n - 1})) AS sh)
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${vnodes - 1}))
         |    AS v))""".stripMargin
    }
    def assign(name: String, ringName: String): String =
      s"""$name AS (
         |  SELECT k.id, k.h,
         |    coalesce(min(CASE WHEN r.pos >= k.h
         |        THEN r.pos * 100 + r.sh END),
         |      (SELECT min(pos * 100 + sh) FROM $ringName)) % 100 AS shard
         |  FROM keyed k LEFT JOIN $ringName r ON r.pos >= k.h
         |  GROUP BY k.id, k.h)""".stripMargin
    s"""WITH ${ring("r1", nShards)},
       |${ring("r2", nShards + 1)},
       |keyed AS (SELECT doc_id AS id,
       |    ${mix(phSql("CAST(doc_id AS VARCHAR)"))} AS h
       |  FROM documents),
       |${assign("a1", "r1")},
       |${assign("a2", "r2")}
       |SELECT a1.shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN a1.shard <> a2.shard THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_moved,
       |  CAST(round(CAST(sum(CASE WHEN a1.shard <> a2.shard THEN 1 ELSE 0
       |      END) AS DOUBLE) * 1000.0
       |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS moved_milli
       |FROM a1 JOIN a2 ON a2.id = a1.id
       |GROUP BY 1 ORDER BY a1.shard""".stripMargin
  }
}
