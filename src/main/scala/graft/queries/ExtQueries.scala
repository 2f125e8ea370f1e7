package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.core.Exact.{r4, r6}
import graft.ext.{CorpusOps, Dedup, IvfIndex, LangModel, LinkGraph, Multimodal, Similarity, Sketches, TextAnalysis}

/** LLM-training-data pipeline operators (north-star extensions):
  * text quality / language-ID / token counting / fingerprinting over
  * `documents`, exact + n-gram-Jaccard + MinHash-LSH + SimHash dedup,
  * and brute-force + LSH-ANN similarity search over `embeddings`.
  *
  * Every query here is oracle-checked: the probabilistic operators
  * (MinHash, SimHash, hyperplane LSH, IVF) are built on engine-portable
  * primitives — [[graft.functions.PolyHash]] base hashes, integer-LCG
  * hyperplanes, raw-slice band buckets, exact-integer centroid means —
  * precisely so an external SQL engine can recompute them end-to-end.
  */
object ExtQueries extends QueryPack {

  val all: Seq[Q] = Seq(
    // Quality scoring: token counts, BPE-ish subword count, stopword
    // ratio → clamped score. Pure per-row codegen expressions.
    Q("q42_text_quality",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            TextAnalysis.tokenCount($"text").as("n_tokens"),
            TextAnalysis.bpeishTokenCount($"text").as("n_subwords"),
            TextAnalysis.qualityScore($"text").as("quality"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id, text, len(toks) AS n_tokens,
             |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) * 1.0 / len(toks) AS stop_ratio
             |  FROM t)
             |SELECT doc_id, n_tokens, n_subwords,
             |  round(least(greatest(least(n_tokens/50.0, 1.0)
             |    * (CASE WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 0.5 ELSE 1.0 END)
             |    * (0.7 + stop_ratio), 0.0), 1.0), 4) AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Language ID vs the labeled lang → confusion matrix. Tokenization
    // and the four profile scores are projected as columns in separate
    // steps, so each runs once per row; the inline `langId(text)` form
    // re-tokenized per profile and re-scored per fold reference
    // (measured 6.6 s vs sub-second at sf0.1 — the shinglesFromTokens
    // lesson applied to language ID).
    Q("q43_text_langid",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"lang", TextAnalysis.tokens($"text").as("toks"))
        val scored = toks.select(($"lang" +:
          TextAnalysis.profileScores($"toks").map { case (l, c) => c.as(s"s_$l") }): _*)
        scored
          .select($"lang", TextAnalysis.langIdFromScores(
            TextAnalysis.StopwordProfiles.map { case (l, _) => l -> col(s"s_$l") }).as("predicted"))
          .groupBy($"lang", $"predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"predicted")
      },
      Some("""WITH sc AS (
             |  SELECT lang,
             |    len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['the','and','of','to','in'], x))) AS s_en,
             |    len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['el','la','de','que','los'], x))) AS s_es,
             |    len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['le','la','et','les','des'], x))) AS s_fr,
             |    len(list_filter(string_split_regex(trim(text),'\s+'), x -> list_contains(['der','die','und','das','ein'], x))) AS s_de
             |  FROM documents)
             |SELECT lang,
             |  CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
             |       WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
             |       WHEN s_fr > greatest(s_en, s_es) THEN 'fr'
             |       WHEN s_es > s_en THEN 'es'
             |       ELSE 'en' END AS predicted,
             |  count(*) AS n
             |FROM sc GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // Intra-document n-gram repetition ratios (n = 2, 3) — the
    // boilerplate/spam quality signal. Token array projected once;
    // ratios compared in integer micro-units (the q71 lesson).
    Q("q73_repetition",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
          .select($"doc_id", size($"toks").cast("long").as("n_tokens"),
            TextAnalysis.gramsFromTokens($"toks", 2).as("g2"),
            TextAnalysis.gramsFromTokens($"toks", 3).as("g3"))
          .select($"doc_id", $"n_tokens",
            round(TextAnalysis.repetitionRatioFromGrams($"g2") * 1000000, 0)
              .cast("long").as("rep2_micro"),
            round(TextAnalysis.repetitionRatioFromGrams($"g3") * 1000000, 0)
              .cast("long").as("rep3_micro"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |g AS (
             |  SELECT doc_id, len(l) AS n_tokens,
             |    list_filter(list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END), v -> v IS NOT NULL) AS g2,
             |    list_filter(list_transform(l, (x,i) -> CASE WHEN i <= len(l)-2 THEN x || ' ' || l[i+1] || ' ' || l[i+2] END), v -> v IS NOT NULL) AS g3
             |  FROM t)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(round(CASE WHEN len(g2) <= 0 THEN 0.0
             |    ELSE CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2) END * 1000000) AS BIGINT) AS rep2_micro,
             |  CAST(round(CASE WHEN len(g3) <= 0 THEN 0.0
             |    ELSE CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) END * 1000000) AS BIGINT) AS rep3_micro
             |FROM g ORDER BY doc_id""".stripMargin)),

    // Rolling-hash document fingerprint (integer fold — engine-exact).
    Q("q44_text_fingerprint",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            TextAnalysis.rollingFingerprint($"text").as("fp"),
            TextAnalysis.tokenCount($"text").as("n_tokens"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split_regex(trim(text),'\s+'),
             |        t -> CAST(ascii(substring(t,1,1))*1000 + length(t) AS BIGINT))),
             |    (a, b) -> (a*31 + b) % 1000000007) AS fp,
             |  len(string_split_regex(trim(text),'\s+')) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII scrub: email/URL detection + redaction over documents with
    // deterministically injected contact strings; clean_fp is the
    // portable PolyHash of the scrubbed text, so the oracle verifies
    // the REDACTED CONTENT byte-for-byte, not just the counts.
    Q("q69_pii_scrub",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.ensureRegistered(s)
        val aug = Tables.documents(s, d).select($"doc_id",
          concat($"text", lit(" contact "), $"lang",
            lit("_user@example.com via https://example.org/d/"), $"doc_id").as("t"))
        aug.select($"doc_id",
            TextAnalysis.emailCount($"t").as("n_emails"),
            TextAnalysis.urlCount($"t").as("n_urls"),
            graft.functions.PolyHash.polyHash(TextAnalysis.scrubPii($"t")).as("clean_fp"))
          .orderBy($"doc_id")
      },
      Some("""WITH aug AS (
             |  SELECT doc_id,
             |    text || ' contact ' || lang || '_user@example.com via https://example.org/d/' || doc_id AS t
             |  FROM documents),
             |scrubbed AS (
             |  SELECT doc_id, t,
             |    regexp_replace(
             |      regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g'),
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS clean
             |  FROM aug)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(generate_series(1, length(clean)), i -> CAST(ascii(substring(clean, i, 1)) AS BIGINT))),
             |    (a,b) -> (a*31 + b) % 1000000007) AS clean_fp
             |FROM scrubbed ORDER BY doc_id""".stripMargin)),

    // Exact dedup on a normalization key (first two tokens): hash-groupBy,
    // min-id canonical representative.
    Q("q45_dedup_exact",
      (s, d) => {
        import s.implicits._
        val keyed = Tables.documents(s, d)
          .withColumn("key", concat_ws(" ", slice(TextAnalysis.tokens($"text"), 1, 2)))
        Dedup.exactDupGroups(keyed, "doc_id", Seq("key"))
          .orderBy($"key")
      },
      Some("""SELECT key, min(doc_id) AS keep_id, count(*) AS n_dups
             |FROM (SELECT doc_id,
             |        array_to_string(string_split_regex(trim(text),'\s+')[1:2], ' ') AS key
             |      FROM documents)
             |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin)),

    // Normalized exact dedup: canonicalize (strip punct, collapse
    // whitespace, ASCII lowercase) then group on the portable PolyHash
    // of the normalized form — the casing/punctuation-invariant dedup
    // key a pipeline actually shuffles on (never the text itself).
    Q("q74_normalized_dedup",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.ensureRegistered(s)
        val keyed = Tables.documents(s, d)
          .withColumn("norm", TextAnalysis.normalizeText($"text"))
          // key = hash of the first-6-token normalized prefix: document
          // HEADS are where boilerplate repeats (whole-text normalized
          // dups are empty on this corpus — a 0-row query checks nothing)
          .withColumn("key", graft.functions.PolyHash.polyHash(
            concat_ws(" ", slice(split($"norm", " "), 1, 6))))
        Dedup.exactDupGroups(keyed, "doc_id", Seq("key"))
          .orderBy($"key")
      },
      Some("""WITH n AS (
             |  SELECT doc_id,
             |    lower(trim(regexp_replace(regexp_replace(text, '[^A-Za-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, array_to_string(string_split(norm, ' ')[1:6], ' ') AS pfx FROM n),
             |k AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(pfx)), i -> CAST(ascii(substring(pfx, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) AS key
             |  FROM p)
             |SELECT key, min(doc_id) AS keep_id, count(*) AS n_dups
             |FROM k GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin)),

    // Exact bigram-Jaccard near-dup pairs, blocked by lang (the exact
    // ground truth the LSH variants approximate).
    Q("q46_dedup_jaccard",
      (s, d) => {
        import s.implicits._
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
            n = 2, threshold = 0.2, blockCols = Seq("lang"))
          .select($"id_a", $"id_b", r4($"jaccard").as("jaccard"))
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH toks AS (SELECT doc_id, lang, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |bg AS (
             |  SELECT doc_id, lang,
             |    unnest(list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL))) AS s
             |  FROM toks),
             |szs AS (SELECT doc_id, count(*) AS sz FROM bg GROUP BY 1),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM bg a JOIN bg b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
             |  GROUP BY 1,2)
             |SELECT id_a, id_b, round(i * 1.0 / (x.sz + y.sz - i), 4) AS jaccard
             |FROM inter JOIN szs x ON x.doc_id = id_a JOIN szs y ON y.doc_id = id_b
             |WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.2
             |ORDER BY 1, 2""".stripMargin)),

    // MinHash+LSH near-dup pairs with exact verification. The oracle
    // recomputes the WHOLE pipeline — PolyHash shingle bases, the
    // (h·a_i + b_i) mod P permutation mins, raw-slice band buckets,
    // bucket join, exact-Jaccard verify — in portable SQL; integer
    // arithmetic end-to-end, so it is bit-exact in any engine.
    Q("q47_dedup_minhash_lsh",
      (s, d) => {
        import s.implicits._
        Dedup.minHashLshPairs(Tables.documents(s, d), "doc_id", "text",
            n = 2, threshold = 0.2, bands = 21, rowsPerBand = 3)
          .select($"id_a", $"id_b", r4($"jaccard").as("jaccard"))
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |shg AS (
             |  SELECT doc_id,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS sh
             |  FROM toks),
             |base AS (
             |  SELECT doc_id, sh,
             |    list_transform(sh, s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM shg),
             |sig AS (
             |  SELECT doc_id, sh,
             |    list_transform(generate_series(1, 63), j ->
             |      coalesce(list_min(list_transform(hs, h ->
             |        (h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743)),
             |      CAST(-1 AS BIGINT))) AS sig
             |  FROM base),
             |bandrows AS (
             |  SELECT doc_id, b, sig[CAST(b*3+1 AS INT) : CAST(b*3+3 AS INT)] AS bucket
             |  FROM sig CROSS JOIN range(0, 21) t(b)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bandrows a JOIN bandrows b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
             |ver AS (
             |  SELECT id_a, id_b,
             |    len(list_intersect(x.sh, y.sh)) * 1.0 / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
             |  FROM cand JOIN shg x ON x.doc_id = id_a JOIN shg y ON y.doc_id = id_b)
             |SELECT id_a, id_b, round(jac, 4) + 0.0 AS jaccard
             |FROM ver WHERE jac >= 0.2 ORDER BY 1, 2""".stripMargin)),

    // Global SimHash near-dup pairs via lossless pigeonhole banding over
    // the 63-bit portable simhash — no caller blocking key, bucket-local
    // joins only. The banding is lossless (a pair within hamming maxDist
    // shares at least one of maxDist+1 chunks), so the oracle skips the
    // banding and checks the DEFINITION directly: recompute every
    // simhash from PolyHash token hashes and emit all pairs with
    // bit_count(xor) ≤ maxDist from an exhaustive scan.
    Q("q48_dedup_simhash",
      (s, d) => {
        import s.implicits._
        Dedup.simHashPairsBanded(Tables.documents(s, d), "doc_id", "text",
            maxDist = 6)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH th AS (
             |  SELECT doc_id,
             |    list_transform(string_split_regex(trim(text),'\s+'), s ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM documents),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
             |      CASE WHEN ((h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743) % 2 = 1
             |           THEN 1 ELSE -1 END)), 0) > 0
             |         THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END AS bit
             |  FROM th CROSS JOIN range(1, 64) t(j)),
             |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh FROM bits GROUP BY 1)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS dist
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sh, b.sh)) <= 6
             |ORDER BY 1, 2""".stripMargin)),

    // Benchmark decontamination: per corpus doc, distinct trigram
    // shingles shared with the "benchmark" slice (src0/src1 stand in
    // for an eval set). Linear semi-join — no pair blowup.
    Q("q72_contamination",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        Dedup.contaminationCountsSplit(docs, $"source".isin("src0", "src1"),
            "doc_id", "text", n = 3)
          .withColumn("share", round($"n_contaminated" * 1000000.0 / $"n_shingles", 0).cast("long"))
          .select($"id".as("doc_id"), $"n_contaminated", $"n_shingles", $"share")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |shg AS (
             |  SELECT doc_id, source,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-2 THEN x || ' ' || l[i+1] || ' ' || l[i+2] END),
             |      v -> v IS NOT NULL)) AS sh
             |  FROM toks),
             |bench AS (
             |  SELECT DISTINCT unnest(sh) AS s FROM shg WHERE source IN ('src0','src1')),
             |corpus AS (
             |  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS s FROM shg
             |  WHERE source NOT IN ('src0','src1'))
             |SELECT c.doc_id, count(*) AS n_contaminated,
             |  CAST(min(c.n_shingles) AS BIGINT) AS n_shingles,
             |  CAST(round(count(*) * 1000000.0 / min(c.n_shingles)) AS BIGINT) AS share
             |FROM corpus c WHERE c.s IN (SELECT s FROM bench)
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // Near-dup pairs → dedup GROUPS: connected components of the
    // banded-simhash pair graph, canonical member = min id. The oracle
    // recomputes the pairs (q48 pipeline) and closes them with a
    // recursive CTE — min reachable id ≡ component minimum.
    Q("q68_dedup_groups",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val pairs = Dedup.simHashPairsBanded(docs, "doc_id", "text", maxDist = 6)
        Dedup.duplicateGroups(pairs, docs.select($"doc_id"), "doc_id")
          .select($"id".as("doc_id"), $"canonical_id", $"n_group")
          .orderBy($"canonical_id", $"doc_id")
      },
      Some("""WITH RECURSIVE th AS (
             |  SELECT doc_id,
             |    list_transform(string_split_regex(trim(text),'\s+'), s ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM documents),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
             |      CASE WHEN ((h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743) % 2 = 1
             |           THEN 1 ELSE -1 END)), 0) > 0
             |         THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END AS bit
             |  FROM th CROSS JOIN range(1, 64) t(j)),
             |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh FROM bits GROUP BY 1),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.sh, b.sh)) <= 6),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS lbl FROM documents
             |  UNION
             |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(lbl) AS canonical_id FROM reach GROUP BY id),
             |sized AS (SELECT canonical_id, count(*) AS n_group FROM comp GROUP BY 1)
             |SELECT c.id AS doc_id, c.canonical_id, s.n_group
             |FROM comp c JOIN sized s USING (canonical_id)
             |WHERE s.n_group > 1
             |ORDER BY canonical_id, doc_id""".stripMargin)),

    // Brute-force cosine top-k: the exact ANN baseline. The double dot
    // product is an explicit sequential fold → bit-equal to the oracle's
    // identical fold.
    Q("q49_knn_cosine",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceKnn(emb.filter($"vec_id" < 5), emb, k = 5)
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
             |j AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
             |        (a,b) -> a + b)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b)))
             |    , 6) + 0.0 AS sim
             |  FROM q, embeddings e WHERE e.vec_id != q_id)
             |SELECT q_id, rank, n_id, sim FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM j)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // LSH-bucketed ANN. The planes are an integer LCG over the flat
    // (table, plane, dim) index, so the oracle recomputes every bucket
    // bit exactly: the projection is the same left-to-right double fold
    // in both engines, hence the same IEEE sum and the same sign.
    Q("q50_ann_lsh",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Similarity.lshKnn(emb.filter($"vec_id" < 5), emb, dim = 64, k = 5,
            nBits = 6, tables = 4)
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |buckets AS (
             |  SELECT vec_id, t,
             |    CAST(sum(CASE WHEN
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) *
             |          (CAST(((t*100000 + p*1000 + (i-1)) * 1103515245 + 12345) % 1000 AS DOUBLE) / 1000.0 - 0.5))),
             |        (a,b) -> a + b) >= 0
             |      THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM e CROSS JOIN range(0, 4) tt(t) CROSS JOIN range(0, 6) pp(p)
             |  GROUP BY vec_id, t),
             |cand AS (
             |  SELECT DISTINCT qb.vec_id AS q_id, cb.vec_id AS n_id
             |  FROM buckets qb JOIN buckets cb ON qb.t = cb.t AND qb.bucket = cb.bucket AND qb.vec_id != cb.vec_id
             |  WHERE qb.vec_id < 5),
             |sims AS (
             |  SELECT q_id, n_id, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE))), (p,v) -> p + v))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ne.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ne ON ne.vec_id = n_id)
             |SELECT q_id, rank, n_id, sim FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM sims)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Embedding-cosine near-dup pairs within a label block.
    Q("q51_embed_dup_pairs",
      (s, d) => {
        import s.implicits._
        Similarity.cosineDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
            blockCols = Seq("label"), threshold = 0.25)
          .select($"id_a", $"id_b", $"sim")
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
             |j AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(a.embedding, (x,i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
             |        (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (p,v) -> p + v))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
             |SELECT id_a, id_b, sim FROM j WHERE sim >= 0.25 ORDER BY 1, 2""".stripMargin)),

    // IVF coarse-quantizer ANN. Oracle-checkable because every stage is
    // engine-deterministic: seeds are the k lowest ids, the Lloyd-step
    // centroid means are exact integer micro-sums (order-independent),
    // and the cosine argmaxes use the identical left-to-right double
    // fold, so assignment / probing / rerank reproduce exactly.
    Q("q64_ivf_knn",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.ext.IvfIndex.ivfKnn(s, emb.filter($"vec_id" < 5), emb,
            k = 5, kCentroids = 16, nProbe = 4)
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
             |seeds AS (SELECT id AS cid, emb AS cemb FROM v ORDER BY id LIMIT 16),
             |asg0 AS (
             |  SELECT id, cid FROM (
             |    SELECT v.id, s.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(s.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        s.cid) AS rn
             |    FROM v CROSS JOIN seeds s)
             |  WHERE rn = 1),
             |dimrows AS (
             |  SELECT cid, u.pos, u.x
             |  FROM (SELECT a0.cid, unnest(list_transform(v.emb, (x,i) -> {'pos': i, 'x': x})) AS u
             |        FROM asg0 a0 JOIN v USING (id)) a),
             |dims AS (
             |  SELECT cid, pos,
             |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0 AS FLOAT) AS m
             |  FROM dimrows GROUP BY cid, pos),
             |cent AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM dims GROUP BY cid),
             |lists AS (
             |  SELECT cid, id AS n_id FROM (
             |    SELECT v.id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS rn
             |    FROM v CROSS JOIN cent c)
             |  WHERE rn = 1),
             |probes AS (
             |  SELECT q_id, cid FROM (
             |    SELECT v.id AS q_id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS pr
             |    FROM v CROSS JOIN cent c WHERE v.id < 5)
             |  WHERE pr <= 4),
             |cand AS (
             |  SELECT DISTINCT p.q_id, l.n_id
             |  FROM probes p JOIN lists l USING (cid)
             |  WHERE p.q_id != l.n_id),
             |sims AS (
             |  SELECT q_id, n_id, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(qe.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.emb[i] AS DOUBLE))), (p,w) -> p + w)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(qe.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(qe.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ne.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.emb[i] AS DOUBLE))), (p,w) -> p + w)))
             |    , 6) + 0.0 AS sim
             |  FROM cand JOIN v qe ON qe.id = q_id JOIN v ne ON ne.id = n_id)
             |SELECT q_id, rank, n_id, sim FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM sims)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // SemDeDup-style semantic dedup: IVF cells as the blocking key,
    // exact cosine pairs within each cell (salted cell self-join). The
    // oracle reuses the q64 quantizer CTE (seed → exact-integer Lloyd →
    // assignment) and pair-joins the inverted lists.
    Q("q79_semantic_dedup",
      (s, d) => {
        import s.implicits._
        Similarity.semanticDupPairs(s, Tables.embeddings(s, d),
            threshold = 0.25, kCells = 16)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
             |seeds AS (SELECT id AS cid, emb AS cemb FROM v ORDER BY id LIMIT 16),
             |asg0 AS (
             |  SELECT id, cid FROM (
             |    SELECT v.id, s.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(s.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        s.cid) AS rn
             |    FROM v CROSS JOIN seeds s)
             |  WHERE rn = 1),
             |dimrows AS (
             |  SELECT cid, u.pos, u.x
             |  FROM (SELECT a0.cid, unnest(list_transform(v.emb, (x,i) -> {'pos': i, 'x': x})) AS u
             |        FROM asg0 a0 JOIN v USING (id)) a),
             |dims AS (
             |  SELECT cid, pos,
             |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0 AS FLOAT) AS m
             |  FROM dimrows GROUP BY cid, pos),
             |cent AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM dims GROUP BY cid),
             |lists AS (
             |  SELECT cid, id AS n_id FROM (
             |    SELECT v.id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS rn
             |    FROM v CROSS JOIN cent c)
             |  WHERE rn = 1),
             |sims AS (
             |  SELECT a.n_id AS id_a, b.n_id AS id_b, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(va.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(vb.emb[i] AS DOUBLE))), (p,w) -> p + w)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(va.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(va.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(vb.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(vb.emb[i] AS DOUBLE))), (p,w) -> p + w)))
             |    , 6) + 0.0 AS sim
             |  FROM lists a JOIN lists b ON a.cid = b.cid AND a.n_id < b.n_id
             |  JOIN v va ON va.id = a.n_id JOIN v vb ON vb.id = b.n_id)
             |SELECT id_a, id_b, sim FROM sims WHERE sim >= 0.25 ORDER BY 1, 2""".stripMargin)),

    // IVF with a SECOND Lloyd refinement step (iters = 2): the oracle
    // chains one more exact-integer assign+mean round (asg1/dims1) onto
    // the q64 CTE — multi-step refinement stays bit-reproducible, so
    // the quantizer can be converged further without losing the oracle.
    Q("q78_ivf_knn_refined",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        graft.ext.IvfIndex.ivfKnn(s, emb.filter($"vec_id" < 5), emb,
            k = 5, kCentroids = 16, nProbe = 4, iters = 2)
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
             |seeds AS (SELECT id AS cid, emb AS cemb FROM v ORDER BY id LIMIT 16),
             |asg0 AS (
             |  SELECT id, cid FROM (
             |    SELECT v.id, s.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(s.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        s.cid) AS rn
             |    FROM v CROSS JOIN seeds s)
             |  WHERE rn = 1),
             |dimrows0 AS (
             |  SELECT cid, u.pos, u.x
             |  FROM (SELECT a0.cid, unnest(list_transform(v.emb, (x,i) -> {'pos': i, 'x': x})) AS u
             |        FROM asg0 a0 JOIN v USING (id)) a),
             |dims0 AS (
             |  SELECT cid, pos,
             |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0 AS FLOAT) AS m
             |  FROM dimrows0 GROUP BY cid, pos),
             |cent0 AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM dims0 GROUP BY cid),
             |asg1 AS (
             |  SELECT id, cid FROM (
             |    SELECT v.id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS rn
             |    FROM v CROSS JOIN cent0 c)
             |  WHERE rn = 1),
             |dimrows1 AS (
             |  SELECT cid, u.pos, u.x
             |  FROM (SELECT a1.cid, unnest(list_transform(v.emb, (x,i) -> {'pos': i, 'x': x})) AS u
             |        FROM asg1 a1 JOIN v USING (id)) a),
             |dims1 AS (
             |  SELECT cid, pos,
             |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0 AS FLOAT) AS m
             |  FROM dimrows1 GROUP BY cid, pos),
             |cent AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM dims1 GROUP BY cid),
             |lists AS (
             |  SELECT cid, id AS n_id FROM (
             |    SELECT v.id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS rn
             |    FROM v CROSS JOIN cent c)
             |  WHERE rn = 1),
             |probes AS (
             |  SELECT q_id, cid FROM (
             |    SELECT v.id AS q_id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS pr
             |    FROM v CROSS JOIN cent c WHERE v.id < 5)
             |  WHERE pr <= 4),
             |cand AS (
             |  SELECT DISTINCT p.q_id, l.n_id
             |  FROM probes p JOIN lists l USING (cid)
             |  WHERE p.q_id != l.n_id),
             |sims AS (
             |  SELECT q_id, n_id, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(qe.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.emb[i] AS DOUBLE))), (p,w) -> p + w)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(qe.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(qe.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ne.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.emb[i] AS DOUBLE))), (p,w) -> p + w)))
             |    , 6) + 0.0 AS sim
             |  FROM cand JOIN v qe ON qe.id = q_id JOIN v ne ON ne.id = n_id)
             |SELECT q_id, rank, n_id, sim FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM sims)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Native gap-based sessionization (session_window) — batch twin of
    // graft.streaming.Sessionize; window end = last event + gap.
    Q("q63_sessionize",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(session_window($"ts", "2 hours").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"),
            (sum(round($"value" * 100, 0).cast("long")) / 100.0).as("total_value"))
          .select($"user_id",
            unix_micros($"w.start").as("session_start"),
            unix_micros($"w.end").as("session_end"),
            $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsm, value FROM events),
             |l AS (SELECT *, lag(tsm) OVER (PARTITION BY user_id ORDER BY tsm) AS prev FROM e),
             |m AS (SELECT *, CASE WHEN prev IS NULL OR tsm - prev >= 7200000000 THEN 1 ELSE 0 END AS new_s FROM l),
             |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tsm ROWS UNBOUNDED PRECEDING) AS sn FROM m)
             |SELECT user_id, min(tsm) AS session_start,
             |  max(tsm) + 7200000000 AS session_end,
             |  count(*) AS n_events,
             |  sum(CAST(round(value*100,0) AS BIGINT))/100.0 AS total_value
             |FROM s GROUP BY user_id, sn ORDER BY user_id, session_start""".stripMargin)),

    // Frame sampling over decoded media: k evenly-spaced frame indices
    // per item (floor(i·n_frames/k), distinct) — video-clip sampling
    // plumbing; one Generate, no shuffle. The oracle reruns the stub
    // decode's frame count (bytes/256 + 1) and the same integer
    // schedule.
    Q("q70_frame_sampling",
      (s, d) => {
        import s.implicits._
        val feats = Multimodal.featurize(s,
          Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        Multimodal.sampleFrames(feats, k = 8)
          .orderBy($"media_id", $"frame_idx")
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id,
             |    octet_length(encode(text)) // 256 + 1 AS n_frames
             |  FROM documents),
             |s AS (
             |  SELECT media_id, n_frames,
             |    unnest(list_distinct(list_transform(generate_series(0, 7),
             |      i -> CAST(floor(i * n_frames / 8.0) AS BIGINT)))) AS frame_idx
             |  FROM f)
             |SELECT media_id, frame_idx, CAST(n_frames AS BIGINT) AS n_frames
             |FROM s ORDER BY media_id, frame_idx""".stripMargin)),

    // Int8 embedding quantization: per-vector max-abs scale, clamped
    // HALF_UP codes, portable checksum of the codes, and the mean
    // dequantization error. Every step is plain double arithmetic +
    // integer folds — the oracle reproduces the codes exactly.
    Q("q71_embed_quantize",
      (s, d) => {
        import s.implicits._
        val m = Tables.embeddings(s, d)
          .select($"vec_id", $"embedding",
            Similarity.maxAbs($"embedding").as("maxabs"))
        val q = m.select($"vec_id", $"embedding", $"maxabs",
          Similarity.int8Quantize($"embedding", $"maxabs").as("qv"))
        // integer micro-units, not round(x, 6): Spark rounds decimals
        // exactly (BigDecimal) while DuckDB rounds via a lossy ×10^6
        // multiply — values near a 6th-decimal midpoint flip between
        // engines. round(x·10^6, 0) shares the lossy multiply, so both
        // engines round the identical double.
        q.select($"vec_id",
            round($"maxabs" * 1000000, 0).cast("long").as("maxabs_micro"),
            Similarity.int8Checksum($"qv").as("q_checksum"),
            round(Similarity.dequantMae($"embedding", $"qv", $"maxabs") * 1000000, 0)
              .cast("long").as("mae_micro"))
          .orderBy($"vec_id")
      },
      Some("""WITH m AS (
             |  SELECT vec_id, embedding,
             |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, embedding, maxabs,
             |    list_transform(embedding, x ->
             |      CAST(CASE WHEN maxabs = 0 THEN 0
             |           ELSE greatest(CAST(-127 AS DOUBLE), least(CAST(127 AS DOUBLE),
             |                round(CAST(x AS DOUBLE) * 127.0 / maxabs, 0))) END AS INT)) AS qv
             |  FROM m)
             |SELECT vec_id,
             |  CAST(round(maxabs * 1000000) AS BIGINT) AS maxabs_micro,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(qv, v -> CAST(v + 127 AS BIGINT))),
             |    (a,b) -> (a*31 + b) % 1000000007) AS q_checksum,
             |  CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |    list_transform(qv, (v,i) ->
             |      abs(CAST(embedding[i] AS DOUBLE) - CAST(v AS DOUBLE) * maxabs / 127.0))),
             |    (a,b) -> a + b) / len(qv) * 1000000) AS BIGINT) AS mae_micro
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Multimodal plumbing: binary payload + metadata → partition-wise
    // stub decode (mapPartitions seam; graft.ext.Multimodal).
    Q("q52_multimodal_features",
      (s, d) => {
        import s.implicits._
        Multimodal.featurize(s, Multimodal.mediaFromDocuments(Tables.documents(s, d)))
          .orderBy($"media_id")
      },
      Some("""SELECT doc_id AS media_id, 'text/utf-8' AS kind,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  octet_length(encode(text)) // 256 + 1 AS n_frames,
             |  CAST(ascii(substring(text,1,1)) AS INT) AS head_byte,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, least(length(text), 64)),
             |        i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
             |    (a, b) -> (a*31 + b) % 1000000007) AS checksum
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Within-corpus repeated-span detection: per doc, distinct 8-token
    // windows whose PolyHash occurs in >= 2 (doc, window) entries
    // corpus-wide. Linear passes + one agg — no pair join.
    Q("q81_repeated_spans",
      (s, d) => {
        import s.implicits._
        Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text", n = 8)
          .select($"id".as("doc_id"), $"n_windows", $"n_shared")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-7
             |        THEN x || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
             |             l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7] END),
             |      v -> v IS NOT NULL)) AS gs
             |  FROM t),
             |p AS (SELECT doc_id, unnest(gs) AS gr FROM g),
             |hh AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(gr)),
             |        i -> CAST(ascii(substring(gr, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) AS h
             |  FROM p),
             |byh AS (SELECT h, count(*) AS n_docs FROM hh GROUP BY h),
             |sh AS (
             |  SELECT doc_id, count(*) AS n_shared
             |  FROM hh JOIN byh USING (h) WHERE n_docs >= 2 GROUP BY doc_id)
             |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_windows,
             |  CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared
             |FROM g LEFT JOIN sh ON g.doc_id = sh.doc_id
             |ORDER BY g.doc_id""".stripMargin)),

    // Gopher/RefinedWeb-style heuristic rule bundle: per-document
    // boolean flags (length window, mean word length, alphabetic-word
    // ratio, stopword floor, symbol ratio) + the conjunctive keep
    // decision — the explicit filter table a pretraining pipeline
    // materializes. Token array staged once (the q43 lesson).
    Q("q82_gopher_rules",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
        val m = base.select($"doc_id",
          size($"toks").cast("long").as("n_tokens"),
          TextAnalysis.alphaTokenCount($"toks").as("n_alpha"),
          TextAnalysis.stopwordCountFromTokens($"toks",
            TextAnalysis.StopwordProfiles.flatMap(_._2)).as("n_stop"),
          TextAnalysis.symbolCount($"text").as("n_symbol"),
          ((length($"text") - size($"toks") + 1).cast("double") / size($"toks")).as("mean_len"))
        m.select($"doc_id", $"n_tokens",
            ($"n_tokens" >= 50 && $"n_tokens" <= 100000).as("flag_len"),
            ($"mean_len" >= 3.0 && $"mean_len" <= 10.0).as("flag_word_len"),
            ($"n_alpha" * 1.0 / $"n_tokens" >= 0.8).as("flag_alpha"),
            ($"n_stop" >= 2).as("flag_stop"),
            ($"n_symbol" * 1.0 / $"n_tokens" <= 0.1).as("flag_symbol"))
          .withColumn("keep", $"flag_len" && $"flag_word_len" && $"flag_alpha" &&
            $"flag_stop" && $"flag_symbol")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split_regex(trim(text),'\s+') AS toks FROM documents),
             |m AS (
             |  SELECT doc_id, len(toks) AS n_tokens,
             |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) AS n_stop,
             |    len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_symbol,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len
             |  FROM t)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  n_tokens >= 50 AND n_tokens <= 100000 AS flag_len,
             |  mean_len >= 3.0 AND mean_len <= 10.0 AS flag_word_len,
             |  n_alpha * 1.0 / n_tokens >= 0.8 AS flag_alpha,
             |  n_stop >= 2 AS flag_stop,
             |  n_symbol * 1.0 / n_tokens <= 0.1 AS flag_symbol,
             |  (n_tokens >= 50 AND n_tokens <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
             |    AND (n_alpha * 1.0 / n_tokens >= 0.8) AND (n_stop >= 2)
             |    AND (n_symbol * 1.0 / n_tokens <= 0.1) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // End-to-end curation pipeline: Gopher rule filter → exact dedup
    // (min-id canonical per identical text) → deterministic hash split.
    // The composition story — every stage is an operator verified on
    // its own above, and the chained oracle re-derives the whole
    // surviving corpus.
    Q("q83_curation_pipeline",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .select($"doc_id", $"text", TextAnalysis.tokens($"text").as("toks"))
        val m = base.select($"doc_id", $"text",
          size($"toks").cast("long").as("n_tokens"),
          TextAnalysis.alphaTokenCount($"toks").as("n_alpha"),
          TextAnalysis.stopwordCountFromTokens($"toks",
            TextAnalysis.StopwordProfiles.flatMap(_._2)).as("n_stop"),
          TextAnalysis.symbolCount($"text").as("n_symbol"),
          ((length($"text") - size($"toks") + 1).cast("double") / size($"toks")).as("mean_len"))
        val kept = m.filter($"n_tokens" >= 50 && $"n_tokens" <= 100000 &&
          $"mean_len" >= 3.0 && $"mean_len" <= 10.0 &&
          $"n_alpha" * 1.0 / $"n_tokens" >= 0.8 && $"n_stop" >= 2 &&
          $"n_symbol" * 1.0 / $"n_tokens" <= 0.1)
        val canon = kept.groupBy($"text").agg(min($"doc_id").as("doc_id"))
          .select($"doc_id")
        CorpusOps.hashSplit(canon, "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
          .select($"doc_id", $"bucket".cast("long").as("bucket"), $"split")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split_regex(trim(text),'\s+') AS toks FROM documents),
             |m AS (
             |  SELECT doc_id, text, len(toks) AS n_tokens,
             |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) AS n_stop,
             |    len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_symbol,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len
             |  FROM t),
             |kept AS (
             |  SELECT doc_id, text FROM m
             |  WHERE n_tokens >= 50 AND n_tokens <= 100000
             |    AND mean_len >= 3.0 AND mean_len <= 10.0
             |    AND n_alpha * 1.0 / n_tokens >= 0.8 AND n_stop >= 2
             |    AND n_symbol * 1.0 / n_tokens <= 0.1),
             |canon AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
             |h AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        i -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) % 100 AS bucket
             |  FROM canon)
             |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
             |  CASE WHEN bucket < 90 THEN 'train'
             |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Sliding token-window chunking (RAG/context prep): 64-token
    // windows, 48-token step (16 overlap), last window clipped. Pure
    // projection + Generate — zero shuffles at any corpus size.
    Q("q84_chunk_windows",
      (s, d) => {
        import s.implicits._
        CorpusOps.chunkWindows(
            Tables.documents(s, d).select($"doc_id", $"text"),
            "doc_id", TextAnalysis.tokenCount($"text"), winSize = 64, step = 48)
          .select($"id".as("doc_id"), $"n_tokens", $"chunk_idx",
            $"tok_start", $"tok_end")
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, len(string_split_regex(trim(text),'\s+')) AS n_tokens
             |  FROM documents),
             |m AS (
             |  SELECT doc_id, n_tokens,
             |    CASE WHEN n_tokens <= 64 THEN 1
             |         ELSE (n_tokens - 64 + 47) // 48 + 1 END AS n_chunks
             |  FROM t),
             |c AS (
             |  SELECT doc_id, n_tokens,
             |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
             |  FROM m)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
             |  CAST(chunk_idx * 48 AS BIGINT) AS tok_start,
             |  CAST(least(chunk_idx * 48 + 64, n_tokens) AS BIGINT) AS tok_end
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Quality-aware canonical selection: near-dup components (banded
    // SimHash, d<=6) keep their HIGHEST-quality member, not the
    // smallest id — the SemDeDup/FineWeb "keep best" curation rule.
    // Composes three independently-verified operators: simhash pairs
    // (q48), component labels (q68), quality score (q42).
    Q("q85_keep_best_quality",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val pairs = Dedup.simHashPairsBanded(docs, "doc_id", "text", maxDist = 6)
        val scored = docs.select($"doc_id",
          TextAnalysis.qualityScore($"text").as("quality"))
        Dedup.keepBestByScore(pairs, scored, "doc_id", "quality")
          .select($"canonical_id", $"keep_id", $"n_group",
            $"best_score".as("best_quality"))
          .orderBy($"canonical_id")
      },
      Some("""WITH RECURSIVE th AS (
             |  SELECT doc_id,
             |    list_transform(string_split_regex(trim(text),'\s+'), s ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM documents),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
             |      CASE WHEN ((h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743) % 2 = 1
             |           THEN 1 ELSE -1 END)), 0) > 0
             |         THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END AS bit
             |  FROM th CROSS JOIN range(1, 64) t(j)),
             |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh FROM bits GROUP BY 1),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.sh, b.sh)) <= 6),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS lbl FROM documents
             |  UNION
             |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(lbl) AS canonical_id FROM reach GROUP BY id),
             |tq AS (
             |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |mq AS (
             |  SELECT doc_id, len(toks) AS n_tokens,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) * 1.0 / len(toks) AS stop_ratio
             |  FROM tq),
             |qual AS (
             |  SELECT doc_id,
             |    round(least(greatest(least(n_tokens/50.0, 1.0)
             |      * (CASE WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 0.5 ELSE 1.0 END)
             |      * (0.7 + stop_ratio), 0.0), 1.0), 4) AS quality
             |  FROM mq),
             |r AS (
             |  SELECT c.canonical_id, c.id, q.quality,
             |    row_number() OVER (PARTITION BY c.canonical_id
             |                       ORDER BY q.quality DESC, c.id ASC) AS rn,
             |    count(*) OVER (PARTITION BY c.canonical_id) AS n_group
             |  FROM comp c JOIN qual q ON c.id = q.doc_id)
             |SELECT canonical_id, id AS keep_id, CAST(n_group AS BIGINT) AS n_group,
             |  quality AS best_quality
             |FROM r WHERE rn = 1 AND n_group > 1
             |ORDER BY canonical_id""".stripMargin)),

    // Incremental ingestion near-dup screen: a "new batch" (every 5th
    // doc) checked against the standing corpus with the asymmetric
    // banded SimHash join — the corpus never self-pairs, so per-batch
    // cost is O(batch) against stable corpus buckets.
    Q("q86_incremental_dedup",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val batch = docs.filter($"doc_id" % 5 === 0)
        val corpus = docs.filter($"doc_id" % 5 =!= 0)
        Dedup.simHashPairsAgainst(corpus, batch, "doc_id", "text", maxDist = 6)
          .orderBy($"batch_id", $"corpus_id")
      },
      Some("""WITH th AS (
             |  SELECT doc_id,
             |    list_transform(string_split_regex(trim(text),'\s+'), s ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM documents),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
             |      CASE WHEN ((h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743) % 2 = 1
             |           THEN 1 ELSE -1 END)), 0) > 0
             |         THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END AS bit
             |  FROM th CROSS JOIN range(1, 64) t(j)),
             |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh FROM bits GROUP BY 1),
             |b AS (SELECT doc_id, sh FROM sh WHERE doc_id % 5 = 0),
             |c AS (SELECT doc_id, sh FROM sh WHERE doc_id % 5 <> 0)
             |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
             |  CAST(bit_count(xor(b.sh, c.sh)) AS BIGINT) AS dist
             |FROM b JOIN c ON bit_count(xor(b.sh, c.sh)) <= 6
             |ORDER BY batch_id, corpus_id""".stripMargin)),

    // Token-budget curation: admit documents best-quality-first until
    // 20k tokens are spent — "the best N tokens", not "the best N
    // docs". The oracle's single global window IS the semantics; the
    // operator evaluates it with the two-phase prefix sum.
    Q("q87_token_budget_select",
      (s, d) => {
        import s.implicits._
        val scored = Tables.documents(s, d).select($"doc_id",
          TextAnalysis.tokenCount($"text").as("n_toks"),
          TextAnalysis.qualityScore($"text").as("quality"))
        CorpusOps.tokenBudgetSelect(scored, "doc_id", $"n_toks",
            "quality", budget = 20000L)
          .select($"id".as("doc_id"), $"score".as("quality"),
            $"n_tokens", $"cum_tokens")
          .orderBy($"doc_id")
      },
      Some("""WITH tq AS (
             |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |mq AS (
             |  SELECT doc_id, len(toks) AS n_tokens,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) * 1.0 / len(toks) AS stop_ratio
             |  FROM tq),
             |s AS (
             |  SELECT doc_id, n_tokens,
             |    round(least(greatest(least(n_tokens/50.0, 1.0)
             |      * (CASE WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 0.5 ELSE 1.0 END)
             |      * (0.7 + stop_ratio), 0.0), 1.0), 4) AS quality
             |  FROM mq),
             |c AS (
             |  SELECT doc_id, quality, n_tokens,
             |    sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
             |  FROM s)
             |SELECT doc_id, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(cum_tokens AS BIGINT) AS cum_tokens
             |FROM c WHERE cum_tokens <= 20000 ORDER BY doc_id""".stripMargin)),

    // Embedding prototypicality/outlier filter: cosine of each vector
    // to its assigned IVF centroid (k=16, 1 Lloyd step — the q64/q79
    // quantizer). Low affinity = isolated vector; the keep flag gates
    // at 0.15. Rounds out the embedding-curation set: q79 drops the
    // too-similar, this flags the too-isolated.
    Q("q88_embedding_outliers",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.ensureRegistered(s)
        val embs = Tables.embeddings(s, d)
        val centroids = IvfIndex.materializeLocal(s,
          IvfIndex.buildCentroids(s, embs, 16))
        IvfIndex.assignAffinity(
            embs.select($"vec_id".as("id"), $"embedding".as("emb")), centroids)
          .select($"id".as("vec_id"), $"cid", $"aff",
            ($"aff" >= 0.15).as("keep"))
          .orderBy($"vec_id")
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
             |seeds AS (SELECT id AS cid, emb AS cemb FROM v ORDER BY id LIMIT 16),
             |asg0 AS (
             |  SELECT id, cid FROM (
             |    SELECT v.id, s.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(s.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        s.cid) AS rn
             |    FROM v CROSS JOIN seeds s)
             |  WHERE rn = 1),
             |dimrows AS (
             |  SELECT cid, u.pos, u.x
             |  FROM (SELECT a0.cid, unnest(list_transform(v.emb, (x,i) -> {'pos': i, 'x': x})) AS u
             |        FROM asg0 a0 JOIN v USING (id)) a),
             |dims AS (
             |  SELECT cid, pos,
             |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0 AS FLOAT) AS m
             |  FROM dimrows GROUP BY cid, pos),
             |cent AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM dims GROUP BY cid),
             |aff AS (
             |  SELECT id, cid, sim FROM (
             |    SELECT v.id, c.cid,
             |      (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) AS sim,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS rn
             |    FROM v CROSS JOIN cent c)
             |  WHERE rn = 1)
             |SELECT id AS vec_id, cid, round(sim, 6) + 0.0 AS aff,
             |  round(sim, 6) + 0.0 >= 0.15 AS keep
             |FROM aff ORDER BY vec_id""".stripMargin)),

    // Source-mix rebalancing to a training recipe: even-numbered
    // sources get 7% of a 200-doc budget (quota 14), odd get 3%
    // (quota 6) — per-stratum deterministic hash draws, no rand().
    Q("q89_rebalance_mix",
      (s, d) => {
        import s.implicits._
        val weights = Seq.tabulate(20)(i =>
          s"src$i" -> (if (i % 2 == 0) 0.07 else 0.03))
        CorpusOps.rebalanceToMix(Tables.documents(s, d), "source", "doc_id",
            weights, total = 200L)
          .select($"source", $"doc_id", $"quota", $"draw_rank")
          .orderBy($"source", $"doc_id")
      },
      Some("""WITH h AS (
             |  SELECT source, doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        i -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) AS h
             |  FROM documents),
             |r AS (
             |  SELECT source, doc_id, h,
             |    CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0
             |         THEN 14 ELSE 6 END AS quota,
             |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
             |  FROM h)
             |SELECT source, doc_id, CAST(quota AS BIGINT) AS quota,
             |  CAST(rk AS BIGINT) AS draw_rank
             |FROM r WHERE rk <= quota ORDER BY source, doc_id""".stripMargin)),

    // Deterministic train/val/test split: bucket = PolyHash(id) mod 100
    // → named ranges. A pure per-row projection (no rand(), no shuffle):
    // membership is a function of the id alone, so appending documents
    // never reassigns existing ones.
    Q("q75_hash_split",
      (s, d) => {
        import s.implicits._
        CorpusOps.hashSplit(Tables.documents(s, d), "doc_id",
            Seq("train" -> 90, "val" -> 5, "test" -> 5))
          .select($"doc_id", $"bucket".cast("long").as("bucket"), $"split")
          .orderBy($"doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        i -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) % 100 AS bucket
             |  FROM documents)
             |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
             |  CASE WHEN bucket < 90 THEN 'train'
             |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Global sequence packing (concat-and-chunk at a 512-token budget)
    // via the two-phase prefix sum — per-range-partition cumsum plus an
    // O(#partitions) offset pass, never a global-order window. The
    // oracle's single global cumsum is the semantics; the operator's
    // plan is the scalable evaluation of it.
    Q("q76_pack_sequences",
      (s, d) => {
        import s.implicits._
        CorpusOps.packSequences(Tables.documents(s, d), "doc_id",
            TextAnalysis.tokenCount($"text"), budget = 512)
          .select($"id".as("doc_id"), $"n_tokens", $"start_tok",
            $"chunk_start", $"chunk_end")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_tok
             |  FROM t)
             |SELECT doc_id, n_tokens, start_tok,
             |  start_tok // 512 AS chunk_start,
             |  (start_tok + n_tokens - 1) // 512 AS chunk_end
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Deterministic per-epoch training shuffle: position = rank of
    // ((a_e·PolyHash(id) + b_e) mod P, id) — the epoch seeds an affine
    // mix over the base hash (a string-tagged hash of a short id never
    // wraps the modulus, so it would NOT re-permute across epochs).
    // Two-phase global rank (range-partition by hash + per-partition
    // offsets), never a global-order window. Epoch 1 → a = 2207030490
    // mod P = 207030476, b = 12352.
    Q("q80_epoch_shuffle",
      (s, d) => {
        import s.implicits._
        CorpusOps.epochShuffle(Tables.documents(s, d), "doc_id", epoch = 1)
          .select($"id".as("doc_id"), $"h", $"pos")
          .orderBy($"doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        i -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)
             |     * ((CAST(1103515245 AS BIGINT) * 2) % 1000000007) + 12352) % 1000000007 AS h
             |  FROM documents)
             |SELECT doc_id, h,
             |  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified sample: the 50 smallest (PolyHash(id),
    // id) draws per source stratum — uniform-without-replacement with
    // the hash as the random draw; the rank window parallelizes across
    // strata.
    Q("q77_stratified_sample",
      (s, d) => {
        import s.implicits._
        CorpusOps.stratifiedSample(Tables.documents(s, d), "source", "doc_id", k = 50)
          .select($"source", $"doc_id", $"h", $"draw_rank")
          .orderBy($"source", $"doc_id")
      },
      Some("""WITH h AS (
             |  SELECT source, doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        i -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) AS h
             |  FROM documents),
             |r AS (
             |  SELECT source, doc_id, h,
             |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
             |  FROM h)
             |SELECT source, doc_id, h, CAST(rk AS BIGINT) AS draw_rank
             |FROM r WHERE rk <= 50 ORDER BY source, doc_id""".stripMargin)),

    // Corpus-trained unigram LM scoring: per-doc negative log-likelihood
    // in integer micro-nats (ln of exact integer count ratios, rounded
    // once per token TYPE; per-doc totals are integer sums — order-
    // independent). The vocab-sized model broadcasts.
    Q("q92_unigram_nll",
      (s, d) => {
        import s.implicits._
        LangModel.docNll(Tables.documents(s, d), "doc_id", "text")
          .select($"id".as("doc_id"), $"n_tokens", $"sum_nll_micro", $"avg_nll_micro")
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS tok
             |  FROM documents),
             |c AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
             |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
             |lp AS (
             |  SELECT tok,
             |    CAST(round((ln(CAST(n.n AS DOUBLE)) - ln(CAST(c.c AS DOUBLE))) * 1000000) AS BIGINT) AS nll_micro
             |  FROM c, n)
             |SELECT u.doc_id, count(*) AS n_tokens,
             |  CAST(sum(lp.nll_micro) AS BIGINT) AS sum_nll_micro,
             |  CAST(round(CAST(sum(lp.nll_micro) AS DOUBLE) / count(*)) AS BIGINT) AS avg_nll_micro
             |FROM u JOIN lp USING (tok)
             |GROUP BY u.doc_id ORDER BY doc_id""".stripMargin)),

    // TF-IDF top-3 salient terms per document: integer tf × micro-nat
    // idf from exact counts; ties (score desc, token asc).
    Q("q93_tfidf_topk",
      (s, d) => {
        import s.implicits._
        LangModel.tfidfTopK(Tables.documents(s, d), "doc_id", "text", k = 3)
          .select($"id".as("doc_id"), $"rnk", $"tok", $"score_micro")
          .orderBy($"doc_id", $"rnk")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS tok
             |  FROM documents),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM u GROUP BY 1, 2),
             |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
             |idf AS (
             |  SELECT tok,
             |    CAST(round((ln(CAST(nd.n AS DOUBLE)) - ln(CAST(count(DISTINCT doc_id) AS DOUBLE))) * 1000000) AS BIGINT) AS idf_micro
             |  FROM u, nd GROUP BY tok, nd.n),
             |r AS (
             |  SELECT doc_id, tok, CAST(tf * idf_micro AS BIGINT) AS score_micro,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY tf * idf_micro DESC, tok) AS rnk
             |  FROM tf JOIN idf USING (tok))
             |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, score_micro
             |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // Column-level dataset profile (pre-training audit): null counts +
    // exact distinct cardinality per column in one agg pass (Expand),
    // unpivoted via stack — no driver loop, no per-column jobs.
    Q("q94_column_profile",
      (s, d) => {
        import s.implicits._
        CorpusOps.columnProfile(Tables.documents(s, d),
            Seq("doc_id", "text", "lang", "source", "n_chars"))
          .orderBy($"col_name")
      },
      Some(Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct FROM documents""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"))),

    // Fixed-width histogram of document length: occupied 50-char bins
    // with integer-ppm shares; the share denominator is a window over
    // the bin table (#bins rows), never the data.
    Q("q95_histogram",
      (s, d) => {
        import s.implicits._
        CorpusOps.histogram(Tables.documents(s, d), "n_chars", width = 50L)
          .orderBy($"bin_lo")
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(n_chars / 50) AS BIGINT) * 50 AS bin_lo, count(*) AS n
             |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)
             |SELECT bin_lo, n,
             |  CAST(round(CAST(n AS DOUBLE) / (SELECT CAST(sum(n) AS DOUBLE) FROM b) * 1000000) AS BIGINT) AS pct_micro
             |FROM b ORDER BY bin_lo""".stripMargin)),

    // Equal-frequency quality deciles (feature binning): deterministic
    // two-phase global rank on (quality micro, doc_id) — never ntile
    // over a non-unique key, never a global-order window over the data.
    Q("q99_quantile_buckets",
      (s, d) => {
        import s.implicits._
        val q = round(TextAnalysis.qualityScore($"text") * 1000000, 0).cast("long")
        val docs = Tables.documents(s, d).select($"doc_id", q.as("q_micro"))
        CorpusOps.quantileBuckets(docs, "doc_id", $"q_micro", k = 10)
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
            min($"v").as("min_q_micro"), max($"v").as("max_q_micro"))
          .orderBy($"bucket")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    len(toks) AS n_tokens,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) * 1.0 / len(toks) AS stop_ratio
             |  FROM t),
             |s AS (
             |  SELECT doc_id,
             |    CAST(round(round(least(greatest(least(n_tokens/50.0, 1.0)
             |      * (CASE WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 0.5 ELSE 1.0 END)
             |      * (0.7 + stop_ratio), 0.0), 1.0), 4) * 1000000) AS BIGINT) AS q
             |  FROM m),
             |r AS (
             |  SELECT doc_id, q,
             |    row_number() OVER (ORDER BY q, doc_id) AS rn,
             |    count(*) OVER () AS n
             |  FROM s)
             |SELECT ((rn - 1) * 10) // n AS bucket, count(*) AS n_docs,
             |  min(q) AS min_q_micro, max(q) AS max_q_micro
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Split-document continuation detection: doc A's last-3-token tail
    // equals doc B's first-3-token head → (A, B) is a candidate
    // rejoin (a crawler/extractor split one document into two). Pure
    // equi-join on the boundary trigram — linear, shuffle on a short
    // string key.
    Q("q100_split_continuations",
      (s, d) => {
        import s.implicits._
        val t = Tables.documents(s, d)
          .select($"doc_id", TextAnalysis.tokens($"text").as("l"))
          .filter(size($"l") >= 3)
        val a = t.select($"doc_id".as("id_a"),
          concat_ws(" ", slice($"l", -3, 3)).as("overlap"))
        val b = t.select($"doc_id".as("id_b"),
          concat_ws(" ", slice($"l", 1, 3)).as("head3"))
        a.join(b, $"overlap" === $"head3" && $"id_a" =!= $"id_b")
          .select($"id_a", $"id_b", $"overlap")
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l
             |  FROM documents),
             |hk AS (
             |  SELECT doc_id,
             |    array_to_string(l[1:3], ' ') AS head3,
             |    array_to_string(l[-3:], ' ') AS tail3
             |  FROM t WHERE len(l) >= 3)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tail3 AS overlap
             |FROM hk a JOIN hk b ON a.tail3 = b.head3 AND a.doc_id <> b.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // Token co-occurrence PMI (collocation mining): document-level
    // co-occurrence counts from per-doc distinct tokens (array_distinct
    // — no extra shuffle), PMI = ln(n_both·N / (df_a·df_b)) in
    // micro-nats from exact integer counts; top-20 with support ≥ 5
    // under a total (pmi desc, pair) order.
    Q("q101_token_pmi",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val u = docs.select($"doc_id",
          explode(array_distinct(TextAnalysis.tokens($"text"))).as("tok"))
        val nDocs = docs.count()
        val dfT = broadcast(u.groupBy($"tok").agg(count(lit(1)).as("df")))
        u.as("a").join(u.as("b"), "doc_id")
          .filter($"a.tok" < $"b.tok")
          .groupBy($"a.tok".as("tok_a"), $"b.tok".as("tok_b"))
          .agg(count(lit(1)).as("n_both"))
          .filter($"n_both" >= 5)
          .join(dfT.select($"tok".as("tok_a"), $"df".as("df_a")), "tok_a")
          .join(dfT.select($"tok".as("tok_b"), $"df".as("df_b")), "tok_b")
          .select($"tok_a", $"tok_b", $"n_both",
            round(log(($"n_both" * nDocs).cast("double") / ($"df_a" * $"df_b").cast("double")) * 1000000, 0)
              .cast("long").as("pmi_micro"))
          .orderBy($"pmi_micro".desc, $"tok_a", $"tok_b")
          .limit(20)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l
             |  FROM documents),
             |u AS (SELECT DISTINCT doc_id, unnest(l) AS tok FROM t),
             |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
             |dft AS (SELECT tok, count(*) AS df FROM u GROUP BY 1),
             |p AS (
             |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_both
             |  FROM u a JOIN u b USING (doc_id) WHERE a.tok < b.tok
             |  GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT tok_a, tok_b, n_both,
             |  CAST(round(ln(CAST(n_both * nd.n AS DOUBLE) / CAST(da.df * db.df AS DOUBLE)) * 1000000) AS BIGINT) AS pmi_micro
             |FROM p
             |JOIN dft da ON da.tok = p.tok_a
             |JOIN dft db ON db.tok = p.tok_b
             |CROSS JOIN nd
             |ORDER BY pmi_micro DESC, tok_a, tok_b LIMIT 20""".stripMargin)),

    // Session funnel conversion: gap sessions (native session_window,
    // the q63 twin), then per-session view→purchase ordering flags
    // rolled up per user. Conditional min/max inside the session agg
    // keeps it one pass over the sessionized stream.
    Q("q104_session_funnel",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(session_window($"ts", "2 hours").as("w"), $"user_id")
          .agg(
            min(when($"event_type".isin("view", "click"), unix_micros($"ts"))).as("first_view"),
            max(when($"event_type" === "purchase", unix_micros($"ts"))).as("last_purchase"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum(when($"last_purchase".isNotNull, 1L).otherwise(0L)).as("n_purchase_sessions"),
            sum(when($"first_view".isNotNull && $"last_purchase".isNotNull &&
              $"first_view" < $"last_purchase", 1L).otherwise(0L)).as("n_converted"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tsm
             |  FROM events),
             |l AS (SELECT *, lag(tsm) OVER (PARTITION BY user_id ORDER BY tsm) AS prev FROM e),
             |m AS (SELECT *, CASE WHEN prev IS NULL OR tsm - prev >= 7200000000 THEN 1 ELSE 0 END AS new_s FROM l),
             |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tsm ROWS UNBOUNDED PRECEDING) AS sn FROM m),
             |g AS (
             |  SELECT user_id, sn,
             |    min(CASE WHEN event_type IN ('view', 'click') THEN tsm END) AS first_view,
             |    max(CASE WHEN event_type = 'purchase' THEN tsm END) AS last_purchase
             |  FROM s GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions,
             |  CAST(sum(CASE WHEN last_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_sessions,
             |  CAST(sum(CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
             |                 AND first_view < last_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Two-stage int8-rerank ANN: integer-dot candidate scoring on
    // per-vector int8 codes (EXACT 64-bit arithmetic — the oracle
    // recomputes every code and dot product bit-for-bit), exact cosine
    // only on the candidate set. The memory-bandwidth scale path
    // between brute force (q49) and the bucketed indexes (q50/q64).
    Q("q106_int8_rerank_knn",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Similarity.int8RerankKnn(emb.filter($"vec_id" < 5), emb, k = 5, cands = 50)
          .orderBy($"q_id", $"rank")
      },
      Some("""WITH m AS (
             |  SELECT vec_id, embedding,
             |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
             |  FROM embeddings),
             |cd AS (
             |  SELECT vec_id, embedding,
             |    list_transform(embedding, x ->
             |      CAST(CASE WHEN maxabs = 0 THEN 0
             |           ELSE greatest(CAST(-127 AS DOUBLE), least(CAST(127 AS DOUBLE),
             |                round(CAST(x AS DOUBLE) * 127.0 / maxabs, 0))) END AS BIGINT)) AS code
             |  FROM m),
             |q AS (SELECT vec_id AS q_id, embedding AS q_emb, code AS q_code
             |      FROM cd WHERE vec_id < 5),
             |j AS (
             |  SELECT q_id, c.vec_id AS n_id, q_emb, c.embedding AS n_emb,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(q_code, (a, i) -> a * c.code[i])), (x, y) -> x + y) AS idot
             |  FROM q, cd c WHERE c.vec_id != q_id),
             |cand AS (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY idot DESC, n_id) AS crank
             |  FROM j),
             |r AS (
             |  SELECT q_id, n_id, idot,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(n_emb[i] AS DOUBLE))),
             |        (a,b) -> a + b)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(n_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b)))
             |    , 6) + 0.0 AS sim
             |  FROM cand WHERE crank <= 50)
             |SELECT q_id, rank, n_id, idot, sim FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM r)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Cross-document boilerplate removal (CCNet/RefinedWeb paragraph
    // dedup): fixed-width token segments, strip those appearing in >= 3
    // distinct documents, rejoin the survivors in order. The oracle
    // recomputes the PolyHash segment keys and the distinct-doc counts
    // end-to-end.
    Q("q107_strip_boilerplate",
      (s, d) => {
        import s.implicits._
        Dedup.stripCommonSegments(Tables.documents(s, d),
            "doc_id", "text", segTokens = 8, maxDocs = 3)
          .select($"id".as("doc_id"), $"n_segs", $"n_removed", $"clean_text")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |ix AS (
             |  SELECT doc_id, toks,
             |    unnest(generate_series(0, CAST((len(toks) + 7) // 8 AS BIGINT) - 1)) AS i
             |  FROM t),
             |s AS (
             |  SELECT doc_id, i AS seg_idx,
             |    array_to_string(toks[(i*8+1):((i+1)*8)], ' ') AS seg_text
             |  FROM ix),
             |hs AS (
             |  SELECT doc_id, seg_idx, seg_text,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(seg_text)),
             |        j -> CAST(ascii(substring(seg_text, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h
             |  FROM s),
             |byh AS (
             |  SELECT h, count(DISTINCT doc_id) AS n_docs FROM hs
             |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
             |fl AS (
             |  SELECT hs.doc_id, hs.seg_idx, hs.seg_text,
             |    byh.h IS NOT NULL AS removed
             |  FROM hs LEFT JOIN byh USING (h))
             |SELECT doc_id, count(*) AS n_segs,
             |  CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             |  coalesce(array_to_string(list_transform(
             |    list_sort(list({'seg_idx': seg_idx, 'seg_text': seg_text})
             |      FILTER (WHERE NOT removed)),
             |    x -> x.seg_text), ' '), '') AS clean_text
             |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bloom-filter ingestion screen: "has this key been seen in the
    // corpus?" — k affine-permuted PolyHash bits in an m-bit filter,
    // broadcast to the probe side. The oracle recomputes every bit
    // position, the filter's set-bit table, and the all-bits-set
    // verdict; `actual` (exact membership) rides along so false
    // positives are visible in the output.
    Q("q109_bloom_screen",
      (s, d) => {
        import s.implicits._
        val keyed = Tables.documents(s, d).withColumn("key",
          concat_ws(" ", slice(TextAnalysis.tokens($"text"), 1, 3)))
        val corpus = keyed.filter($"source" =!= "src0")
        val probe = keyed.filter($"source" === "src0")
        val screen = Sketches.bloomScreen(corpus, probe, "key", m = 4096, k = 3)
        val actual = corpus.select($"key").distinct().withColumn("actual", lit(true))
        screen.join(actual, Seq("key"), "left")
          .select($"key", $"might_contain",
            coalesce($"actual", lit(false)).as("actual"))
          .orderBy($"key")
      },
      Some("""WITH keyed AS (
             |  SELECT source,
             |    array_to_string(string_split_regex(trim(text),'\s+')[1:3], ' ') AS key
             |  FROM documents),
             |ch AS (
             |  SELECT key,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(key)),
             |        j -> CAST(ascii(substring(key, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h
             |  FROM (SELECT DISTINCT key FROM keyed WHERE source <> 'src0')),
             |ph AS (
             |  SELECT key,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(key)),
             |        j -> CAST(ascii(substring(key, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h
             |  FROM (SELECT DISTINCT key FROM keyed WHERE source = 'src0')),
             |ii AS (SELECT unnest(generate_series(0, 2)) AS i),
             |cbits AS (
             |  SELECT DISTINCT
             |    ((h * ((1103515245 * (i+1)) % 1000000007)
             |      + ((12345 * (i+1) + 7) % 1000000007)) % 1000000007) % 4096 AS bit
             |  FROM ch, ii),
             |pbits AS (
             |  SELECT DISTINCT key,
             |    ((h * ((1103515245 * (i+1)) % 1000000007)
             |      + ((12345 * (i+1) + 7) % 1000000007)) % 1000000007) % 4096 AS bit
             |  FROM ph, ii),
             |agg AS (
             |  SELECT p.key, count(*) AS n, count(c.bit) AS hits
             |  FROM pbits p LEFT JOIN cbits c ON p.bit = c.bit GROUP BY 1),
             |act AS (SELECT DISTINCT key FROM keyed WHERE source <> 'src0')
             |SELECT a.key, hits = n AS might_contain,
             |  act.key IS NOT NULL AS actual
             |FROM agg a LEFT JOIN act ON a.key = act.key
             |ORDER BY a.key""".stripMargin)),

    // Count-Min heavy hitters: exact top-20 tokens vs the d×w sketch
    // estimate (min over d affine-hashed counter cells). Every counter
    // cell is an exact integer count the oracle rebuilds; the estimate
    // >= exact invariant is additionally spec-pinned.
    Q("q110_countmin_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens($"text")).as("tok"))
        val counters = Sketches.countMinCounters(toks, "tok", d = 3, w = 512)
        val top = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
          .orderBy($"exact_n".desc, $"tok").limit(20)
        Sketches.countMinLookup(counters, top, "tok", d = 3, w = 512)
          .select($"tok", $"exact_n", $"cm_estimate")
          .orderBy($"tok")
      },
      Some("""WITH tk AS (
             |  SELECT unnest(string_split_regex(trim(text),'\s+')) AS tok FROM documents),
             |ex AS (SELECT tok, count(*) AS exact_n FROM tk GROUP BY 1),
             |top AS (SELECT tok, exact_n FROM ex ORDER BY exact_n DESC, tok LIMIT 20),
             |th AS (
             |  SELECT tok,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(tok)),
             |        j -> CAST(ascii(substring(tok, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h
             |  FROM (SELECT DISTINCT tok FROM tk)),
             |ii AS (SELECT unnest(generate_series(0, 2)) AS i),
             |cells AS (
             |  SELECT tok, i AS row,
             |    ((h * ((1103515245 * (i+1)) % 1000000007)
             |      + ((12345 * (i+1) + 7) % 1000000007)) % 1000000007) % 512 AS pos
             |  FROM th, ii),
             |counters AS (
             |  SELECT cl.row, cl.pos, count(*) AS cnt
             |  FROM tk JOIN cells cl ON tk.tok = cl.tok GROUP BY 1, 2)
             |SELECT t.tok, t.exact_n, min(cn.cnt) AS cm_estimate
             |FROM top t JOIN cells cl ON cl.tok = t.tok
             |  JOIN counters cn ON cn.row = cl.row AND cn.pos = cl.pos
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // HyperLogLog registers over the token vocabulary: bucket = g mod
    // 2^p, register = max leading-zero rank of the remaining bits,
    // where g = ((polyHash^2 mod P)·a + b) mod P (square + affine mix —
    // see hllRegisters scaladoc for why raw poly31 clusters and why the
    // square alone leaves short keys clustered). `length(bin(x))` is the
    // engine-portable bit-length (identical minimal binary strings on
    // both engines); the estimator itself is spec-checked against
    // exact countDistinct.
    Q("q111_hll_registers",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens($"text")).as("tok"))
        Sketches.hllRegisters(toks, "tok", p = 6)
          .orderBy($"bucket")
      },
      Some("""WITH tk AS (
             |  SELECT DISTINCT unnest(string_split_regex(trim(text),'\s+')) AS tok
             |  FROM documents),
             |th AS (
             |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(tok)),
             |        j -> CAST(ascii(substring(tok, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h0
             |  FROM tk),
             |mx AS (SELECT (((h0 * h0) % 1000000007) * 1103515245 + 12345) % 1000000007 AS h FROM th),
             |r AS (SELECT h % 64 AS bucket, h // 64 AS rest FROM mx)
             |SELECT bucket,
             |  max(CASE WHEN rest = 0 THEN CAST(25 AS BIGINT)
             |       ELSE 25 - length(bin(rest)) END) AS register
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Cross-source quality calibration: each document's quality mapped
    // to its within-source percentile (integer micro-units, exact rank
    // arithmetic) — raw scores from different scrapers are not
    // comparable; their percentiles are.
    Q("q112_percentile_normalize",
      (s, d) => {
        import s.implicits._
        val scored = Tables.documents(s, d)
          .select($"doc_id", $"source",
            TextAnalysis.qualityScore($"text").as("quality"))
        CorpusOps.percentileNormalize(scored, "source", "doc_id", $"quality")
          .select($"doc_id", $"source", $"rank", $"n_stratum", $"pct_micro")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, text,
             |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |m AS (
             |  SELECT doc_id, source, len(toks) AS n_tokens,
             |    (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_len,
             |    len(list_filter(toks, x -> list_contains(
             |      ['the','and','of','to','in','el','la','de','que','los','le','et','les','des','der','die','und','das','ein'], x))) * 1.0 / len(toks) AS stop_ratio
             |  FROM t),
             |q AS (
             |  SELECT doc_id, source,
             |    round(least(greatest(least(n_tokens/50.0, 1.0)
             |      * (CASE WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 0.5 ELSE 1.0 END)
             |      * (0.7 + stop_ratio), 0.0), 1.0), 4) AS quality
             |  FROM m),
             |r AS (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS BIGINT) AS rank,
             |    count(*) OVER (PARTITION BY source) AS n_stratum
             |  FROM q)
             |SELECT doc_id, source, rank, n_stratum,
             |  CASE WHEN n_stratum = 1 THEN 0
             |       ELSE ((rank - 1) * 1000000) // (n_stratum - 1) END AS pct_micro
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Semantic dedup GROUPS end-to-end: the q79 IVF-cell cosine pairs
    // fed through connected components — SemDeDup's final clustering
    // step, composed from two independently-oracled operators. The
    // oracle chains the q79 pair CTEs into q68's recursive min-label
    // CTE.
    Q("q113_semantic_dedup_groups",
      (s, d) => {
        import s.implicits._
        val embs = Tables.embeddings(s, d)
        val pairs = Similarity.semanticDupPairs(s, embs,
            threshold = 0.25, kCells = 16)
          .select($"id_a", $"id_b")
        Dedup.duplicateGroups(pairs, embs.select($"vec_id"), "vec_id")
          .select($"id".as("vec_id"), $"canonical_id", $"n_group")
          .orderBy($"canonical_id", $"vec_id")
      },
      Some("""WITH RECURSIVE v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
             |seeds AS (SELECT id AS cid, emb AS cemb FROM v ORDER BY id LIMIT 16),
             |asg0 AS (
             |  SELECT id, cid FROM (
             |    SELECT v.id, s.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(s.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(s.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        s.cid) AS rn
             |    FROM v CROSS JOIN seeds s)
             |  WHERE rn = 1),
             |dimrows AS (
             |  SELECT cid, u.pos, u.x
             |  FROM (SELECT a0.cid, unnest(list_transform(v.emb, (x,i) -> {'pos': i, 'x': x})) AS u
             |        FROM asg0 a0 JOIN v USING (id)) a),
             |dims AS (
             |  SELECT cid, pos,
             |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0 AS FLOAT) AS m
             |  FROM dimrows GROUP BY cid, pos),
             |cent AS (SELECT cid, list(m ORDER BY pos) AS cemb FROM dims GROUP BY cid),
             |lists AS (
             |  SELECT cid, id AS n_id FROM (
             |    SELECT v.id, c.cid,
             |      row_number() OVER (PARTITION BY v.id ORDER BY
             |        (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |          list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)
             |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(v.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(v.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |          * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |             list_transform(c.cemb, (u,i) -> CAST(u AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))), (p,w) -> p + w)))) DESC,
             |        c.cid) AS rn
             |    FROM v CROSS JOIN cent c)
             |  WHERE rn = 1),
             |sims AS (
             |  SELECT a.n_id AS id_a, b.n_id AS id_b, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(va.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(vb.emb[i] AS DOUBLE))), (p,w) -> p + w)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(va.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(va.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(vb.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(vb.emb[i] AS DOUBLE))), (p,w) -> p + w)))
             |    , 6) + 0.0 AS sim
             |  FROM lists a JOIN lists b ON a.cid = b.cid AND a.n_id < b.n_id
             |  JOIN v va ON va.id = a.n_id JOIN v vb ON vb.id = b.n_id),
             |pairs AS (SELECT id_a, id_b FROM sims WHERE sim >= 0.25),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT vec_id AS id, vec_id AS lbl FROM embeddings
             |  UNION
             |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(lbl) AS canonical_id FROM reach GROUP BY id),
             |sized AS (SELECT canonical_id, count(*) AS n_group FROM comp GROUP BY 1)
             |SELECT c.id AS vec_id, c.canonical_id, s.n_group
             |FROM comp c JOIN sized s USING (canonical_id)
             |WHERE s.n_group > 1
             |ORDER BY canonical_id, vec_id""".stripMargin)),

    // Integer fixed-point PageRank on the customer<->supplier trade
    // graph (3 power-iteration steps): every step is floor arithmetic
    // over 1e-12 mass units, so the distributed result is bit-identical
    // to the oracle's chained single-threaded CTEs — the reproducible
    // form of link-based source-quality weighting.
    Q("q115_pagerank",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p")).distinct()
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"))
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst")))
        LinkGraph.pageRankMicro(edges, iters = 3)
          .orderBy($"node_id")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |edges AS (
             |  SELECT c AS src, p + 1000000 AS dst FROM pairs
             |  UNION ALL SELECT p + 1000000, c FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges
             |          UNION SELECT DISTINCT dst FROM edges),
             |nn AS (SELECT count(*) AS n FROM nodes),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |r0 AS (SELECT id, 1000000000000 // (SELECT n FROM nn) AS rank FROM nodes),
             |s1 AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
             |       FROM edges e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |r1 AS (SELECT n.id,
             |         (15 * (1000000000000 // (SELECT n FROM nn))) // 100
             |           + (85 * coalesce(s1.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN s1 ON s1.id = n.id),
             |s2 AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
             |       FROM edges e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |r2 AS (SELECT n.id,
             |         (15 * (1000000000000 // (SELECT n FROM nn))) // 100
             |           + (85 * coalesce(s2.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN s2 ON s2.id = n.id),
             |s3 AS (SELECT e.dst AS id, sum(r.rank // d.deg) AS s
             |       FROM edges e JOIN r2 r ON r.id = e.src JOIN deg d ON d.src = e.src
             |       GROUP BY 1),
             |r3 AS (SELECT n.id,
             |         (15 * (1000000000000 // (SELECT n FROM nn))) // 100
             |           + (85 * coalesce(s3.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN s3 ON s3.id = n.id)
             |SELECT id AS node_id, CAST(rank AS BIGINT) AS rank_micro
             |FROM r3 ORDER BY id""".stripMargin)),

    // Per-document token-distribution entropy in micro-nats — the
    // repetitiveness/templatedness quality signal (low entropy = spam,
    // boilerplate, keyword stuffing). Micro-nat shape shared with
    // q92/q101: one transcendental per (c, n) pair, integer weighting.
    Q("q119_token_entropy",
      (s, d) => {
        import s.implicits._
        LangModel.docEntropy(Tables.documents(s, d), "doc_id", "text")
          .select($"id".as("doc_id"), $"n_tokens", $"n_types", $"entropy_micro")
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS tok
             |  FROM documents),
             |ct AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
             |wn AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM ct),
             |nl AS (
             |  SELECT doc_id, c, n,
             |    CAST(round((ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE))) * 1000000) AS BIGINT) AS nll
             |  FROM wn)
             |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens, count(*) AS n_types,
             |  CAST(round(CAST(sum(c * nll) AS DOUBLE) / max(n)) AS BIGINT) AS entropy_micro
             |FROM nl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Mean-pool chunk embeddings into group vectors (RAG doc embedding
    // from chunk embeddings) — per dimension the exact integer-micro
    // mean the IVF centroids use, emitted as (grp, pos, pooled) scalar
    // rows.
    Q("q120_meanpool_embeddings",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d).withColumn("grp", expr("vec_id div 10"))
        Similarity.meanPoolMicro(emb, "grp", "embedding")
          .orderBy($"grp", $"pos")
      },
      Some("""WITH e AS (
             |  SELECT vec_id // 10 AS grp,
             |    unnest(list_transform(embedding, (x, i) -> {'pos': i, 'x': x})) AS u
             |  FROM embeddings)
             |SELECT grp, CAST(u.pos - 1 AS BIGINT) AS pos,
             |  CAST(sum(CAST(round(CAST(u.x AS DOUBLE) * 1000000, 0) AS BIGINT))
             |    / count(*) / 1000000.0 AS FLOAT) AS pooled
             |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // MinHash estimator calibration: signature-agreement Jaccard
    // estimate vs the exact shingle Jaccard for every LSH candidate
    // pair, both in integer micro-units — the drift monitor for the
    // (bands, rows) recall curve.
    Q("q121_minhash_calibration",
      (s, d) => {
        import s.implicits._
        Dedup.minHashCalibration(Tables.documents(s, d), "doc_id", "text",
            n = 2, bands = 21, rowsPerBand = 3)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |shg AS (
             |  SELECT doc_id,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS sh
             |  FROM toks),
             |base AS (
             |  SELECT doc_id, sh,
             |    list_transform(sh, s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM shg),
             |sig AS (
             |  SELECT doc_id, sh,
             |    list_transform(generate_series(1, 63), j ->
             |      coalesce(list_min(list_transform(hs, h ->
             |        (h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743)),
             |      CAST(-1 AS BIGINT))) AS sig
             |  FROM base),
             |bandrows AS (
             |  SELECT doc_id, b, sig[CAST(b*3+1 AS INT) : CAST(b*3+3 AS INT)] AS bucket
             |  FROM sig CROSS JOIN range(0, 21) t(b)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bandrows a JOIN bandrows b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
             |sel AS (
             |  SELECT c.id_a, c.id_b,
             |    CAST(list_sum(list_transform(generate_series(1, 63), i ->
             |      CASE WHEN sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)] THEN 1 ELSE 0 END)) AS BIGINT) AS n_match,
             |    len(list_intersect(sa.sh, sb.sh)) AS inter,
             |    len(list_distinct(list_concat(sa.sh, sb.sh))) AS un
             |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
             |    JOIN sig sb ON sb.doc_id = c.id_b)
             |SELECT id_a, id_b, n_match,
             |  (n_match * 1000000) // 63 AS est_micro,
             |  (inter * 1000000) // un AS exact_micro
             |FROM sel ORDER BY 1, 2""".stripMargin)),

    // Grouped HLL: distinct-user registers per event type — the
    // approx-count-distinct-by-group workhorse at a fixed 2^p-row
    // budget per group. Register arithmetic identical to q111.
    Q("q122_hll_by_group",
      (s, d) => {
        import s.implicits._
        Sketches.hllRegistersBy(Tables.events(s, d),
            Seq("event_type"), "user_id", p = 4)
          .orderBy($"event_type", $"bucket")
      },
      Some("""WITH k AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |th AS (
             |  SELECT event_type,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(user_id AS VARCHAR))),
             |        j -> CAST(ascii(substring(CAST(user_id AS VARCHAR), j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h0
             |  FROM k),
             |mx AS (SELECT event_type,
             |         (((h0 * h0) % 1000000007) * 1103515245 + 12345) % 1000000007 AS h
             |       FROM th),
             |r AS (SELECT event_type, h % 16 AS bucket, h // 16 AS rest FROM mx)
             |SELECT event_type, bucket,
             |  max(CASE WHEN rest = 0 THEN CAST(27 AS BIGINT)
             |       ELSE 27 - length(bin(rest)) END) AS register
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
