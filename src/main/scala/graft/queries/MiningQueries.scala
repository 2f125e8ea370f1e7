package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{CorpusOps, Dedup, LangModel, LinkGraph, Similarity, TextAnalysis}
import graft.io.Versioned

/** Sixth-wave mining operators: graph structure (triangle counting),
  * kNN-graph construction over embeddings, model-based text scoring
  * (hashed linear classifier inference, bigram LM with stupid backoff),
  * and versioned-snapshot change auditing.
  *
  * Same oracle discipline as [[ExtQueries]]: every probabilistic or
  * transcendental ingredient is either exact integer arithmetic or a
  * single shared-shape double computed from exact integers, so DuckDB
  * recomputes each query end-to-end.
  */
object MiningQueries extends QueryPack {

  /** DuckDB recompute of [[graft.functions.PolyHash]] (see its scaladoc). */
  private def polyHashSql(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(1, length($c)), j ->
       |    CAST(ascii(substring($c, j, 1)) AS BIGINT))),
       |  (a, b) -> (a*31 + b) % 1000000007)""".stripMargin

  /** DuckDB recompute of the shared double-dot/cosine shapes (see
    * [[graft.ext.Similarity.cosineNative]] / [[graft.core.Exact.r6]]).
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform($a, (u,i) -> CAST(u AS DOUBLE) * CAST($b[i] AS DOUBLE))), (p,w) -> p + w)""".stripMargin
  private def cosRawSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
  private def cosR6Sql(a: String, b: String): String =
    s"(round(${cosRawSql(a, b)}, 6) + 0.0)"

  /** The q64 IVF CTE chain (seed -> exact-integer Lloyd -> inverted
    * lists -> probe -> exact rerank), parameterized by the query-row
    * predicate and k — shared by q237 (fusion input) and q238 (the
    * persisted-index search must answer exactly what a fresh build
    * answers, which is exactly this chain). Emits CTEs `v` .. `ivfr`;
    * `ivfr` = (q_id, n_id, sim, rank <= k).
    */
  private def ivfSql(queryPred: String, k: Int): String =
    s"""v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
       |seeds AS (SELECT id AS cid, emb AS cemb FROM v ORDER BY id LIMIT 16),
       |asg0 AS (
       |  SELECT id, cid FROM (
       |    SELECT v.id, s.cid,
       |      row_number() OVER (PARTITION BY v.id ORDER BY
       |        ${cosRawSql("v.emb", "s.cemb")} DESC, s.cid) AS rn
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
       |        ${cosRawSql("v.emb", "c.cemb")} DESC, c.cid) AS rn
       |    FROM v CROSS JOIN cent c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT v.id AS q_id, c.cid,
       |      row_number() OVER (PARTITION BY v.id ORDER BY
       |        ${cosRawSql("v.emb", "c.cemb")} DESC, c.cid) AS pr
       |    FROM v CROSS JOIN cent c WHERE $queryPred)
       |  WHERE pr <= 4),
       |icand AS (
       |  SELECT DISTINCT p.q_id, l.n_id
       |  FROM probes p JOIN lists l USING (cid)
       |  WHERE p.q_id != l.n_id),
       |isims AS (
       |  SELECT q_id, n_id, ${cosR6Sql("qe.emb", "ne.emb")} AS sim
       |  FROM icand JOIN v qe ON qe.id = q_id JOIN v ne ON ne.id = n_id),
       |ivfr AS (
       |  SELECT q_id, n_id, sim, rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM isims)
       |  WHERE rank <= $k)""".stripMargin

  val all: Seq[Q] = Seq(
    // Per-node triangle counts on the co-purchase part graph (edges =
    // part pairs sharing >= 2 orders — the support threshold keeps the
    // graph sparse at any scale). Degree-ordered orientation bounds the
    // wedge set at O(m^1.5); exact integer counting both engines.
    Q("q128_triangle_counts",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        val und = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"id_a", $"id_b")
        LinkGraph.triangleCounts(und).orderBy($"node_id")
      },
      Some("""WITH und AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |deg AS (
             |  SELECT id, count(*) AS deg FROM (
             |    SELECT pa AS id FROM und UNION ALL SELECT pb FROM und)
             |  GROUP BY 1),
             |o AS (
             |  SELECT CASE WHEN da.deg <= db.deg THEN und.pa ELSE und.pb END AS src,
             |         CASE WHEN da.deg <= db.deg THEN und.pb ELSE und.pa END AS dst
             |  FROM und JOIN deg da ON da.id = und.pa JOIN deg db ON db.id = und.pb),
             |tri AS (
             |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
             |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
             |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
             |SELECT id AS node_id, count(*) AS n_triangles FROM (
             |  SELECT u AS id FROM tri UNION ALL SELECT v FROM tri
             |  UNION ALL SELECT w FROM tri)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // kNN graph over the embeddings: every vector's top-3 in-cell
    // neighbors under the deterministic IVF quantizer — rank ordered on
    // the rounded similarity, ties to the lower neighbor id.
    Q("q129_knn_graph",
      (s, d) => {
        import s.implicits._
        Similarity.knnGraph(s, Tables.embeddings(s, d), k = 3, kCells = 16)
          .orderBy($"vec_id", $"rank")
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
             |  SELECT a.n_id AS vec_id, b.n_id AS nb, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(va.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(vb.emb[i] AS DOUBLE))), (p,w) -> p + w)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(va.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(va.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(vb.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(vb.emb[i] AS DOUBLE))), (p,w) -> p + w)))
             |    , 6) + 0.0 AS sim
             |  FROM lists a JOIN lists b ON a.cid = b.cid AND a.n_id <> b.n_id
             |  JOIN v va ON va.id = a.n_id JOIN v vb ON vb.id = b.n_id),
             |rk AS (
             |  SELECT vec_id, nb, sim,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nb) AS rank
             |  FROM sims)
             |SELECT vec_id, CAST(rank AS BIGINT) AS rank, nb AS n_id, sim
             |FROM rk WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin)),

    // Hashed linear classifier inference (fastText-style): PolyHash
    // token features into 256 buckets, broadcast (bucket, w_micro)
    // model, exact integer mean feature weight, sigmoid from the exact
    // integer score.
    Q("q130_hashed_classifier",
      (s, d) => {
        import s.implicits._
        LangModel.hashedLinearScoreMicro(Tables.documents(s, d),
            LangModel.syntheticWeights(s, nBuckets = 256),
            "doc_id", "text", nBuckets = 256)
          .select($"id".as("doc_id"), $"n_tokens", $"score_micro", $"prob_micro")
          .orderBy($"doc_id")
      },
      Some(s"""WITH u AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    (${polyHashSql("tok")}) % 256 AS bucket,
             |    count(*) AS cnt
             |  FROM u GROUP BY 1, 2),
             |w AS (
             |  SELECT g AS bucket,
             |    ((1103515245 * g + 12345) % 1000000007) % 2000001 - 1000000 AS w_micro
             |  FROM generate_series(0, 255) t(g)),
             |sc AS (
             |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |    CAST(round(CAST(sum(cnt * w_micro) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 0) AS BIGINT) AS score_micro
             |  FROM f JOIN w USING (bucket) GROUP BY 1)
             |SELECT doc_id, n_tokens, score_micro,
             |  CAST(round(1000000.0 / (1.0 + exp(-(CAST(score_micro AS DOUBLE) / 1000000.0))), 0) AS BIGINT) AS prob_micro
             |FROM sc ORDER BY doc_id""".stripMargin)),

    // Bigram LM with stupid backoff: trained on the English slice,
    // scoring every document — unseen bigrams back off to the
    // discounted unigram (5N/2c integer ln args). Micro-nat NLL per
    // pair type, integer doc totals.
    Q("q131_bigram_backoff",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        LangModel.bigramBackoffNll(docs.filter($"lang" === "en"), docs, "doc_id", "text")
          .select($"id".as("doc_id"), $"n_pairs", $"sum_nll_micro", $"avg_nll_micro")
          .orderBy($"doc_id")
      },
      Some("""WITH dd AS (
             |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |trt AS (
             |  SELECT unnest(t) AS tok FROM dd WHERE lang = 'en'),
             |cu AS (SELECT tok, count(*) AS c FROM trt GROUP BY 1),
             |nn AS (SELECT count(*) AS n FROM trt),
             |cb AS (
             |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cbn FROM (
             |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
             |      j -> {'w1': t[j], 'w2': t[j+1]})) AS p
             |    FROM dd WHERE lang = 'en' AND len(t) >= 2)
             |  GROUP BY 1, 2),
             |dp AS (
             |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS cnt FROM (
             |    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
             |      j -> {'w1': t[j], 'w2': t[j+1]})) AS p
             |    FROM dd WHERE len(t) >= 2)
             |  GROUP BY 1, 2, 3),
             |pt AS (
             |  SELECT d.w1, d.w2,
             |    CASE WHEN cb.cbn IS NOT NULL THEN
             |      CAST(round((ln(CAST(c1.c AS DOUBLE)) - ln(CAST(cb.cbn AS DOUBLE))) * 1000000) AS BIGINT)
             |    ELSE
             |      CAST(round((ln(CAST(5 * (SELECT n FROM nn) AS DOUBLE))
             |        - ln(CAST(2 * coalesce(c2.c, 1) AS DOUBLE))) * 1000000) AS BIGINT)
             |    END AS nll_micro
             |  FROM (SELECT DISTINCT w1, w2 FROM dp) d
             |  LEFT JOIN cb ON cb.w1 = d.w1 AND cb.w2 = d.w2
             |  LEFT JOIN cu c1 ON c1.tok = d.w1
             |  LEFT JOIN cu c2 ON c2.tok = d.w2)
             |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_pairs,
             |  CAST(sum(cnt * nll_micro) AS BIGINT) AS sum_nll_micro,
             |  CAST(round(CAST(sum(cnt * nll_micro) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 0) AS BIGINT) AS avg_nll_micro
             |FROM dp JOIN pt ON pt.w1 = dp.w1 AND pt.w2 = dp.w2
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Versioned-snapshot change audit: full-outer key join + null-safe
    // column compares; output is O(churn). v1 drops %7 keys and bumps
    // %5 prices, v2 drops %11 keys — all three change classes appear.
    Q("q132_snapshot_diff",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val v1 = o.filter($"o_orderkey" % 7 =!= 0)
          .withColumn("o_totalprice",
            when($"o_orderkey" % 5 === 0, $"o_totalprice" + 1.0)
              .otherwise($"o_totalprice"))
        val v2 = o.filter($"o_orderkey" % 11 =!= 0)
        Versioned.snapshotDiff(v1, v2, Seq("o_orderkey"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH v1 AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus,
             |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
             |         ELSE o_totalprice END AS o_totalprice,
             |    o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 7 <> 0),
             |v2 AS (SELECT * FROM orders WHERE o_orderkey % 11 <> 0),
             |j AS (
             |  SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
             |    CASE WHEN v1.o_orderkey IS NULL THEN 'added'
             |         WHEN v2.o_orderkey IS NULL THEN 'removed'
             |         WHEN v1.o_custkey IS DISTINCT FROM v2.o_custkey
             |           OR v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
             |           OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
             |           OR v1.o_orderdate IS DISTINCT FROM v2.o_orderdate
             |           OR v1.o_orderpriority IS DISTINCT FROM v2.o_orderpriority
             |         THEN 'changed' END AS change
             |  FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
             |SELECT o_orderkey, change FROM j WHERE change IS NOT NULL
             |ORDER BY o_orderkey""".stripMargin)),

    // Blocked record linkage: corrupt one mid-string character of every
    // supplier name, then re-link dirty -> clean on a last-4-chars
    // blocking key + Jaro-Winkler >= 0.9 verify — candidates only ever
    // pay within-block cost, never the cross join.
    Q("q133_fuzzy_link",
      (s, d) => {
        import s.implicits._
        val sup = Tables.supplier(s, d)
        val dirty = sup.select(concat(substring($"s_name", 1, 11), lit("X"),
          substring($"s_name", 13, 6)).as("name"))
        graft.ops.FuzzyLink.blockedJaroWinkler(dirty, sup, "name", "s_name",
            c => c.substr(length(c) - 3, lit(4)), threshold = 0.9)
          .orderBy($"left_key", $"right_key")
      },
      Some("""WITH dirty AS (
             |  SELECT substring(s_name, 1, 11) || 'X' || substring(s_name, 13, 6) AS name
             |  FROM supplier),
             |l AS (SELECT DISTINCT name AS left_key FROM dirty),
             |r AS (SELECT DISTINCT s_name AS right_key FROM supplier),
             |lb AS (SELECT left_key, substring(left_key, length(left_key) - 3, 4) AS blk FROM l),
             |rb AS (SELECT right_key, substring(right_key, length(right_key) - 3, 4) AS blk FROM r),
             |cand AS (
             |  SELECT left_key, right_key,
             |    round(jaro_winkler_similarity(left_key, right_key), 6) + 0.0 AS jw
             |  FROM lb JOIN rb USING (blk))
             |SELECT left_key, right_key, jw FROM cand WHERE jw >= 0.9
             |ORDER BY 1, 2""".stripMargin)),

    // Time-series gap repair: mask every 10th reading deterministically,
    // then fill by exact-integer linear interpolation between the
    // nearest observed neighbors (LOCF/NOCB at the edges). One window
    // exchange; integer cents x integer micros stay in 64 bits.
    Q("q134_interpolate_gaps",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_id", $"user_id",
          unix_micros($"ts").as("t"),
          when((($"ts".cast("long") + $"user_id") % 10) === 0, lit(null))
            .otherwise(round($"value" * 100, 0).cast("long")).as("v_cents"))
        graft.ops.TimeSeries.fillInterpolate(ev, Seq("user_id"), "t", "v_cents")
          .select($"event_id", $"fill_method", $"filled")
          .orderBy($"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             |    CASE WHEN (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + user_id) % 10 = 0
             |         THEN NULL
             |         ELSE CAST(round(value * 100, 0) AS BIGINT) END AS v_cents
             |  FROM events),
             |st AS (
             |  SELECT event_id, t, v_cents,
             |    last_value(v_cents IGNORE NULLS) OVER
             |      (PARTITION BY user_id ORDER BY t
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             |    last_value(CASE WHEN v_cents IS NOT NULL THEN t END IGNORE NULLS) OVER
             |      (PARTITION BY user_id ORDER BY t
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             |    first_value(v_cents IGNORE NULLS) OVER
             |      (PARTITION BY user_id ORDER BY t
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             |    first_value(CASE WHEN v_cents IS NOT NULL THEN t END IGNORE NULLS) OVER
             |      (PARTITION BY user_id ORDER BY t
             |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
             |  FROM ev)
             |SELECT event_id,
             |  CASE WHEN v_cents IS NOT NULL THEN 'observed'
             |       WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt THEN 'interp'
             |       WHEN pv IS NOT NULL THEN 'locf'
             |       WHEN nv IS NOT NULL THEN 'nocb'
             |       ELSE 'none' END AS fill_method,
             |  CASE WHEN v_cents IS NOT NULL THEN v_cents
             |       WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
             |         THEN (pv * (nt - t) + nv * (t - pt)) // (nt - pt)
             |       WHEN pv IS NOT NULL THEN pv
             |       WHEN nv IS NOT NULL THEN nv END AS filled
             |FROM st ORDER BY event_id""".stripMargin)),

    // Corpus duplication diagnostic: hash-bucket pair sampling (n²/2B
    // pairs instead of n²/2) -> exact cosine -> fixed-width micro-unit
    // histogram. The mixed PolyHash bucket is the q122 recipe.
    Q("q135_pair_sim_histogram",
      (s, d) => {
        import s.implicits._
        Similarity.pairSampleSimHistogram(Tables.embeddings(s, d),
            "vec_id", "embedding", nBuckets = 32)
          .orderBy($"bin")
      },
      Some("""WITH h AS (
             |  SELECT vec_id AS id, embedding AS emb,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(vec_id AS VARCHAR))),
             |        j -> CAST(ascii(substring(CAST(vec_id AS VARCHAR), j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h0
             |  FROM embeddings),
             |v AS (
             |  SELECT id, emb,
             |    ((((h0 * h0) % 1000000007) * 1103515245 + 12345) % 1000000007) % 32 AS bkt
             |  FROM h),
             |sims AS (
             |  SELECT CAST(round((round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(a.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(b.emb[i] AS DOUBLE))), (p,w) -> p + w)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(a.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(a.emb[i] AS DOUBLE))), (p,w) -> p + w))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(b.emb, (u,i) -> CAST(u AS DOUBLE) * CAST(b.emb[i] AS DOUBLE))), (p,w) -> p + w)))
             |    , 6) + 0.0) * 1000000) AS BIGINT) AS sim_micro
             |  FROM v a JOIN v b ON a.bkt = b.bkt AND a.id < b.id)
             |SELECT (sim_micro + 1000000) // 100000 AS bin, count(*) AS n_pairs
             |FROM sims GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Distribution drift (PSI) between two event slices, per value
    // bucket: integer-clamped counts keep the log arguments exact;
    // per-bucket micro contributions sum order-independently.
    Q("q136_psi_drift",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        graft.ops.Drift.psiContributions(
            ev.filter($"event_type" === "view"),
            ev.filter($"event_type" === "error"),
            "value", width = 50L)
          .orderBy($"bin_lo")
      },
      Some("""WITH r AS (
             |  SELECT CAST(floor(value / 50) AS BIGINT) * 50 AS bin_lo, count(*) AS n_ref
             |  FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1),
             |c AS (
             |  SELECT CAST(floor(value / 50) AS BIGINT) * 50 AS bin_lo, count(*) AS n_cur
             |  FROM events WHERE event_type = 'error' AND value IS NOT NULL GROUP BY 1),
             |j AS (
             |  SELECT coalesce(r.bin_lo, c.bin_lo) AS bin_lo,
             |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
             |  FROM r FULL JOIN c ON r.bin_lo = c.bin_lo),
             |t AS (
             |  SELECT bin_lo, n_ref, n_cur,
             |    CAST((SELECT sum(n_ref) FROM j) AS BIGINT) AS t_ref,
             |    CAST((SELECT sum(n_cur) FROM j) AS BIGINT) AS t_cur,
             |    greatest(n_ref, 1) AS c1, greatest(n_cur, 1) AS c2
             |  FROM j)
             |SELECT bin_lo, n_ref, n_cur,
             |  CAST(round((CAST(c1 AS DOUBLE) / t_ref - CAST(c2 AS DOUBLE) / t_cur)
             |    * (ln(CAST(c1 * t_cur AS DOUBLE)) - ln(CAST(c2 * t_ref AS DOUBLE))) * 1000000) AS BIGINT) AS contrib_micro
             |FROM t ORDER BY bin_lo""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis-Spirakis):
    // 5 docs per language, inclusion probability scaling with n_chars.
    // Key = (ln P - ln(h+1)) / w in micro-units from integer ln args.
    Q("q137_weighted_sample",
      (s, d) => {
        import s.implicits._
        graft.ext.CorpusOps.weightedSample(Tables.documents(s, d),
            "lang", "doc_id", $"n_chars", k = 5)
          .select($"lang", $"doc_id", $"key_micro", $"draw_rank")
          .orderBy($"lang", $"draw_rank")
      },
      Some("""WITH h AS (
             |  SELECT lang, doc_id, n_chars,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        j -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h0
             |  FROM documents),
             |k AS (
             |  SELECT lang, doc_id,
             |    CAST(round((ln(CAST(1000000007 AS DOUBLE))
             |      - ln(CAST(((((h0 * h0) % 1000000007) * 1103515245 + 12345) % 1000000007) + 1 AS DOUBLE)))
             |      / n_chars * 1000000) AS BIGINT) AS key_micro
             |  FROM h),
             |r AS (
             |  SELECT lang, doc_id, key_micro,
             |    row_number() OVER (PARTITION BY lang ORDER BY key_micro, doc_id) AS draw_rank
             |  FROM k)
             |SELECT lang, doc_id, key_micro, CAST(draw_rank AS BIGINT) AS draw_rank
             |FROM r WHERE draw_rank <= 5 ORDER BY lang, draw_rank""".stripMargin)),

    // Patch round-trip: applyPatch(v1, snapshotPatch(v1, v2)) must
    // reproduce v2 row-for-row — the oracle IS v2, recomputed directly.
    Q("q138_patch_roundtrip",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
        val v1 = o.filter($"o_orderkey" % 7 =!= 0)
          .withColumn("o_totalprice",
            when($"o_orderkey" % 5 === 0, $"o_totalprice" + 1.0)
              .otherwise($"o_totalprice"))
        val v2 = o.filter($"o_orderkey" % 11 =!= 0)
        val patch = Versioned.snapshotPatch(v1, v2, Seq("o_orderkey"))
        Versioned.applyPatch(v1, patch, Seq("o_orderkey"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey % 11 <> 0
             |ORDER BY o_orderkey""".stripMargin)),

    // Event debounce: keep only burst heads per (user, type) — an event
    // more than 2h (event time) after its predecessor; rows inside a
    // burst chain onto the head even across dropped predecessors.
    Q("q139_debounce",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("t"))
        graft.ops.TimeSeries.debounce(ev, Seq("user_id", "event_type"), "t",
            gap = 7200L * 1000000L)
          .select($"event_id", $"user_id", $"event_type")
          .orderBy($"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
             |  FROM events),
             |l AS (
             |  SELECT event_id, user_id, event_type, t,
             |    lag(t) OVER (PARTITION BY user_id, event_type ORDER BY t) AS prev
             |  FROM ev)
             |SELECT event_id, user_id, event_type FROM l
             |WHERE prev IS NULL OR t - prev > 7200000000
             |ORDER BY event_id""".stripMargin)),

    // ANN acceptance gate: per-query recall@5 of the hyperplane-LSH
    // index against exact brute force, 25 query vectors. The oracle
    // recomputes BOTH retrievals (the q49 and q50 pipelines) and the
    // semi-join overlap.
    Q("q140_ann_recall",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 25)
        val exact = Similarity.bruteForceKnn(queries, emb, k = 5)
        val ann = Similarity.lshKnn(queries, emb, dim = 64, k = 5,
          nBits = 6, tables = 4)
        Similarity.recallAtK(exact, ann)
          .orderBy($"q_id")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 25),
             |e AS (SELECT vec_id, embedding FROM embeddings),
             |xj AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))), (p,v) -> p + v))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM q JOIN e ON e.vec_id <> q_id),
             |exact AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM xj)
             |  WHERE rank <= 5),
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
             |  WHERE qb.vec_id < 25),
             |asims AS (
             |  SELECT q_id, n_id, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE))), (p,v) -> p + v))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ne.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ne ON ne.vec_id = n_id),
             |ann AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM asims)
             |  WHERE rank <= 5),
             |hit AS (
             |  SELECT exact.q_id, count(*) AS n_hit
             |  FROM exact JOIN ann ON exact.q_id = ann.q_id AND exact.n_id = ann.n_id
             |  GROUP BY 1),
             |ex AS (SELECT q_id, count(*) AS n_exact FROM exact GROUP BY 1)
             |SELECT ex.q_id, n_exact, coalesce(n_hit, 0) AS n_hit,
             |  coalesce(n_hit, 0) * 1000000 // n_exact AS recall_micro
             |FROM ex LEFT JOIN hit ON hit.q_id = ex.q_id
             |ORDER BY ex.q_id""".stripMargin)),

    // CSV source/sink round-trip: pipe-delimited, gzip, header, explicit
    // read schema (never inferSchema on a 100 TB lake — one schema pass
    // would rescan everything). Oracle = the original rows.
    Q("q141_csv_roundtrip",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        val dir = graft.core.Scratch.dir("q141_csvrt")
        o.write.mode("overwrite")
          .option("header", "true").option("delimiter", "|")
          .option("compression", "gzip")
          .csv(s"$dir/orders_csv")
        s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
          .option("header", "true").option("delimiter", "|")
          .csv(s"$dir/orders_csv")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Community detection: 2 synchronous label-propagation rounds on
    // the support-2 co-purchase graph — most-frequent neighbor label,
    // ties to the smallest; fixed rounds + deterministic tie-break is
    // the replayable LPA.
    Q("q142_label_propagation",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        val und = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"id_a", $"id_b")
        LinkGraph.labelPropagation(und, rounds = 2).orderBy($"node_id")
      },
      Some("""WITH und AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |edges AS (
             |  SELECT pa AS src, pb AS dst FROM und
             |  UNION SELECT pb, pa FROM und),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |f1 AS (
             |  SELECT e.dst AS id, l.id AS nl, count(*) AS c
             |  FROM edges e JOIN nodes l ON l.id = e.src GROUP BY 1, 2),
             |a1 AS (
             |  SELECT id, nl AS label FROM (
             |    SELECT id, nl, row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
             |    FROM f1) WHERE rn = 1),
             |l1 AS (
             |  SELECT n.id, coalesce(a1.label, n.id) AS label
             |  FROM nodes n LEFT JOIN a1 ON a1.id = n.id),
             |f2 AS (
             |  SELECT e.dst AS id, l.label AS nl, count(*) AS c
             |  FROM edges e JOIN l1 l ON l.id = e.src GROUP BY 1, 2),
             |a2 AS (
             |  SELECT id, nl AS label FROM (
             |    SELECT id, nl, row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
             |    FROM f2) WHERE rn = 1),
             |l2 AS (
             |  SELECT n.id, coalesce(a2.label, n.id) AS label
             |  FROM nodes n LEFT JOIN a2 ON a2.id = n.id)
             |SELECT id AS node_id, label FROM l2 ORDER BY 1""".stripMargin)),

    // Content-addressable blob manifest: exact media dedup by md5
    // digest over the binary payload — one hash-groupBy, canonical copy
    // = smallest id.
    Q("q143_blob_manifest",
      (s, d) => {
        import s.implicits._
        graft.ext.Multimodal.blobManifest(
            graft.ext.Multimodal.mediaFromDocuments(Tables.documents(s, d)))
          .orderBy($"digest")
      },
      Some("""SELECT md5(text) AS digest, count(*) AS n_copies,
             |  min(doc_id) AS canonical_id,
             |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-source token budgets (the per-domain crawl cap): longest docs
    // first, admit while the source's cumulative tokens stay within
    // 700. Plain partitioned-window cumsum — strata admit in parallel.
    Q("q144_stratum_budget",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .withColumn("n_toks", graft.ext.TextAnalysis.tokenCount($"text"))
        graft.ext.CorpusOps.stratumBudgetSelect(docs, "source", "doc_id",
            $"n_toks", struct((-$"n_chars").as("neg"), $"doc_id"), budget = 700L)
          .select($"stratum".as("source"), $"id".as("doc_id"),
            $"n_tokens", $"cum_tokens")
          .orderBy($"source", $"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT source, doc_id, n_chars,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT source, doc_id, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY source ORDER BY -n_chars, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
             |  FROM t)
             |SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
             |FROM c WHERE cum_tokens <= 700 ORDER BY source, doc_id""".stripMargin)),

    // Exact two-sample Kolmogorov-Smirnov drift between event slices:
    // max CDF gap as the integer cross-product — no per-step division,
    // argmax exact; the window runs over the distinct-value table.
    Q("q145_ks_drift",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        graft.ops.Drift.ksStatistic(
          ev.filter($"event_type" === "view"),
          ev.filter($"event_type" === "click"), "value")
      },
      Some("""WITH r AS (
             |  SELECT value AS v, count(*) AS c1 FROM events
             |  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1),
             |c AS (
             |  SELECT value AS v, count(*) AS c2 FROM events
             |  WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1),
             |j AS (
             |  SELECT coalesce(r.v, c.v) AS v,
             |    coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
             |  FROM r FULL JOIN c ON r.v = c.v),
             |w AS (
             |  SELECT
             |    sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             |    sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             |    sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
             |  FROM j)
             |SELECT CAST(max(n1) AS BIGINT) AS n_ref, CAST(max(n2) AS BIGINT) AS n_cur,
             |  CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
             |  CAST(round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             |    / (CAST(max(n1) AS BIGINT) * CAST(max(n2) AS BIGINT)) * 1000000, 0) AS BIGINT) AS d_micro
             |FROM w""".stripMargin)),

    // Directed n-gram containment (excerpt/subset detection): the
    // quote-inside-a-long-doc case Jaccard scores near zero. One
    // intersection per unordered candidate pair, two directed rows.
    Q("q146_containment_pairs",
      (s, d) => {
        import s.implicits._
        Dedup.ngramContainmentPairs(Tables.documents(s, d), "doc_id", "text",
            n = 2, threshold = 0.6, blockCols = Seq("lang"))
          .select($"contained_id", $"container_id",
            graft.core.Exact.r4($"containment").as("containment"))
          .orderBy($"contained_id", $"container_id")
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
             |  GROUP BY 1, 2),
             |dir AS (
             |  SELECT id_a AS contained_id, id_b AS container_id,
             |    i * 1.0 / x.sz AS c
             |  FROM inter JOIN szs x ON x.doc_id = id_a
             |  UNION ALL
             |  SELECT id_b, id_a, i * 1.0 / y.sz
             |  FROM inter JOIN szs y ON y.doc_id = id_b)
             |SELECT contained_id, container_id, round(c, 4) + 0.0 AS containment
             |FROM dir WHERE c >= 0.6
             |ORDER BY contained_id, container_id""".stripMargin)),

    // Multi-probe LSH recall: each query also probes Hamming-1 buckets
    // (7 probes per table at nBits=6) — the recall lever that costs
    // query-side candidates instead of corpus-side index space. Same
    // report shape as q140; MiningSpec asserts it dominates q140's.
    Q("q147_multiprobe_recall",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 25)
        val exact = Similarity.bruteForceKnn(queries, emb, k = 5)
        val ann = Similarity.lshKnnMultiProbe(queries, emb, dim = 64, k = 5,
          nBits = 6, tables = 4)
        Similarity.recallAtK(exact, ann)
          .orderBy($"q_id")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 25),
             |e AS (SELECT vec_id, embedding FROM embeddings),
             |xj AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))), (p,v) -> p + v))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM q JOIN e ON e.vec_id <> q_id),
             |exact AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM xj)
             |  WHERE rank <= 5),
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
             |probes AS (
             |  SELECT qb.vec_id, qb.t, xor(qb.bucket, f.flip) AS bucket
             |  FROM buckets qb CROSS JOIN (
             |    SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip) f
             |  WHERE qb.vec_id < 25),
             |cand AS (
             |  SELECT DISTINCT p.vec_id AS q_id, cb.vec_id AS n_id
             |  FROM probes p JOIN buckets cb ON p.t = cb.t AND p.bucket = cb.bucket AND p.vec_id != cb.vec_id),
             |asims AS (
             |  SELECT q_id, n_id, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE))), (p,v) -> p + v))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ne.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ne ON ne.vec_id = n_id),
             |ann AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM asims)
             |  WHERE rank <= 5),
             |hit AS (
             |  SELECT exact.q_id, count(*) AS n_hit
             |  FROM exact JOIN ann ON exact.q_id = ann.q_id AND exact.n_id = ann.n_id
             |  GROUP BY 1),
             |ex AS (SELECT q_id, count(*) AS n_exact FROM exact GROUP BY 1)
             |SELECT ex.q_id, n_exact, coalesce(n_hit, 0) AS n_hit,
             |  coalesce(n_hit, 0) * 1000000 // n_exact AS recall_micro
             |FROM ex LEFT JOIN hit ON hit.q_id = ex.q_id
             |ORDER BY ex.q_id""".stripMargin)),

    // Time-series subsequence search: top-10 length-8 windows of the
    // per-user 'view' value series closest (exact integer squared
    // Euclidean, cents) to the earliest user's first window — the
    // self-match anchors rank 1 at distance 0.
    Q("q148_subsequence_search",
      (s, d) => {
        import s.implicits._
        val v = Tables.events(s, d).filter($"event_type" === "view")
          .select($"user_id", $"event_id", unix_micros($"ts").as("t"),
            round($"value" * 100, 0).cast("long").as("c"))
        val frame = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"t").rowsBetween(0, 7)
        val wins = v.withColumn("win", collect_list($"c").over(frame))
          .filter(size($"win") === 8)
        val pattern = wins.orderBy($"user_id", $"t").limit(1)
          .select($"win".as("pw"))
        graft.ops.TimeSeries.subsequenceTopK(v, Seq("user_id"), "t",
            "event_id", "c", pattern, w = 8, k = 10)
          .orderBy($"dist_c2", $"event_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             |    CAST(round(value * 100, 0) AS BIGINT) AS c
             |  FROM events WHERE event_type = 'view'),
             |w AS (
             |  SELECT user_id, event_id, t,
             |    list(c) OVER (PARTITION BY user_id ORDER BY t
             |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
             |  FROM v),
             |f AS (SELECT * FROM w WHERE len(win) = 8),
             |p AS (SELECT win AS pw FROM f ORDER BY user_id, t LIMIT 1),
             |d AS (
             |  SELECT f.user_id, f.event_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(f.win, (x, i) -> (x - p.pw[i]) * (x - p.pw[i]))),
             |      (a, b) -> a + b) AS dist_c2
             |  FROM f CROSS JOIN p)
             |SELECT user_id, event_id, dist_c2 FROM d
             |ORDER BY dist_c2, event_id LIMIT 10""".stripMargin)),

    // Z-normalized (shape-matching) subsequence search: d² = 2w(1−corr)
    // from five exact integer sufficient statistics — the UCR-style
    // scale-invariant twin of q148 on the same windows.
    Q("q149_zn_subsequence_search",
      (s, d) => {
        import s.implicits._
        val v = Tables.events(s, d).filter($"event_type" === "view")
          .select($"user_id", $"event_id", unix_micros($"ts").as("t"),
            round($"value" * 100, 0).cast("long").as("c"))
        val frame = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"t").rowsBetween(0, 7)
        val wins = v.withColumn("win", collect_list($"c").over(frame))
          .filter(size($"win") === 8)
        val pattern = wins.orderBy($"user_id", $"t").limit(1)
          .select($"win".as("pw"))
        graft.ops.TimeSeries.znSubsequenceTopK(v, Seq("user_id"), "t",
            "event_id", "c", pattern, w = 8, k = 10)
          .orderBy($"znd2_micro", $"event_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             |    CAST(round(value * 100, 0) AS BIGINT) AS c
             |  FROM events WHERE event_type = 'view'),
             |w AS (
             |  SELECT user_id, event_id, t,
             |    list(c) OVER (PARTITION BY user_id ORDER BY t
             |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
             |  FROM v),
             |f AS (
             |  SELECT user_id, event_id, t, win,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), win), (a, b) -> a + b) AS sa,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(win, x -> x * x)), (a, b) -> a + b) AS saa
             |  FROM w WHERE len(win) = 8),
             |fv AS (SELECT * FROM f WHERE 8 * saa - sa * sa > 0),
             |p AS (SELECT win AS pw, sa AS sb, saa AS sbb FROM f
             |      ORDER BY user_id, t LIMIT 1),
             |d AS (
             |  SELECT fv.user_id, fv.event_id,
             |    CAST(round(2.0 * 8 * (1.0 -
             |      CAST(8 * list_reduce(list_prepend(CAST(0 AS BIGINT),
             |          list_transform(fv.win, (x, i) -> x * p.pw[i])), (a, b) -> a + b)
             |        - fv.sa * p.sb AS DOUBLE)
             |      / sqrt(CAST(8 * fv.saa - fv.sa * fv.sa AS DOUBLE)
             |        * CAST(8 * p.sbb - p.sb * p.sb AS DOUBLE))) * 1000000, 0) AS BIGINT) AS znd2_micro
             |  FROM fv CROSS JOIN p)
             |SELECT user_id, event_id, znd2_micro FROM d
             |ORDER BY znd2_micro, event_id LIMIT 10""".stripMargin)),

    // Corpus datasheet: the per-language summary a dataset card ships —
    // docs, exact token totals, distinct-content count (md5), mean
    // chars in micro-units. One pass, all integer-exact.
    Q("q150_corpus_datasheet",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(graft.ext.TextAnalysis.tokenCount($"text")).as("n_tokens"),
            countDistinct(md5($"text")).as("n_unique"),
            round(sum($"n_chars").cast("double") / count(lit(1)) * 1000000, 0)
              .cast("long").as("mean_chars_micro"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
             |  count(DISTINCT md5(text)) AS n_unique,
             |  CAST(round(CAST(sum(n_chars) AS DOUBLE) / count(*) * 1000000, 0) AS BIGINT) AS mean_chars_micro
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hybrid retrieval: reciprocal-rank fusion of the exact and the
    // LSH retrievers (k0 = 60) — incomparable scores fused on ranks
    // alone; per-term micro rounding keeps the sum integer-exact.
    Q("q151_rrf_fusion",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 25)
        val exact = Similarity.bruteForceKnn(queries, emb, k = 5)
        val ann = Similarity.lshKnn(queries, emb, dim = 64, k = 5,
          nBits = 6, tables = 4)
        Similarity.rrfFuse(Seq(exact, ann), k0 = 60, k = 5)
          .orderBy($"q_id", $"rrf_rank")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 25),
             |e AS (SELECT vec_id, embedding FROM embeddings),
             |xj AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))), (p,v) -> p + v))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM q JOIN e ON e.vec_id <> q_id),
             |exactr AS (
             |  SELECT q_id, n_id, rank FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM xj)
             |  WHERE rank <= 5),
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
             |  WHERE qb.vec_id < 25),
             |asims AS (
             |  SELECT q_id, n_id, round(
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(qe.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE))), (p,v) -> p + v))
             |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |         list_transform(ne.embedding, (u,i) -> CAST(u AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ne ON ne.vec_id = n_id),
             |annr AS (
             |  SELECT q_id, n_id, rank FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM asims)
             |  WHERE rank <= 5),
             |terms AS (
             |  SELECT q_id, n_id, CAST(round(1000000.0 / (60 + rank), 0) AS BIGINT) AS t FROM exactr
             |  UNION ALL
             |  SELECT q_id, n_id, CAST(round(1000000.0 / (60 + rank), 0) AS BIGINT) FROM annr),
             |fused AS (
             |  SELECT q_id, n_id, CAST(sum(t) AS BIGINT) AS score_micro
             |  FROM terms GROUP BY 1, 2),
             |rk AS (
             |  SELECT q_id, n_id, score_micro,
             |    row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, n_id) AS rrf_rank
             |  FROM fused)
             |SELECT q_id, CAST(rrf_rank AS BIGINT) AS rrf_rank, n_id, score_micro
             |FROM rk WHERE rrf_rank <= 5 ORDER BY q_id, rrf_rank""".stripMargin)),

    // SimHash estimator calibration (the q121 twin): hamming distance,
    // the cos(pi*d/63) similarity it implies, and the exact 2-gram
    // Jaccard, per banded candidate. Banding is lossless, so the
    // oracle recomputes every simhash and screens pairs exhaustively.
    Q("q152_simhash_calibration",
      (s, d) => {
        import s.implicits._
        Dedup.simHashCalibration(Tables.documents(s, d), "doc_id", "text",
            n = 2, maxDist = 6)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |th AS (
             |  SELECT doc_id,
             |    list_transform(l, s ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM toks),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
             |      CASE WHEN ((h * ((1103515245 * j) % 2038074743) + ((12345 * j + 7) % 2038074743)) % 2038074743) % 2 = 1
             |           THEN 1 ELSE -1 END)), 0) > 0
             |         THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END AS bit
             |  FROM th CROSS JOIN range(1, 64) t(j)),
             |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh FROM bits GROUP BY 1),
             |shg AS (
             |  SELECT doc_id,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS sg
             |  FROM toks),
             |cand AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS dist
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.sh, b.sh)) <= 6),
             |sel AS (
             |  SELECT c.id_a, c.id_b, c.dist,
             |    len(list_intersect(sa.sg, sb.sg)) AS inter,
             |    len(list_distinct(list_concat(sa.sg, sb.sg))) AS un
             |  FROM cand c JOIN shg sa ON sa.doc_id = c.id_a
             |    JOIN shg sb ON sb.doc_id = c.id_b)
             |SELECT id_a, id_b, dist,
             |  CAST(round(cos(pi() * dist / 63.0) * 1000000) AS BIGINT) AS cos_est_micro,
             |  (inter * 1000000) // un AS exact_micro
             |FROM sel ORDER BY 1, 2""".stripMargin)),

    // Weighted PageRank on the customer-supplier bipartite graph, edge
    // weight = shared lineitem count: mass flows (rank*w) div W_u per
    // edge, same integer floor discipline as q115 (whose uniform flow
    // is the w=1 special case, spec-pinned in LinkGraphSpec).
    Q("q153_pagerank_weighted",
      (s, d) => {
        import s.implicits._
        // persist: both union arms consume `pairs`, and without the
        // cache the orders⋈lineitem join + aggregation (the only pass
        // over the fact table) executes once per arm
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .agg(count(lit(1)).as("w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"), $"w")
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst"), $"w"))
        LinkGraph.pageRankWeightedMicro(edges, iters = 3)
          .orderBy($"node_id")
      },
      Some("""WITH pairs AS (
             |  SELECT o_custkey AS c, l_suppkey AS p, count(*) AS w
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
             |edges AS (
             |  SELECT c AS src, p + 1000000 AS dst, w FROM pairs
             |  UNION ALL SELECT p + 1000000, c, w FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges
             |          UNION SELECT DISTINCT dst FROM edges),
             |nn AS (SELECT count(*) AS n FROM nodes),
             |ws AS (SELECT src, sum(w) AS wsum FROM edges GROUP BY 1),
             |r0 AS (SELECT id, 1000000000000 // (SELECT n FROM nn) AS rank FROM nodes),
             |s1 AS (SELECT e.dst AS id, sum((r.rank * e.w) // d.wsum) AS s
             |       FROM edges e JOIN r0 r ON r.id = e.src JOIN ws d ON d.src = e.src
             |       GROUP BY 1),
             |r1 AS (SELECT n.id,
             |         (15 * (1000000000000 // (SELECT n FROM nn))) // 100
             |           + (85 * coalesce(s1.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN s1 ON s1.id = n.id),
             |s2 AS (SELECT e.dst AS id, sum((r.rank * e.w) // d.wsum) AS s
             |       FROM edges e JOIN r1 r ON r.id = e.src JOIN ws d ON d.src = e.src
             |       GROUP BY 1),
             |r2 AS (SELECT n.id,
             |         (15 * (1000000000000 // (SELECT n FROM nn))) // 100
             |           + (85 * coalesce(s2.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN s2 ON s2.id = n.id),
             |s3 AS (SELECT e.dst AS id, sum((r.rank * e.w) // d.wsum) AS s
             |       FROM edges e JOIN r2 r ON r.id = e.src JOIN ws d ON d.src = e.src
             |       GROUP BY 1),
             |r3 AS (SELECT n.id,
             |         (15 * (1000000000000 // (SELECT n FROM nn))) // 100
             |           + (85 * coalesce(s3.s, 0)) // 100 AS rank
             |       FROM nodes n LEFT JOIN s3 ON s3.id = n.id)
             |SELECT id AS node_id, CAST(rank AS BIGINT) AS rank_micro
             |FROM r3 ORDER BY id""".stripMargin)),

    // Token-overlap pairs via the STOCK Spark idiom
    // size(array_intersect(array_sort(array_distinct(...)))) — the
    // SortedIntersectRewrite rule must lower it onto the two-pointer
    // kernel (PlanAuditSpec asserts sorted_intersect_size in the
    // executed plan), so a user writing plain functions gets the
    // Dedup-internal kernel without knowing it exists. 1-in-17 doc
    // sample blocked by lang keeps the pair count bounded.
    Q("q155_sorted_intersect_rule",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .filter(pmod($"doc_id", lit(17L)) === 0L)
          .select($"doc_id", $"lang", $"text")
        val a = docs.select($"lang", $"doc_id".as("id_a"), $"text".as("text_a"))
        val b = docs.select($"lang", $"doc_id".as("id_b"), $"text".as("text_b"))
        a.join(b, "lang")
          .filter($"id_a" < $"id_b")
          .select($"id_a", $"id_b",
            size(array_intersect(
              array_sort(array_distinct(split(trim($"text_a"), "\\s+"))),
              array_sort(array_distinct(split(trim($"text_b"), "\\s+")))))
              .cast("long").as("n_shared"))
          .filter($"n_shared" >= 5L)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lang,
             |    list_distinct(string_split_regex(trim(text), '\s+')) AS toks
             |  FROM documents WHERE doc_id % 17 = 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_shared
             |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.toks, b.toks)) >= 5
             |ORDER BY 1, 2""".stripMargin)),

    // Matryoshka-truncation recall: how much ANN quality survives when
    // the 64-dim embeddings are cut to their first 16 dims (the
    // dimension-truncation storage/latency lever) — exact top-5 on the
    // full vectors vs exact top-5 on the prefix slice, scored with the
    // q140 recall harness; the oracle recomputes BOTH retrievals over
    // list slices.
    Q("q216_matryoshka_recall",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val exact = Similarity.bruteForceKnn(emb.filter($"vec_id" < 25),
          emb, k = 5)
        val tEmb = emb.select($"vec_id",
          slice($"embedding", 1, 16).as("embedding"))
        val trunc = Similarity.bruteForceKnn(tEmb.filter($"vec_id" < 25),
          tEmb, k = 5)
        Similarity.recallAtK(exact, trunc).orderBy($"q_id")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
             |  FROM embeddings WHERE vec_id < 25),
             |e AS (SELECT vec_id, embedding FROM embeddings),
             |xj AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb, (x,i) -> CAST(x AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))), (p,v) -> p + v))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding, (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM q JOIN e ON e.vec_id <> q_id),
             |exact AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM xj)
             |  WHERE rank <= 5),
             |tj AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    round(
             |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |        list_transform(q_emb[1:16], (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)
             |      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(q_emb[1:16], (x,i) -> CAST(x AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))), (p,v) -> p + v))
             |        * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |           list_transform(e.embedding[1:16], (x,i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (p,v) -> p + v)))
             |    , 6) + 0.0 AS sim
             |  FROM q JOIN e ON e.vec_id <> q_id),
             |trunc AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM tj)
             |  WHERE rank <= 5),
             |hit AS (
             |  SELECT exact.q_id, count(*) AS n_hit
             |  FROM exact JOIN trunc ON exact.q_id = trunc.q_id AND exact.n_id = trunc.n_id
             |  GROUP BY 1),
             |ex AS (SELECT q_id, count(*) AS n_exact FROM exact GROUP BY 1)
             |SELECT ex.q_id, n_exact, coalesce(n_hit, 0) AS n_hit,
             |  coalesce(n_hit, 0) * 1000000 // n_exact AS recall_micro
             |FROM ex LEFT JOIN hit ON hit.q_id = ex.q_id
             |ORDER BY ex.q_id""".stripMargin)),

    // q146's SCALE PATH: same directed-containment semantics through
    // the banded screen (df-capped inverted index + minwise probes +
    // exact verify) instead of the quadratic-per-block self-join. The
    // oracle is the same exact SQL as q146 — the screen must reproduce
    // the exact answer on this corpus or the query goes red, which is
    // precisely the recall contract the operator documents.
    Q("q225_containment_banded",
      (s, d) => {
        import s.implicits._
        Dedup.ngramContainmentPairsBanded(Tables.documents(s, d), "doc_id",
            "text", n = 2, threshold = 0.6, blockCols = Seq("lang"))
          .select($"contained_id", $"container_id",
            graft.core.Exact.r4($"containment").as("containment"))
          .orderBy($"contained_id", $"container_id")
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
             |  GROUP BY 1, 2),
             |dir AS (
             |  SELECT id_a AS contained_id, id_b AS container_id,
             |    i * 1.0 / x.sz AS c
             |  FROM inter JOIN szs x ON x.doc_id = id_a
             |  UNION ALL
             |  SELECT id_b, id_a, i * 1.0 / y.sz
             |  FROM inter JOIN szs y ON y.doc_id = id_b)
             |SELECT contained_id, container_id, round(c, 4) + 0.0 AS containment
             |FROM dir WHERE c >= 0.6
             |ORDER BY contained_id, container_id""".stripMargin)),

    // DSIR importance resampling scores: hashed-bigram multinomials
    // (target = English slice vs the raw corpus, Laplace-smoothed),
    // per-bucket log-ratio weights in micro-nats, per-doc INTEGER
    // weight sums — the "which raw docs look most like the target
    // domain" selection key, top-50 by (score desc, id).
    Q("q226_dsir_importance",
      (s, d) => {
        import s.implicits._
        LangModel.dsirImportanceMicro(Tables.documents(s, d), "doc_id",
            "text", $"lang" === "en", buckets = 1024)
          .orderBy($"score_micro".desc, $"id")
          .limit(50)
          .select($"id".as("doc_id"), $"n_grams", $"score_micro")
      },
      Some(s"""WITH toks AS (SELECT doc_id, lang, string_split_regex(trim(text),'\\s+') AS l FROM documents),
             |bg AS (
             |  SELECT doc_id, lang,
             |    unnest(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS g
             |  FROM toks),
             |hb AS (SELECT doc_id, lang, ${polyHashSql("g")} % 1024 AS b FROM bg),
             |bc AS (SELECT b, count(*) AS cr,
             |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
             |       FROM hb GROUP BY 1),
             |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
             |               CAST(sum(ct) AS BIGINT) AS nt FROM bc),
             |w AS (SELECT b,
             |        CAST(round((ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))
             |                  - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE)))
             |          * 1000000) AS BIGINT) AS w_micro
             |      FROM bc CROSS JOIN tot)
             |SELECT doc_id, count(*) AS n_grams,
             |  CAST(sum(w_micro) AS BIGINT) AS score_micro
             |FROM hb JOIN w USING (b)
             |GROUP BY 1
             |ORDER BY score_micro DESC, doc_id
             |LIMIT 50""".stripMargin)),

    // Train/eval leakage audit: hash-split the corpus (q75's split),
    // then for every eval doc its nearest train doc by bigram Jaccard
    // within the language block — candidate count, max similarity,
    // nearest neighbor, leaked flag at 0.5. The asymmetric exact
    // screen (eval fraction × train block, salted) is the oracle twin
    // of the banded-index path at web scale.
    Q("q227_split_leakage",
      (s, d) => {
        import s.implicits._
        val split = CorpusOps.hashSplit(Tables.documents(s, d), "doc_id",
          Seq("train" -> 90, "val" -> 5, "test" -> 5))
        Dedup.splitLeakageReport(split, "doc_id", "text", $"split", "train",
            n = 2, threshold = 0.5, blockCols = Seq("lang"))
          .select($"eval_id", $"n_candidates",
            graft.core.Exact.r4($"max_jaccard").as("max_jaccard"),
            $"nearest_train_id", $"leaked")
          .orderBy($"eval_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
             |        i -> CAST(ascii(substring(CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))),
             |      (a,b) -> (a*31 + b) % 1000000007) % 100 AS bucket
             |  FROM documents),
             |sp AS (SELECT doc_id,
             |         CASE WHEN bucket < 90 THEN 'train' ELSE 'eval' END AS split
             |       FROM h),
             |toks AS (SELECT doc_id, lang, string_split_regex(trim(text),'\s+') AS l FROM documents),
             |bg AS (
             |  SELECT doc_id, lang,
             |    unnest(list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL))) AS s
             |  FROM toks),
             |szs AS (SELECT doc_id, count(*) AS sz FROM bg GROUP BY 1),
             |inter AS (
             |  SELECT e.doc_id AS eval_id, t.doc_id AS train_id, count(*) AS i
             |  FROM bg e
             |  JOIN sp se ON se.doc_id = e.doc_id AND se.split = 'eval'
             |  JOIN bg t ON t.s = e.s AND t.lang = e.lang
             |  JOIN sp st ON st.doc_id = t.doc_id AND st.split = 'train'
             |  GROUP BY 1, 2),
             |j AS (SELECT eval_id, train_id,
             |        i * 1.0 / (x.sz + y.sz - i) AS jac
             |      FROM inter
             |      JOIN szs x ON x.doc_id = eval_id
             |      JOIN szs y ON y.doc_id = train_id),
             |r AS (SELECT *,
             |        row_number() OVER (PARTITION BY eval_id
             |          ORDER BY jac DESC, train_id DESC) AS rn,
             |        count(*) OVER (PARTITION BY eval_id) AS n_candidates,
             |        max(jac) OVER (PARTITION BY eval_id) AS mj
             |      FROM j)
             |SELECT eval_id, CAST(n_candidates AS BIGINT) AS n_candidates,
             |  round(mj, 4) + 0.0 AS max_jaccard,
             |  train_id AS nearest_train_id, mj >= 0.5 AS leaked
             |FROM r WHERE rn = 1 ORDER BY eval_id""".stripMargin)),

    // Winnowing (MOSS) fingerprint matching: per doc, the distinct
    // window-minima of PolyHashed bigram hashes (w=4); pairs sharing
    // >= 2 fingerprints within the language block. Detection through
    // an inverted-index join on selected hashes — any shared run of
    // w+k-1 tokens is guaranteed a common fingerprint, no pairwise
    // document comparison anywhere.
    Q("q228_winnowing_pairs",
      (s, d) => {
        import s.implicits._
        Dedup.winnowingSharedPairs(Tables.documents(s, d), "doc_id", "text",
            k = 2, w = 4, minShared = 2L, blockCols = Seq("lang"))
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""WITH toks AS (SELECT doc_id, lang, string_split_regex(trim(text),'\\s+') AS l FROM documents),
             |gs AS (
             |  SELECT doc_id, lang,
             |    list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL) AS g
             |  FROM toks),
             |hs AS (SELECT doc_id, lang,
             |         list_transform(g, x -> ${polyHashSql("x")}) AS h
             |       FROM gs WHERE len(g) >= 4),
             |fp AS (SELECT doc_id, lang,
             |         unnest(list_distinct(
             |           list_transform(generate_series(1, len(h) - 3),
             |             i -> list_min(h[i:i+3])))) AS fp
             |       FROM hs)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |FROM fp a JOIN fp b ON a.fp = b.fp AND a.lang = b.lang
             |  AND a.doc_id < b.doc_id
             |GROUP BY 1, 2
             |HAVING count(*) >= 2
             |ORDER BY 1, 2""".stripMargin)),

    // Heaps-law vocabulary growth curve (the corpus-datasheet "how fast
    // does the type inventory saturate" panel): corpus in doc-id order
    // cut into 10 deciles; per decile the token volume and the count of
    // types FIRST seen there, plus running totals. The per-type
    // min(doc_id) is one partial-combining groupBy; the cumulative
    // window runs over the 10-row decile table only.
    Q("q229_vocab_growth",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val mx = docs.agg(max($"doc_id")).head.getLong(0)
        val toks = docs.select($"doc_id",
          explode(TextAnalysis.tokens($"text")).as("tok"))
        val newTypes = toks.groupBy($"tok").agg(min($"doc_id").as("fd"))
          .select(expr(s"(fd * 10) div ${mx + 1}").as("decile"))
          .groupBy($"decile").agg(count(lit(1)).as("new_types"))
        val volume = docs.select(
            expr(s"(doc_id * 10) div ${mx + 1}").as("decile"),
            TextAnalysis.tokenCount($"text").as("nt"))
          .groupBy($"decile").agg(sum($"nt").as("n_tokens"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"decile")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        volume.join(newTypes, Seq("decile"), "left")
          .select($"decile", $"n_tokens",
            coalesce($"new_types", lit(0L)).as("new_types"))
          .withColumn("cum_tokens", sum($"n_tokens").over(w))
          .withColumn("cum_vocab", sum($"new_types").over(w))
          .select($"decile", $"n_tokens", $"cum_tokens", $"new_types", $"cum_vocab")
          .orderBy($"decile")
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
             |t AS (SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS tok FROM documents),
             |f AS (SELECT tok, min(doc_id) AS fd FROM t GROUP BY 1),
             |nt AS (SELECT (fd * 10) // (m + 1) AS decile, count(*) AS new_types
             |       FROM f CROSS JOIN mx GROUP BY 1),
             |dt AS (SELECT (doc_id * 10) // (m + 1) AS decile, count(*) AS n_tokens
             |       FROM t CROSS JOIN mx GROUP BY 1),
             |j AS (SELECT dt.decile, dt.n_tokens,
             |        coalesce(nt.new_types, 0) AS new_types
             |      FROM dt LEFT JOIN nt USING (decile))
             |SELECT CAST(decile AS BIGINT) AS decile,
             |  CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(sum(n_tokens) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             |  CAST(new_types AS BIGINT) AS new_types,
             |  CAST(sum(new_types) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
             |FROM j ORDER BY decile""".stripMargin)),

    // Greedy k-center coreset over the embedding table (farthest-point
    // traversal): 8 maximally-spread exemplars, each round one linear
    // min-distance update against the single new center + a
    // TakeOrdered(1) argmax. Distances are exact integer micro-units
    // so the argmax and its ties replay identically in the oracle's
    // 8 chained CTE stages.
    Q("q230_kcenter_coreset",
      (s, d) => {
        import s.implicits._
        Similarity.kCenterCoreset(Tables.embeddings(s, d), "vec_id",
            "embedding", k = 8)
          .orderBy($"sel_order")
      },
      Some {
        def dist(v: String, c: String): String =
          s"CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
            s"list_transform($v, (x,i) -> (CAST(x AS DOUBLE) - CAST($c[i] AS DOUBLE)) " +
            s"* (CAST(x AS DOUBLE) - CAST($c[i] AS DOUBLE)))), (a,b) -> a + b) " +
            s"* 1000000) AS BIGINT)"
        val sb = new StringBuilder
        sb ++= "WITH e AS (SELECT vec_id, embedding FROM embeddings),\n"
        sb ++= "c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1),\n"
        sb ++= s"m1 AS (SELECT e.vec_id, e.embedding, ${dist("e.embedding", "c.embedding")} AS mind\n" +
          "  FROM e CROSS JOIN c1 c WHERE e.vec_id <> c.vec_id),\n"
        for (j <- 2 to 7) {
          sb ++= s"c$j AS (SELECT vec_id, embedding, mind FROM m${j - 1} ORDER BY mind DESC, vec_id LIMIT 1),\n"
          sb ++= s"m$j AS (SELECT m.vec_id, m.embedding, least(m.mind, ${dist("m.embedding", "c.embedding")}) AS mind\n" +
            s"  FROM m${j - 1} m CROSS JOIN c$j c WHERE m.vec_id <> c.vec_id),\n"
        }
        sb ++= "c8 AS (SELECT vec_id, embedding, mind FROM m7 ORDER BY mind DESC, vec_id LIMIT 1)\n"
        sb ++= "SELECT CAST(1 AS BIGINT) AS sel_order, vec_id, CAST(NULL AS BIGINT) AS d_micro FROM c1"
        for (j <- 2 to 8)
          sb ++= s"\nUNION ALL SELECT CAST($j AS BIGINT), vec_id, mind FROM c$j"
        sb ++= "\nORDER BY sel_order"
        sb.toString
      }),

    // Deterministic m-of-n bootstrap CI for the per-priority mean
    // order value: 200 resamples of 1000 draws each, draw indices from
    // PolyHash(grp:b:j) mod n — a pure function of the data, so the
    // oracle replays the entire resampling procedure. Resample means
    // are exact integer micro; the CI is exact order statistics over
    // the 200 means (ranks 5 and 195 at alpha = 2.5%).
    Q("q235_bootstrap_ci",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_orderpriority".as("prio"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          $"o_orderkey")
        graft.ops.Eval.bootstrapMeanCi(o, "prio", "cents", "o_orderkey",
            reps = 200, m = 1000)
          .select($"grp".as("prio"), $"n", $"m_eff", $"reps",
            $"mean_micro", $"lo_micro", $"hi_micro")
          .orderBy($"prio")
      },
      Some(s"""WITH base AS (SELECT o_orderpriority AS grp,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
             |    o_orderkey AS tb
             |  FROM orders),
             |rk AS (SELECT grp, x,
             |        row_number() OVER (PARTITION BY grp ORDER BY x, tb) - 1 AS i
             |      FROM base),
             |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(x) AS BIGINT) AS sx,
             |        least(1000, CAST(count(*) AS BIGINT)) AS m_eff
             |      FROM base GROUP BY 1),
             |draws AS (
             |  SELECT st.grp, st.n, st.m_eff, gb.b, gj.j,
             |    ${polyHashSql("(st.grp || ':' || CAST(gb.b AS VARCHAR) || ':' || CAST(gj.j AS VARCHAR))")} % st.n AS i
             |  FROM st, generate_series(1, 200) AS gb(b),
             |       generate_series(0, 999) AS gj(j)
             |  WHERE gj.j < st.m_eff),
             |means AS (
             |  SELECT d.grp, d.b, d.m_eff,
             |    CAST(sum(r.x) AS BIGINT) * 1000000 // d.m_eff AS mean_b
             |  FROM draws d JOIN rk r ON r.grp = d.grp AND r.i = d.i
             |  GROUP BY 1, 2, 3),
             |rn AS (SELECT grp, b, mean_b,
             |        row_number() OVER (PARTITION BY grp
             |          ORDER BY mean_b, b) AS rn
             |      FROM means),
             |ci AS (SELECT grp,
             |        min(CASE WHEN rn = 5 THEN mean_b END) AS lo_micro,
             |        min(CASE WHEN rn = 195 THEN mean_b END) AS hi_micro
             |      FROM rn WHERE rn IN (5, 195) GROUP BY 1)
             |SELECT st.grp AS prio, st.n, st.m_eff, CAST(200 AS BIGINT) AS reps,
             |  st.sx * 1000000 // st.n AS mean_micro, ci.lo_micro, ci.hi_micro
             |FROM st JOIN ci ON ci.grp = st.grp ORDER BY prio""".stripMargin)),

    // Randomization test for the q207 A/B split: 50 deterministic
    // label reassignments (PolyHash(grp:p:event_id) mod 2) build the
    // null distribution of |mean1 - mean0| per event type; p-value is
    // the add-one-smoothed exceedance rate in exact milli. One
    // partial-combining pass over perms x facts — no sort, no joins on
    // the fact side.
    Q("q236_randomization_test",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type", ($"user_id" % 2).cast("int").as("variant"),
          $"event_id", round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Eval.randomizationTestMicro(ev, "event_type", "variant",
            "event_id", "cents", perms = 50)
          .orderBy($"grp")
      },
      Some(s"""WITH base AS (SELECT event_type AS grp, user_id % 2 AS v,
             |    CAST(event_id AS VARCHAR) AS k,
             |    CAST(round(value * 100, 0) AS BIGINT) AS x
             |  FROM events),
             |obs0 AS (SELECT grp,
             |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS BIGINT) AS s0
             |  FROM base GROUP BY 1
             |  HAVING n0 > 0 AND n1 > 0),
             |od AS (SELECT grp, n0, n1,
             |    abs(CAST(round((CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)
             |      - CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE)) * 1000000.0) AS BIGINT)) AS obs
             |  FROM obs0),
             |perm AS (
             |  SELECT b.grp, gp.p,
             |    ${polyHashSql("(b.grp || ':' || CAST(gp.p AS VARCHAR) || ':' || b.k)")} % 2 AS vp,
             |    b.x
             |  FROM base b, generate_series(1, 50) AS gp(p)),
             |pm AS (SELECT grp, p,
             |    CAST(sum(CASE WHEN vp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN vp = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             |    CAST(sum(CASE WHEN vp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN vp = 0 THEN x ELSE 0 END) AS BIGINT) AS s0
             |  FROM perm GROUP BY 1, 2
             |  HAVING n0 > 0 AND n1 > 0),
             |pd AS (SELECT grp, p,
             |    abs(CAST(round((CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)
             |      - CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE)) * 1000000.0) AS BIGINT)) AS d
             |  FROM pm)
             |SELECT od.grp, od.n0, od.n1, od.obs AS obs_diff_micro,
             |  CAST(count(*) AS BIGINT) AS n_perms,
             |  CAST(sum(CASE WHEN pd.d >= od.obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
             |  (1 + CAST(sum(CASE WHEN pd.d >= od.obs THEN 1 ELSE 0 END) AS BIGINT))
             |    * 1000 // (CAST(count(*) AS BIGINT) + 1) AS p_milli
             |FROM od JOIN pd ON pd.grp = od.grp
             |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin)),

    // Score-aware fusion of the exact and the IVF retrievers — the
    // cross-encoder-style companion to q151's rank-only RRF: per-query
    // min-max normalization to integer micro units, weighted CombSUM
    // (exact 2×, IVF 1×), re-rank. The oracle replays both retrievers
    // (the q151 exact chain, the q64 IVF chain) plus the integer
    // normalization end-to-end.
    Q("q237_score_fusion",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 25)
        val exact = Similarity.bruteForceKnn(queries, emb, k = 5)
        val ivf = graft.ext.IvfIndex.ivfKnn(s, queries, emb, k = 5,
          kCentroids = 16, nProbe = 4)
        Similarity.scoreFuse(Seq((exact, 2L), (ivf, 1L)), k = 5)
          .orderBy($"q_id", $"fuse_rank")
      },
      Some(s"""WITH ${ivfSql("v.id < 25", 5)},
             |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 25),
             |xj AS (
             |  SELECT q_id, e.vec_id AS n_id,
             |    ${cosR6Sql("q_emb", "e.embedding")} AS sim
             |  FROM q JOIN embeddings e ON e.vec_id <> q_id),
             |exactr AS (
             |  SELECT q_id, n_id, sim, rank FROM (
             |    SELECT q_id, n_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
             |    FROM xj)
             |  WHERE rank <= 5),
             |exn AS (
             |  SELECT q_id, n_id,
             |    CASE WHEN mx > mn THEN (sm - mn) * 1000000 // (mx - mn)
             |         ELSE 1000000 END AS norm
             |  FROM (SELECT q_id, n_id, CAST(round(sim * 1000000) AS BIGINT) AS sm,
             |          min(CAST(round(sim * 1000000) AS BIGINT)) OVER (PARTITION BY q_id) AS mn,
             |          max(CAST(round(sim * 1000000) AS BIGINT)) OVER (PARTITION BY q_id) AS mx
             |        FROM exactr)),
             |ivn AS (
             |  SELECT q_id, n_id,
             |    CASE WHEN mx > mn THEN (sm - mn) * 1000000 // (mx - mn)
             |         ELSE 1000000 END AS norm
             |  FROM (SELECT q_id, n_id, CAST(round(sim * 1000000) AS BIGINT) AS sm,
             |          min(CAST(round(sim * 1000000) AS BIGINT)) OVER (PARTITION BY q_id) AS mn,
             |          max(CAST(round(sim * 1000000) AS BIGINT)) OVER (PARTITION BY q_id) AS mx
             |        FROM ivfr)),
             |terms AS (
             |  SELECT q_id, n_id, 2 * norm AS t FROM exn
             |  UNION ALL
             |  SELECT q_id, n_id, 1 * norm FROM ivn),
             |fused AS (
             |  SELECT q_id, n_id, CAST(sum(t) AS BIGINT) AS score_micro
             |  FROM terms GROUP BY 1, 2),
             |rk AS (
             |  SELECT q_id, n_id, score_micro,
             |    row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, n_id) AS fuse_rank
             |  FROM fused)
             |SELECT q_id, CAST(fuse_rank AS BIGINT) AS fuse_rank, n_id, score_micro
             |FROM rk WHERE fuse_rank <= 5 ORDER BY q_id, fuse_rank""".stripMargin)),

    // The IVF index through the versioned store: fit once, persist via
    // io.Versioned (S3-S4's object-versioning contract), reload the
    // NEWEST version past a stale decoy, and serve — the build/serve
    // split a 100 TB deployment runs instead of q64's per-query
    // rebuild. The oracle is the fresh-build chain: reload must answer
    // bit-identically (floats round-trip parquet exactly; the search
    // is centroid-row-order independent).
    Q("q238_ivf_persist",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val dir = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_ivf_store").getAbsolutePath
        // decoy under an older tag (tiny corpus slice, k=2): reload
        // must skip it for the newer full-corpus index
        graft.ext.IvfIndex.persistCentroids(s, emb.filter($"vec_id" < 4),
          dir, "ivf16", tag = f"${1L}%020d_stale", kCentroids = 2)
        graft.ext.IvfIndex.persistCentroids(s, emb, dir, "ivf16",
          tag = f"${2L}%020d_live", kCentroids = 16)
        val cent = graft.ext.IvfIndex.loadLatest(s, dir, "ivf16")
        graft.ext.IvfIndex.ivfKnnWith(cent,
            emb.filter($"vec_id" >= 5 && $"vec_id" < 10), emb,
            k = 5, nProbe = 4)
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH ${ivfSql("v.id >= 5 AND v.id < 10", 5)}
             |SELECT q_id, rank, n_id, sim FROM ivfr
             |ORDER BY q_id, rank""".stripMargin)),

    // Near-dup screen certification on seeded duplicates: every doc in
    // the audit slice gets a planted 80%-prefix near-copy, then the
    // banded MinHash screen is scored against exhaustive n-gram
    // Jaccard ground truth — the precision/recall report that certifies
    // a (bands, rows) configuration's miss rate before the full-corpus
    // run commits to it. The oracle replays the mutation, the
    // exhaustive truth (q46 shape), the banded screen (q47 shape), and
    // the metric arithmetic.
    Q("q239_screen_quality",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .filter($"doc_id" < 300)
          .select($"doc_id", trim($"text").as("text"))
          .withColumn("l", split($"text", "\\s+"))
          .filter(size($"l") >= 2)
        val mutated = base.select(
          ($"doc_id" + 1000000L).as("doc_id"),
          array_join(slice($"l", lit(1), expr("(4 * size(l) + 4) div 5")), " ")
            .as("text"))
        val u = base.select($"doc_id", $"text").unionByName(mutated)
        Dedup.screenQualityReport(u, "doc_id", "text",
          n = 2, threshold = 0.2, bands = 21, rowsPerBand = 3)
      },
      Some("""WITH b0 AS (
             |  SELECT doc_id, trim(text) AS text,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents WHERE doc_id < 300),
             |b AS (SELECT * FROM b0 WHERE len(l) >= 2),
             |u AS (
             |  SELECT doc_id, text FROM b
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    array_to_string(l[1 : CAST((4 * len(l) + 4) // 5 AS INT)], ' ')
             |  FROM b),
             |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM u),
             |shg AS (
             |  SELECT doc_id,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS sh
             |  FROM toks),
             |bg AS (SELECT doc_id, unnest(sh) AS s FROM shg),
             |szs AS (SELECT doc_id, len(sh) AS sz FROM shg),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM bg a JOIN bg b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |truthp AS (
             |  SELECT id_a, id_b
             |  FROM inter JOIN szs x ON x.doc_id = id_a JOIN szs y ON y.doc_id = id_b
             |  WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.2),
             |base2 AS (
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
             |  FROM base2),
             |bandrows AS (
             |  SELECT doc_id, bb, sig[CAST(bb*3+1 AS INT) : CAST(bb*3+3 AS INT)] AS bucket
             |  FROM sig CROSS JOIN range(0, 21) t(bb)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bandrows a JOIN bandrows b ON a.bb = b.bb AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
             |ver AS (
             |  SELECT id_a, id_b,
             |    len(list_intersect(x.sh, y.sh)) * 1.0 / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
             |  FROM cand JOIN shg x ON x.doc_id = id_a JOIN shg y ON y.doc_id = id_b),
             |sm AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_screen,
             |    CAST(coalesce(sum(CASE WHEN jac >= 0.2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp
             |  FROM ver),
             |tm AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truthp)
             |SELECT n_truth, n_screen, tp,
             |  n_screen - tp AS fp, n_truth - tp AS fn,
             |  CASE WHEN n_screen > 0 THEN tp * 1000000 // n_screen END AS precision_micro,
             |  CASE WHEN n_truth > 0 THEN tp * 1000000 // n_truth END AS recall_micro
             |FROM sm CROSS JOIN tm""".stripMargin)),

    // Maximal-marginal-relevance diversified top-3 from a 6-candidate
    // exact pool (lambda = 0.7 in integer tenths) — the de-duplicating
    // reranker between retrieval and a RAG context window. Greedy
    // rounds are unrolled relational stages on both sides; the oracle
    // replays candidate pool, pairwise diversity sims, and all three
    // argmax rounds in integer micro arithmetic.
    Q("q240_mmr_topk",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Similarity.mmrTopK(emb.filter($"vec_id" < 20), emb,
            k = 3, m = 6, lamNum = 7)
          .orderBy($"q_id", $"sel_order")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20),
             |v AS (SELECT vec_id AS id, embedding AS emb FROM embeddings),
             |xj AS (
             |  SELECT q_id, v.id AS n_id, ${cosR6Sql("q_emb", "v.emb")} AS sim
             |  FROM q JOIN v ON v.id <> q_id),
             |cr AS (
             |  SELECT q_id, n_id, CAST(round(sim * 1000000) AS BIGINT) AS rel FROM (
             |    SELECT q_id, n_id, sim,
             |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             |    FROM xj)
             |  WHERE rn <= 6),
             |psim AS (
             |  SELECT c1.q_id, c1.n_id AS a, c2.n_id AS b,
             |    CAST(round(${cosR6Sql("e1.emb", "e2.emb")} * 1000000) AS BIGINT) AS dsim
             |  FROM cr c1 JOIN cr c2 ON c2.q_id = c1.q_id AND c2.n_id <> c1.n_id
             |  JOIN v e1 ON e1.id = c1.n_id JOIN v e2 ON e2.id = c2.n_id),
             |s1 AS (
             |  SELECT q_id, n_id, 7 * rel AS sc FROM (
             |    SELECT q_id, n_id, rel,
             |      row_number() OVER (PARTITION BY q_id ORDER BY 7 * rel DESC, n_id) AS rn
             |    FROM cr)
             |  WHERE rn = 1),
             |d2 AS (
             |  SELECT p.q_id, p.a AS n_id, max(p.dsim) AS md
             |  FROM psim p JOIN s1 ON s1.q_id = p.q_id AND s1.n_id = p.b
             |  GROUP BY 1, 2),
             |c2 AS (
             |  SELECT c.q_id, c.n_id, 7 * c.rel - 3 * d.md AS sc
             |  FROM cr c JOIN d2 d ON d.q_id = c.q_id AND d.n_id = c.n_id),
             |s2 AS (
             |  SELECT q_id, n_id, sc FROM (
             |    SELECT q_id, n_id, sc,
             |      row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, n_id) AS rn
             |    FROM c2)
             |  WHERE rn = 1),
             |sel12 AS (SELECT q_id, n_id FROM s1 UNION ALL SELECT q_id, n_id FROM s2),
             |d3 AS (
             |  SELECT p.q_id, p.a AS n_id, max(p.dsim) AS md
             |  FROM psim p JOIN sel12 s ON s.q_id = p.q_id AND s.n_id = p.b
             |  GROUP BY 1, 2),
             |c3 AS (
             |  SELECT c.q_id, c.n_id, 7 * c.rel - 3 * d.md AS sc
             |  FROM cr c JOIN d3 d ON d.q_id = c.q_id AND d.n_id = c.n_id
             |  WHERE NOT EXISTS (SELECT 1 FROM sel12 s
             |                    WHERE s.q_id = c.q_id AND s.n_id = c.n_id)),
             |s3 AS (
             |  SELECT q_id, n_id, sc FROM (
             |    SELECT q_id, n_id, sc,
             |      row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, n_id) AS rn
             |    FROM c3)
             |  WHERE rn = 1)
             |SELECT q_id, CAST(1 AS BIGINT) AS sel_order, n_id, sc AS mmr_micro FROM s1
             |UNION ALL
             |SELECT q_id, CAST(2 AS BIGINT), n_id, sc FROM s2
             |UNION ALL
             |SELECT q_id, CAST(3 AS BIGINT), n_id, sc FROM s3
             |ORDER BY q_id, sel_order""".stripMargin)),

    // The q239 certification swept across verification thresholds: one
    // precision/recall row per tau from one pass over each pair set —
    // the operating-point curve (bands screen, tau verifies, so
    // n_screen is constant and only tp/n_truth move). Same seeded
    // slice and oracle chains as q239, plus the threshold unnest.
    Q("q241_screen_curve",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .filter($"doc_id" < 300)
          .select($"doc_id", trim($"text").as("text"))
          .withColumn("l", split($"text", "\\s+"))
          .filter(size($"l") >= 2)
        val mutated = base.select(
          ($"doc_id" + 1000000L).as("doc_id"),
          array_join(slice($"l", lit(1), expr("(4 * size(l) + 4) div 5")), " ")
            .as("text"))
        val u = base.select($"doc_id", $"text").unionByName(mutated)
        Dedup.screenQualityCurve(u, "doc_id", "text", n = 2,
          tausMicro = Seq(100000L, 300000L, 500000L, 700000L, 900000L),
          bands = 21, rowsPerBand = 3)
      },
      Some("""WITH b0 AS (
             |  SELECT doc_id, trim(text) AS text,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents WHERE doc_id < 300),
             |b AS (SELECT * FROM b0 WHERE len(l) >= 2),
             |u AS (
             |  SELECT doc_id, text FROM b
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    array_to_string(l[1 : CAST((4 * len(l) + 4) // 5 AS INT)], ' ')
             |  FROM b),
             |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM u),
             |shg AS (
             |  SELECT doc_id,
             |    list_distinct(list_filter(
             |      list_transform(l, (x,i) -> CASE WHEN i <= len(l)-1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS sh
             |  FROM toks),
             |bg AS (SELECT doc_id, unnest(sh) AS s FROM shg),
             |szs AS (SELECT doc_id, len(sh) AS sz FROM shg),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM bg a JOIN bg b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |truthj AS (
             |  SELECT CAST(round(CAST(i AS DOUBLE) / (x.sz + y.sz - i) * 1000000) AS BIGINT) AS jm
             |  FROM inter JOIN szs x ON x.doc_id = id_a JOIN szs y ON y.doc_id = id_b),
             |base2 AS (
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
             |  FROM base2),
             |bandrows AS (
             |  SELECT doc_id, bb, sig[CAST(bb*3+1 AS INT) : CAST(bb*3+3 AS INT)] AS bucket
             |  FROM sig CROSS JOIN range(0, 21) t(bb)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bandrows a JOIN bandrows b ON a.bb = b.bb AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
             |ver AS (
             |  SELECT CAST(round(
             |      CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             |      / len(list_distinct(list_concat(x.sh, y.sh))) * 1000000) AS BIGINT) AS jm
             |  FROM cand JOIN shg x ON x.doc_id = id_a JOIN shg y ON y.doc_id = id_b),
             |taus AS (SELECT unnest([100000, 300000, 500000, 700000, 900000]) AS tau_micro),
             |tc AS (SELECT tau_micro, CAST(count(jm) AS BIGINT) AS n_truth
             |       FROM taus LEFT JOIN truthj ON jm >= tau_micro GROUP BY 1),
             |sc AS (SELECT tau_micro, CAST(count(jm) AS BIGINT) AS tp
             |       FROM taus LEFT JOIN ver ON jm >= tau_micro GROUP BY 1),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_screen FROM ver)
             |SELECT CAST(tau_micro AS BIGINT) AS tau_micro, n_truth, n_screen, tp,
             |  CASE WHEN n_screen > 0 THEN tp * 1000000 // n_screen END AS precision_micro,
             |  CASE WHEN n_truth > 0 THEN tp * 1000000 // n_truth END AS recall_micro
             |FROM tc JOIN sc USING (tau_micro) CROSS JOIN ns
             |ORDER BY tau_micro""".stripMargin))
  )
}
