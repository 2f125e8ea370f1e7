package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{LangModel, LinkGraph}
import graft.ops.{Allocate, Behavior, Eval, Inequality, Spatial, Sweep}

/** Twelfth-wave operators: bounded-hop BFS reachability over the trade
  * graph, largest-remainder budget proration, per-group Gini via
  * two-phase ranks, chi-squared independence cells, and the cumulative
  * distinct-users growth curve.
  *
  * Same oracle discipline as everywhere: exact integer arithmetic end
  * to end; any fractional step is ONE shared-shape double expression
  * whose operands are exact integers, rounded to micro-units on both
  * engines.
  */
object StatQueries extends QueryPack {

  /** Geofence ring for q190, micro-degrees in the synthetic coastal
    * coordinate range — shared between the Spark expression and the
    * generated oracle text. Declared before `all`: the oracle strings
    * evaluate it at object init.
    */
  private val FencePoly: Seq[(Long, Long)] = Seq(
    (35000000L, -16400000L), (35570000L, -16810000L),
    (35350000L, -17480000L), (34650000L, -17480000L),
    (34430000L, -16810000L))

  val all: Seq[Q] = Seq(

    // Bounded-hop BFS from a trusted seed set over the bipartite
    // customer<->supplier trade graph (supplier ids offset, the q115
    // node-id convention): shortest hop distance within 3 hops via
    // frontier expansion; the oracle's min-relaxation CTE chain
    // converges to the same distances on unit weights.
    Q("q178_bfs_khop",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p")).distinct()
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"))
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst")))
        val seeds = Tables.customer(s, d).filter($"c_custkey" < 10)
          .select($"c_custkey".as("id"))
        LinkGraph.bfsDistances(edges, seeds, maxHops = 3)
          .orderBy($"node_id")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |edges AS (
             |  SELECT c AS src, p + 1000000 AS dst FROM pairs
             |  UNION ALL SELECT p + 1000000, c FROM pairs),
             |d0 AS (SELECT c_custkey AS id, 0 AS dist
             |       FROM customer WHERE c_custkey < 10),
             |d1 AS (SELECT id, min(dist) AS dist FROM (
             |         SELECT id, dist FROM d0
             |         UNION ALL
             |         SELECT e.dst, d0.dist + 1 FROM d0
             |         JOIN edges e ON e.src = d0.id) GROUP BY id),
             |d2 AS (SELECT id, min(dist) AS dist FROM (
             |         SELECT id, dist FROM d1
             |         UNION ALL
             |         SELECT e.dst, d1.dist + 1 FROM d1
             |         JOIN edges e ON e.src = d1.id) GROUP BY id),
             |d3 AS (SELECT id, min(dist) AS dist FROM (
             |         SELECT id, dist FROM d2
             |         UNION ALL
             |         SELECT e.dst, d2.dist + 1 FROM d2
             |         JOIN edges e ON e.src = d2.id) GROUP BY id)
             |SELECT id AS node_id, CAST(dist AS BIGINT) AS dist
             |FROM d3 ORDER BY id""".stripMargin)),

    // Largest-remainder (Hamilton) proration: a 1,000,000-unit budget
    // per market segment split across nations in proportion to exact
    // revenue cents — sums to the budget exactly per group, every
    // engine, every parallelism.
    Q("q179_prorate_budget",
      (s, d) => {
        import s.implicits._
        val w = Tables.customer(s, d)
          .join(Tables.nation(s, d), $"c_nationkey" === $"n_nationkey")
          .join(Tables.orders(s, d), $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment".as("segment"), $"n_name".as("nation"))
          .agg(graft.core.Exact.centsSum($"o_totalprice").as("w_cents"))
        Allocate.prorate(w, "segment", "nation", "w_cents", budget = 1000000L)
          .select($"segment", $"nation", $"weight".as("w_cents"), $"alloc")
          .orderBy($"segment", $"nation")
      },
      Some("""WITH w AS (
             |  SELECT c_mktsegment AS segment, n_name AS nation,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |      AS w_cents
             |  FROM customer
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN orders ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |b AS (SELECT segment, nation, w_cents,
             |        sum(w_cents) OVER (PARTITION BY segment) AS wsum
             |      FROM w WHERE w_cents > 0),
             |c AS (SELECT segment, nation, w_cents,
             |        (1000000 * w_cents) // wsum AS base,
             |        (1000000 * w_cents) % wsum AS rem
             |      FROM b),
             |r AS (SELECT segment, nation, w_cents, base,
             |        1000000 - sum(base) OVER (PARTITION BY segment) AS leftover,
             |        row_number() OVER (PARTITION BY segment
             |                           ORDER BY rem DESC, nation ASC) AS rk
             |      FROM c)
             |SELECT segment, nation, w_cents,
             |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             |    AS alloc
             |FROM r ORDER BY segment, nation""".stripMargin)),

    // Per-priority Gini concentration of order value: rank formulation
    // over exact cents with TWO-PHASE per-group ranks (never a global
    // per-group window), one shared-shape double division to micro.
    Q("q180_gini_concentration",
      (s, d) => {
        import s.implicits._
        val base = Tables.orders(s, d).select(
          $"o_orderpriority".as("prio"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          $"o_orderkey")
        Inequality.giniMicro(base, "prio", "cents", "o_orderkey")
          .orderBy($"prio")
      },
      Some("""WITH b AS (
             |  SELECT o_orderpriority AS prio,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
             |    o_orderkey AS k
             |  FROM orders),
             |r AS (SELECT prio, x,
             |        row_number() OVER (PARTITION BY prio ORDER BY x, k) AS i
             |      FROM b),
             |g AS (SELECT prio, count(*) AS n, sum(x) AS total,
             |        sum(i * x) AS ix
             |      FROM r GROUP BY 1)
             |SELECT prio, CAST(n AS BIGINT) AS n, CAST(total AS BIGINT) AS total,
             |  CAST(round(CAST(2 * ix - (n + 1) * total AS DOUBLE) * 1000000.0
             |             / CAST(n * total AS DOUBLE)) AS BIGINT) AS gini_micro
             |FROM g ORDER BY prio""".stripMargin)),

    // Chi-squared independence cells: event type x user segment
    // (user_id % 4). Exact integer O/R/C/T per cell; expected count and
    // contribution are each ONE shared-shape double division rounded to
    // micro — the statistic is then an exact integer sum of
    // contrib_micro (no cross-cell double accumulation anywhere).
    Q("q181_chisq_cells",
      (s, d) => {
        import s.implicits._
        val df = Tables.events(s, d)
          .select($"event_type", expr("user_id % 4").as("seg"))
        Eval.chiSquareCells(df, "event_type", "seg")
          .select($"r".as("event_type"), $"c".as("seg"),
            $"o", $"e_micro", $"contrib_micro")
          .orderBy($"event_type", $"seg")
      },
      Some("""WITH cells AS (
             |  SELECT event_type AS r, user_id % 4 AS c, count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |w AS (SELECT r, c, o,
             |        sum(o) OVER (PARTITION BY r) AS rt,
             |        sum(o) OVER (PARTITION BY c) AS ct,
             |        sum(o) OVER () AS t
             |      FROM cells)
             |SELECT r AS event_type, CAST(c AS BIGINT) AS seg,
             |  CAST(o AS BIGINT) AS o,
             |  CAST(round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) * 1000000.0
             |             / CAST(t AS DOUBLE)) AS BIGINT) AS e_micro,
             |  CAST(round(CAST(o * t - rt * ct AS DOUBLE)
             |             * CAST(o * t - rt * ct AS DOUBLE) * 1000000.0
             |             / CAST(t * rt * ct AS DOUBLE)) AS BIGINT)
             |    AS contrib_micro
             |FROM w ORDER BY event_type, seg""".stripMargin)),

    // Growth curve: daily active users, first-seen (new) users, and the
    // cumulative distinct-user count — the running sum lives on the
    // per-DAY table (calendar-bounded), all fact-table work is
    // partial-combining groupBys.
    Q("q182_cumulative_distinct",
      (s, d) => {
        import s.implicits._
        Behavior.cumulativeDistinct(Tables.events(s, d))
          .orderBy($"day")
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
             |    user_id AS u
             |  FROM events),
             |a AS (SELECT day, count(*) AS n_active FROM du GROUP BY 1),
             |f AS (SELECT u, min(day) AS day FROM du GROUP BY 1),
             |nn AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1)
             |SELECT a.day, CAST(a.n_active AS BIGINT) AS n_active,
             |  CAST(coalesce(nn.n_new, 0) AS BIGINT) AS n_new,
             |  CAST(sum(coalesce(nn.n_new, 0))
             |         OVER (ORDER BY a.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS cum_users
             |FROM a LEFT JOIN nn ON a.day = nn.day
             |ORDER BY a.day""".stripMargin)),

    // Exact TF-IDF cosine top-3 neighbors over bigram vectors via the
    // inverted-index join — the lexical ground-truth retriever next to
    // the dense-embedding ANN stack (q49/q50/q78). Kilo-unit integer
    // idf weights, exact long dots/norms, one shared-shape double per
    // pair. The doc_id bound keeps the exact quadratic stage fixed-size
    // at any sf (the q46 convention); the df-cap is the operator's own
    // scale lever.
    Q("q183_tfidf_cosine_topk",
      (s, d) => {
        import s.implicits._
        LangModel.tfidfCosineTopK(
            Tables.documents(s, d).filter($"doc_id" < 1000),
            "doc_id", "text", k = 3, maxDf = 200L, n = 2)
          .orderBy($"doc_id", $"rnk")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
             |  FROM documents WHERE doc_id < 1000),
             |gr AS (
             |  SELECT doc_id,
             |    unnest(list_filter(
             |      list_transform(l, (x, i) ->
             |        CASE WHEN i <= len(l) - 1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS tok
             |  FROM toks),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM gr GROUP BY 1, 2),
             |nd AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
             |idf AS (
             |  SELECT tok,
             |    CAST(round((ln(CAST((SELECT n FROM nd) AS DOUBLE))
             |                - ln(CAST(count(*) AS DOUBLE))) * 1000) AS BIGINT)
             |      AS idf_kilo
             |  FROM tf GROUP BY tok HAVING count(*) <= 200),
             |w AS (SELECT doc_id, tok, tf * idf_kilo AS w
             |      FROM tf JOIN idf USING (tok)),
             |nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
             |dots AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
             |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |bth AS (SELECT id_a, id_b, dot FROM dots
             |        UNION ALL SELECT id_b, id_a, dot FROM dots),
             |sc AS (
             |  SELECT id_a, id_b,
             |    CAST(round(CAST(dot AS DOUBLE) * 1000000.0
             |               / (sqrt(CAST(x.n2 AS DOUBLE))
             |                  * sqrt(CAST(y.n2 AS DOUBLE)))) AS BIGINT)
             |      AS cos_micro
             |  FROM bth JOIN nrm x ON x.doc_id = id_a
             |           JOIN nrm y ON y.doc_id = id_b),
             |r AS (SELECT id_a, id_b, cos_micro,
             |        row_number() OVER (PARTITION BY id_a
             |                           ORDER BY cos_micro DESC, id_b) AS rnk
             |      FROM sc)
             |SELECT id_a AS doc_id, CAST(rnk AS BIGINT) AS rnk,
             |  id_b AS nbr_id, cos_micro
             |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // BPE merge induction, 3 rounds: corpus-frequency-weighted adjacent
    // symbol-pair counts over the word vocabulary, deterministic argmax
    // adoption, greedy left-to-right re-tokenization as a pure left
    // fold — the oracle replays the identical rounds with recursive-CTE
    // scans (engine-portable by construction).
    Q("q184_bpe_merges",
      (s, d) => LangModel.bpeMerges(Tables.documents(s, d), "text", rounds = 3)
        .orderBy(org.apache.spark.sql.functions.col("merge_round")),
      Some("""WITH RECURSIVE toks AS (
             |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |sy0 AS MATERIALIZED (SELECT tok, count(*) AS wf, string_split_regex(tok, '') AS syms
             |        FROM toks GROUP BY tok),
             |p1c AS MATERIALIZED (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy0)
             |  GROUP BY 1, 2),
             |m1 AS MATERIALIZED (SELECT p1, p2, c FROM p1c ORDER BY c DESC, p1, p2 LIMIT 1),
             |scan1 AS (
             |  SELECT tok, wf, syms, 2 AS i, [syms[1]] AS acc FROM sy0
             |  UNION ALL
             |  SELECT tok, wf, syms, i + 1,
             |    CASE WHEN acc[-1] = m.p1 AND syms[i] = m.p2
             |      THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
             |      ELSE list_append(acc, syms[i]) END
             |  FROM scan1, m1 m WHERE i <= len(syms)),
             |sy1 AS MATERIALIZED (SELECT tok, wf, acc AS syms FROM scan1
             |        WHERE i = len(syms) + 1),
             |p2c AS MATERIALIZED (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy1)
             |  GROUP BY 1, 2),
             |m2 AS MATERIALIZED (SELECT p1, p2, c FROM p2c ORDER BY c DESC, p1, p2 LIMIT 1),
             |scan2 AS (
             |  SELECT tok, wf, syms, 2 AS i, [syms[1]] AS acc FROM sy1
             |  UNION ALL
             |  SELECT tok, wf, syms, i + 1,
             |    CASE WHEN acc[-1] = m.p1 AND syms[i] = m.p2
             |      THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
             |      ELSE list_append(acc, syms[i]) END
             |  FROM scan2, m2 m WHERE i <= len(syms)),
             |sy2 AS MATERIALIZED (SELECT tok, wf, acc AS syms FROM scan2
             |        WHERE i = len(syms) + 1),
             |p3c AS MATERIALIZED (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy2)
             |  GROUP BY 1, 2),
             |m3 AS MATERIALIZED (SELECT p1, p2, c FROM p3c ORDER BY c DESC, p1, p2 LIMIT 1)
             |SELECT CAST(1 AS BIGINT) AS merge_round, p1 AS left_sym,
             |  p2 AS right_sym, c AS pair_count FROM m1
             |UNION ALL SELECT 2, p1, p2, c FROM m2
             |UNION ALL SELECT 3, p1, p2, c FROM m3
             |ORDER BY merge_round""".stripMargin)),

    // Tokenizer fertility per language under a corpus-induced BPE
    // vocabulary (6 merge rounds): subwords emitted per word, exact
    // integer micro. The segmentation runs ONCE over the vocabulary
    // (token → subword count), then broadcast-joins onto the token
    // stream — the corpus is never re-segmented row by row. The
    // oracle re-derives the same 6 merges (argmax per round,
    // count-desc/left/right ties) and replays the greedy folds with
    // recursive-CTE scans, all generated from q184's round template.
    Q("q232_bpe_fertility",
      (s, d) => {
        import s.implicits._
        LangModel.bpeFertilityByGroup(Tables.documents(s, d), "lang",
            "text", rounds = 6)
          .select($"grp".as("lang"), $"n_words", $"n_subwords",
            $"fertility_micro")
          .orderBy($"lang")
      },
      Some {
        // every non-recursive CTE is MATERIALIZED: DuckDB re-evaluates
        // plain CTE references per use, and the per-round sy/m chain
        // references compound — the unmaterialized 6-round oracle ran
        // for minutes, the materialized one in 0.09 s (same rows)
        def round(j: Int): String =
          s"""p${j}c AS MATERIALIZED (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy${j - 1})
             |  GROUP BY 1, 2),
             |m$j AS MATERIALIZED (SELECT p1, p2, c FROM p${j}c ORDER BY c DESC, p1, p2 LIMIT 1),
             |scan$j AS (
             |  SELECT tok, wf, syms, 2 AS i, [syms[1]] AS acc FROM sy${j - 1}
             |  UNION ALL
             |  SELECT tok, wf, syms, i + 1,
             |    CASE WHEN acc[-1] = m.p1 AND syms[i] = m.p2
             |      THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
             |      ELSE list_append(acc, syms[i]) END
             |  FROM scan$j, m$j m WHERE i <= len(syms)),
             |sy$j AS MATERIALIZED (SELECT tok, wf, acc AS syms FROM scan$j
             |        WHERE i = len(syms) + 1),
             |""".stripMargin
        val head =
          """WITH RECURSIVE tokl AS MATERIALIZED (
            |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
            |  FROM documents),
            |sy0 AS MATERIALIZED (SELECT tok, count(*) AS wf, string_split_regex(tok, '') AS syms
            |        FROM tokl GROUP BY tok),
            |""".stripMargin
        val tail =
          """fin AS (SELECT tok, len(syms) AS n_sub FROM sy6)
            |SELECT t.lang, CAST(count(*) AS BIGINT) AS n_words,
            |  CAST(sum(f.n_sub) AS BIGINT) AS n_subwords,
            |  CAST(sum(f.n_sub) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
            |    AS fertility_micro
            |FROM tokl t JOIN fin f ON f.tok = t.tok
            |GROUP BY 1 ORDER BY 1""".stripMargin
        head + (1 to 6).map(round).mkString + tail
      }),

    // Conversion attribution: last-touch within a 7-day window and
    // first-touch (unwindowed) credit per channel for 'purchase'
    // conversions — IGNORE-NULLS navigation over the strictly-preceding
    // per-user frame, identical frames on both engines.
    Q("q185_attribution",
      (s, d) => {
        import s.implicits._
        Behavior.attribution(Tables.events(s, d), convType = "purchase",
            windowSec = 604800L)
          .orderBy($"channel")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
             |  FROM events),
             |m AS (
             |  SELECT event_type, sec,
             |    last_value(CASE WHEN event_type <> 'purchase'
             |                    THEN event_type END IGNORE NULLS)
             |      OVER w AS last_ch,
             |    last_value(CASE WHEN event_type <> 'purchase'
             |                    THEN sec END IGNORE NULLS)
             |      OVER w AS last_sec,
             |    first_value(CASE WHEN event_type <> 'purchase'
             |                     THEN event_type END IGNORE NULLS)
             |      OVER w AS first_ch
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |conv AS (SELECT * FROM m WHERE event_type = 'purchase'),
             |lc AS (SELECT last_ch AS channel, count(*) AS n_last FROM conv
             |       WHERE last_ch IS NOT NULL AND sec - last_sec <= 604800
             |       GROUP BY 1),
             |fc AS (SELECT first_ch AS channel, count(*) AS n_first FROM conv
             |       WHERE first_ch IS NOT NULL GROUP BY 1)
             |SELECT channel, CAST(coalesce(n_last, 0) AS BIGINT) AS n_last_touch,
             |  CAST(coalesce(n_first, 0) AS BIGINT) AS n_first_touch
             |FROM lc FULL OUTER JOIN fc USING (channel)
             |ORDER BY channel""".stripMargin)),

    // BUCKETED co-located join: both tables written bucketBy(8) on the
    // join key, so the sort-merge join reads bucket files directly —
    // NO shuffle on either side (PlanAuditSpec pins the exchange-free
    // join subtree). The layout move that turns every repeated
    // fact-dim join on the same key into a scan-local operation —
    // at 100 TB the difference between re-shuffling the fact table
    // per query and never shuffling it at all. Child session so the
    // disabled broadcast threshold (SMJ, not BHJ) stays local.
    Q("q186_bucketed_join",
      (s, d) => {
        import s.implicits._
        import graft.core.Exact
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val wh = graft.core.Scratch.dir("q186_buckets")
        Tables.orders(s2, d).write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$wh/ord").saveAsTable("q186_ord")
        Tables.customer(s2, d).write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$wh/cust").saveAsTable("q186_cust")
        val o = s2.table("q186_ord")
        val c = s2.table("q186_cust")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
            Exact.centsSum($"o_totalprice").as("rev_cents"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS rev_cents
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Fixed-point EMA of each customer's order values (alpha =
    // 410/1024): the inherently-recursive smoothing a prefix-sum
    // window cannot express, as a per-key integer left fold — DuckDB
    // replays it with list_reduce, bit-identical.
    Q("q187_ema_orders",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_custkey".as("cust"),
          $"o_orderdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"o_orderkey".as("okey"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        graft.ops.TimeSeries.emaFixedPoint(o, "cust", Seq("sec", "okey"),
            "cents", num = 410L, den = 1024L)
          .select($"key".as("custkey"), $"n", $"last_val".as("last_cents"),
            $"ema".as("ema_cents"))
          .orderBy($"custkey")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust,
             |    epoch_us(o_orderdate) // 1000000 AS sec,
             |    o_orderkey AS okey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |l AS (SELECT cust, count(*) AS n,
             |        list(cents ORDER BY sec, okey, cents) AS vals
             |      FROM o GROUP BY 1)
             |SELECT cust AS custkey, CAST(n AS BIGINT) AS n,
             |  vals[-1] AS last_cents,
             |  list_reduce(vals, (acc, x) -> (410 * x + 614 * acc) // 1024)
             |    AS ema_cents
             |FROM l ORDER BY custkey""".stripMargin)),

    // Floor-capped running inventory per part: returns add stock,
    // shipments drain it, level clamps at zero — the non-associative
    // recurrence (clamp depends on its own previous output) as the
    // same per-key integer fold; signs never meet a division, so the
    // engines agree exactly.
    Q("q188_capped_inventory",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_partkey".as("pk"),
          $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
          when($"l_returnflag" === "R", $"l_quantity")
            .otherwise(-$"l_quantity").cast("long").as("delta"))
        graft.ops.TimeSeries.cappedRunningSum(li, "pk",
            Seq("sec", "ok", "ln"), "delta")
          .select($"key".as("partkey"), $"n_moves", $"final_level")
          .orderBy($"partkey")
      },
      Some("""WITH li AS (
             |  SELECT l_partkey AS pk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
             |              ELSE -l_quantity END AS BIGINT) AS delta
             |  FROM lineitem),
             |l AS (SELECT pk, count(*) AS n_moves,
             |        list(delta ORDER BY sec, ok, ln, delta) AS ds
             |      FROM li GROUP BY 1)
             |SELECT pk AS partkey, CAST(n_moves AS BIGINT) AS n_moves,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), ds),
             |              (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
             |    AS final_level
             |FROM l ORDER BY partkey""".stripMargin)),

    // Fixed-round k-core peeling on the thresholded co-purchase graph
    // (parts sharing >= 2 orders): 4 peels at k = 2 — converged at this
    // scale, and round-for-round identical to the oracle's chained
    // peels either way.
    Q("q189_kcore_peel",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c"))
          .filter($"c" >= 2).select($"id_a", $"id_b")
        LinkGraph.kCorePeel(pairs, k = 2, rounds = 4)
          .orderBy($"node_id")
      },
      Some {
        // every CTE is MATERIALIZED (the q369 k-truss pattern): without
        // it DuckDB re-inlines e{r-1} at each of its three references
        // per round, so the plan tree grows 3^rounds copies of the
        // quadratic pair join and spills >79 GB at sf0.1. Materialized,
        // each round is one linear pass — feasible at every gate scale.
        val peel = (1 to 4).map { r =>
          s"""d$r AS MATERIALIZED (SELECT id, count(*) AS c FROM (
             |  SELECT a AS id FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
             |  GROUP BY 1),
             |k$r AS MATERIALIZED (SELECT id FROM d$r WHERE c >= 2),
             |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
             |  JOIN k$r ka ON ka.id = e.a
             |  JOIN k$r kb ON kb.id = e.b)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH li AS MATERIALIZED (
           |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           |  FROM lineitem),
           |e0 AS MATERIALIZED (
           |  SELECT x.pk AS a, y.pk AS b FROM li x JOIN li y
           |  ON x.ok = y.ok AND x.pk < y.pk
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |$peel
           |SELECT id AS node_id, CAST(count(*) AS BIGINT) AS deg FROM (
           |  SELECT a AS id FROM e4 UNION ALL SELECT b FROM e4)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Division-free ray-casting geofence over the synthetic coastal
    // coordinates: the polygon folds into ONE per-row codegen
    // expression (no join, no shuffle); exact integer cross products,
    // so parity is engine-identical. The oracle text for the point
    // coordinates AND the edge tests is generated from the same
    // constants the Spark expression uses — no drift possible.
    Q("q190_point_in_polygon",
      (s, d) => {
        import s.implicits._
        val pts = Tables.customer(s, d).select($"c_custkey",
          expr(Spatial.lonSql("c_custkey")).as("x"),
          expr(Spatial.latSql("c_custkey")).as("y"))
        Spatial.pointInPolygon(pts, "x", "y", FencePoly)
          .select($"c_custkey", $"n_crossings",
            $"inside".cast("long").as("inside"))
          .orderBy($"c_custkey")
      },
      Some {
        val edges = FencePoly.indices.map { i =>
          val (x1, y1) = FencePoly(i)
          val (x2, y2) = FencePoly((i + 1) % FencePoly.size)
          s"""(CASE WHEN ($y1 <= py AND py < $y2
             |        AND ($x2 - $x1) * (py - $y1) - ($y2 - $y1) * (px - $x1) > 0)
             |       OR ($y2 <= py AND py < $y1
             |        AND ($x2 - $x1) * (py - $y1) - ($y2 - $y1) * (px - $x1) < 0)
             |  THEN 1 ELSE 0 END)""".stripMargin
        }.mkString(" +\n")
        s"""WITH p AS (
           |  SELECT c_custkey,
           |    ${Spatial.lonSql("c_custkey")} AS px,
           |    ${Spatial.latSql("c_custkey")} AS py
           |  FROM customer),
           |x AS (SELECT c_custkey,
           |  $edges AS n_crossings
           |  FROM p)
           |SELECT c_custkey, CAST(n_crossings AS BIGINT) AS n_crossings,
           |  CAST(n_crossings % 2 AS BIGINT) AS inside
           |FROM x ORDER BY c_custkey""".stripMargin
      }),

    // Union-of-intervals covered time per event type (sessions with a
    // deterministic synthetic duration): the two-phase sweep with the
    // two-phase form of LEAD (partition heads patch the successor of
    // each partition's last row) — oracle is the single-window sweep.
    Q("q191_covered_time",
      (s, d) => {
        import s.implicits._
        val iv = Tables.events(s, d).select($"event_type".as("grp"),
          expr("cast(ts as long)").as("start"),
          expr("cast(ts as long) + 300 + event_id % 900").as("end"))
        Sweep.coveredTime(iv).orderBy($"grp")
      },
      Some("""WITH iv AS (
             |  SELECT event_type AS grp,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
             |      + 300 + event_id % 900 AS e
             |  FROM events),
             |d AS (SELECT grp, s AS t, 1 AS delta FROM iv
             |      UNION ALL SELECT grp, e, -1 FROM iv),
             |w AS (SELECT grp, t, delta,
             |        sum(delta) OVER (PARTITION BY grp ORDER BY t, delta
             |          ROWS UNBOUNDED PRECEDING) AS run,
             |        lead(t) OVER (PARTITION BY grp ORDER BY t, delta) AS nt
             |      FROM d),
             |c AS (SELECT grp, count(*) AS n FROM iv GROUP BY 1)
             |SELECT w.grp, CAST(c.n AS BIGINT) AS n_intervals,
             |  CAST(sum(CASE WHEN run > 0 THEN nt - t ELSE 0 END) AS BIGINT)
             |    AS covered
             |FROM w JOIN c ON c.grp = w.grp
             |GROUP BY w.grp, c.n ORDER BY w.grp""".stripMargin)),

    // Month-over-month revenue growth per segment in micro-units: the
    // period-comparison window over the calendar-bounded month table;
    // the growth ratio is the shared round(CAST AS DOUBLE) shape (the
    // delta can be negative — div/// would diverge).
    Q("q192_mom_growth",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val m = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment".as("segment"),
            date_format($"o_orderdate", "yyyy-MM").as("month"))
          .agg(graft.core.Exact.centsSum($"o_totalprice").as("rev_cents"))
        val w = Window.partitionBy($"segment").orderBy($"month")
        m.withColumn("prev_cents", lag($"rev_cents", 1).over(w))
          .withColumn("growth_micro", when($"prev_cents".isNotNull,
            round(($"rev_cents" - $"prev_cents").cast("double") * 1000000.0
              / $"prev_cents".cast("double"), 0).cast("long")))
          .orderBy($"segment", $"month")
      },
      Some("""WITH m AS (
             |  SELECT c_mktsegment AS segment,
             |    strftime(o_orderdate, '%Y-%m') AS month,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |      AS rev_cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |w AS (SELECT segment, month, rev_cents,
             |        lag(rev_cents) OVER (PARTITION BY segment ORDER BY month)
             |          AS prev_cents
             |      FROM m)
             |SELECT segment, month, rev_cents, prev_cents,
             |  CASE WHEN prev_cents IS NOT NULL THEN
             |    CAST(round(CAST(rev_cents - prev_cents AS DOUBLE) * 1000000.0
             |               / CAST(prev_cents AS DOUBLE)) AS BIGINT) END
             |    AS growth_micro
             |FROM w ORDER BY segment, month""".stripMargin)),

    // Benford first-digit profile of order values — the data-quality
    // smoke test; observed share vs ln-shape expectation, both
    // micro-rounded through identical expression shapes.
    Q("q193_benford_digits",
      (s, d) => {
        import s.implicits._
        graft.ops.Drift.benfordProfile(
            Tables.orders(s, d).select(
              round($"o_totalprice" * 100, 0).cast("long").as("cents")),
            "cents")
          .orderBy($"digit")
      },
      Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |    AS cents FROM orders),
             |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
             |        AS digit, count(*) AS n
             |      FROM c WHERE cents > 0 GROUP BY 1),
             |t AS (SELECT digit, n, sum(n) OVER () AS total FROM d)
             |SELECT digit, CAST(n AS BIGINT) AS n,
             |  CAST(round(CAST(n AS DOUBLE) * 1000000.0
             |             / CAST(total AS DOUBLE)) AS BIGINT) AS share_micro,
             |  CAST(round((ln(CAST(digit + 1 AS DOUBLE)) - ln(CAST(digit AS DOUBLE)))
             |             / ln(CAST(10 AS DOUBLE)) * 1000000.0) AS BIGINT)
             |    AS benford_micro,
             |  CAST(round(CAST(n AS DOUBLE) * 1000000.0 / CAST(total AS DOUBLE))
             |    AS BIGINT)
             |  - CAST(round((ln(CAST(digit + 1 AS DOUBLE)) - ln(CAST(digit AS DOUBLE)))
             |               / ln(CAST(10 AS DOUBLE)) * 1000000.0) AS BIGINT)
             |    AS dev_micro
             |FROM t ORDER BY digit""".stripMargin)),

    // Top-20 collocations by pointwise mutual information over
    // adjacent token pairs (min pair count 5) — micro-nat PMI from
    // exact integer counts through ONE shared ln shape; global top-k
    // via TakeOrdered.
    Q("q194_pmi_collocations",
      (s, d) => {
        import s.implicits._
        LangModel.pmiCollocations(Tables.documents(s, d), "text",
            k = 20, minCount = 5L)
          .orderBy($"pmi_micro".desc, $"w1", $"w2")
      },
      Some("""WITH toks AS (
             |  SELECT string_split_regex(trim(text), '\s+') AS l FROM documents),
             |u AS (SELECT unnest(l) AS w FROM toks),
             |uni AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
             |bg AS (
             |  SELECT (p).p1 AS w1, (p).p2 AS w2 FROM (
             |    SELECT unnest(list_filter(
             |      list_transform(l, (x, i) ->
             |        CASE WHEN i <= len(l) - 1 THEN {'p1': x, 'p2': l[i+1]} END),
             |      v -> v IS NOT NULL)) AS p
             |    FROM toks)),
             |bi AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
             |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
             |nb AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM bi)
             |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
             |  CAST(round(ln(CAST(c12 AS DOUBLE)
             |      * CAST((SELECT n FROM n1) AS DOUBLE)
             |      * CAST((SELECT n FROM n1) AS DOUBLE)
             |      / (CAST((SELECT n FROM nb) AS DOUBLE)
             |         * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
             |    * 1000000) AS BIGINT) AS pmi_micro
             |FROM bi JOIN uni u1 ON u1.w = w1 JOIN uni u2 ON u2.w = w2
             |WHERE c12 >= 5
             |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin)),

    // SEGMENTED capped inventory — q188's recurrence through the
    // chunked max-plus composition (chunk=16): per-(key,chunk) parallel
    // partial folds, then a per-key fold over n/16 summary structs. The
    // composition is exact, so the ORACLE IS THE PLAIN SEQUENTIAL FOLD
    // — a green row proves segmented ≡ sequential cross-engine, the
    // million-event-key scale path for every per-key recurrence.
    Q("q195_capped_inventory_segmented",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_partkey".as("pk"),
          $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
          when($"l_returnflag" === "R", $"l_quantity")
            .otherwise(-$"l_quantity").cast("long").as("delta"))
        graft.ops.TimeSeries.cappedRunningSumSegmented(li, "pk",
            Seq("sec", "ok", "ln"), "delta", chunk = 16)
          .select($"key".as("partkey"), $"n_moves", $"final_level")
          .orderBy($"partkey")
      },
      Some("""WITH li AS (
             |  SELECT l_partkey AS pk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
             |              ELSE -l_quantity END AS BIGINT) AS delta
             |  FROM lineitem),
             |l AS (SELECT pk, count(*) AS n_moves,
             |        list(delta ORDER BY sec, ok, ln, delta) AS ds
             |      FROM li GROUP BY 1)
             |SELECT pk AS partkey, CAST(n_moves AS BIGINT) AS n_moves,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT), ds),
             |              (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
             |    AS final_level
             |FROM l ORDER BY partkey""".stripMargin)),

    // Segmented fixed-point EMA (alpha=3/8, chunk=4): one truncating
    // division per CHUNK via the exact integer affine map
    // (A,B,D) = ((den-num)^c, Σ num·xᵢ·(den-num)^{c-i}·den^{i-1}, den^c)
    // — the oracle replays the identical chunked fold with DuckDB
    // nested list_reduce over struct accumulators, bit-identical.
    Q("q196_ema_segmented",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_custkey".as("cust"),
          $"o_orderdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"o_orderkey".as("okey"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        graft.ops.TimeSeries.emaSegmentedFixedPoint(o, "cust",
            Seq("sec", "okey"), "cents", num = 3L, den = 8L, chunk = 4)
          .select($"key".as("custkey"), $"n", $"ema_seg".as("ema_cents"))
          .orderBy($"custkey")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust,
             |    epoch_us(o_orderdate) // 1000000 AS sec,
             |    o_orderkey AS okey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |l AS (SELECT cust, count(*) AS n,
             |        list(cents ORDER BY sec, okey, cents) AS vals
             |      FROM o GROUP BY 1),
             |p AS (SELECT cust, n, vals[1] AS seed, vals[2:] AS rest FROM l),
             |ch AS (SELECT cust, n, seed,
             |        list_transform(range(0, CAST(ceil(len(rest)/4.0) AS INT)),
             |          i -> rest[i*4+1 : least((i+1)*4, len(rest))]) AS chunks
             |      FROM p),
             |m AS (SELECT cust, n, seed,
             |        list_transform(chunks, ck ->
             |          list_reduce(
             |            list_prepend({'a': CAST(1 AS BIGINT),
             |                'b': CAST(0 AS BIGINT), 'd': CAST(1 AS BIGINT)},
             |              list_transform(ck, x -> {'a': CAST(x AS BIGINT),
             |                'b': CAST(0 AS BIGINT), 'd': CAST(0 AS BIGINT)})),
             |            (acc, x) -> {'a': 5*acc.a,
             |                         'b': 5*acc.b + 3*x.a*acc.d,
             |                         'd': 8*acc.d})) AS maps
             |      FROM ch)
             |SELECT cust AS custkey, CAST(n AS BIGINT) AS n,
             |  list_reduce(
             |    list_prepend({'a': CAST(0 AS BIGINT), 'b': CAST(seed AS BIGINT),
             |                  'd': CAST(1 AS BIGINT)}, maps),
             |    (acc, mm) -> {'a': CAST(0 AS BIGINT),
             |                  'b': (mm.a * acc.b + mm.b) // mm.d,
             |                  'd': CAST(1 AS BIGINT)}).b AS ema_cents
             |FROM m ORDER BY custkey""".stripMargin)),

    // Holt linear (level+trend) smoothing, segmented: each 4-value
    // chunk composes into ONE exact integer 2x2 affine map with no
    // intermediate division (matrix entries from the closed form
    // S^k — the per-step matrix is constant, only the offset carries
    // the data); chunks then apply sequentially with a shared
    // round(x/d) per component (trend numerators go negative, where
    // div/floor diverge across engines — the q130 lesson). The oracle
    // replays the same closed form and walks the chunk chain with a
    // recursive CTE carrying (level, trend) as plain columns —
    // DuckDB's struct-typed list_reduce accumulators evaluate fields
    // against a partially-updated struct, so cross-field recurrences
    // must never fold through one.
    Q("q343_holt_segmented",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_custkey".as("cust"),
          $"o_orderdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"o_orderkey".as("okey"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        graft.ops.TimeSeries.holtSegmentedFixedPoint(o, "cust",
            Seq("sec", "okey"), "cents", na = 1L, da = 4L, nb = 1L,
            db = 4L, chunk = 4)
          .select($"key".as("custkey"), $"n", $"level_end", $"trend_end")
          .orderBy($"custkey")
      },
      Some("""WITH RECURSIVE o AS (
             |  SELECT o_custkey AS cust,
             |    epoch_us(o_orderdate) // 1000000 AS sec,
             |    o_orderkey AS okey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |lh AS (SELECT cust, count(*) AS n,
             |        list(cents ORDER BY sec, okey, cents) AS vals
             |      FROM o GROUP BY 1),
             |ph AS (SELECT cust, n, vals[1] AS seed, vals[2:] AS rest FROM lh),
             |chh AS (SELECT cust, n, seed,
             |        list_transform(range(0, CAST(ceil(len(rest)/4.0) AS INT)),
             |          i -> rest[i*4+1 : least((i+1)*4, len(rest))]) AS chunks
             |      FROM ph),
             |mr AS (
             |  SELECT cust, (u).i AS i, len((u).ck) AS c, (u).ck AS ck
             |  FROM (SELECT cust, unnest(list_transform(chunks,
             |          (ck, i) -> {'i': CAST(i - 1 AS BIGINT), 'ck': ck})) AS u
             |        FROM chh)),
             |mm AS (
             |  SELECT cust, i,
             |    CASE c WHEN 1 THEN 12 WHEN 2 THEN 132 WHEN 3 THEN 1260 ELSE 8676 END AS a11,
             |    CASE c WHEN 1 THEN 12 WHEN 2 THEN 324 WHEN 3 THEN 6444 ELSE 111780 END AS a12,
             |    CASE c WHEN 1 THEN -1 WHEN 2 THEN -27 WHEN 3 THEN -537 ELSE -9315 END AS a21,
             |    CASE c WHEN 1 THEN 15 WHEN 2 THEN 213 WHEN 3 THEN 2871 ELSE 36621 END AS a22,
             |    CASE c WHEN 1 THEN 16 WHEN 2 THEN 256 WHEN 3 THEN 4096 ELSE 65536 END AS d,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ck, (x, j) ->
             |      (CASE j WHEN 1 THEN 1 WHEN 2 THEN 16 WHEN 3 THEN 256 ELSE 4096 END)
             |      * ((CASE c - j WHEN 0 THEN 1 WHEN 1 THEN 12 WHEN 2 THEN 132 ELSE 1260 END) * 4
             |       + (CASE c - j WHEN 0 THEN 0 WHEN 1 THEN 12 WHEN 2 THEN 324 ELSE 6444 END))
             |      * x)), (pp, v) -> pp + v) AS b1,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ck, (x, j) ->
             |      (CASE j WHEN 1 THEN 1 WHEN 2 THEN 16 WHEN 3 THEN 256 ELSE 4096 END)
             |      * ((CASE c - j WHEN 0 THEN 0 WHEN 1 THEN -1 WHEN 2 THEN -27 ELSE -537 END) * 4
             |       + (CASE c - j WHEN 0 THEN 1 WHEN 1 THEN 15 WHEN 2 THEN 213 ELSE 2871 END))
             |      * x)), (pp, v) -> pp + v) AS b2
             |  FROM mr),
             |nch AS (SELECT cust, CAST(count(*) AS BIGINT) AS nc FROM mr GROUP BY 1),
             |app AS (
             |  SELECT cust, CAST(0 AS BIGINT) AS i, CAST(seed AS BIGINT) AS lv,
             |    CAST(0 AS BIGINT) AS bv
             |  FROM ph
             |  UNION ALL
             |  SELECT a.cust, a.i + 1,
             |    CAST(round(CAST(m.a11*a.lv + m.a12*a.bv + m.b1 AS DOUBLE)
             |      / CAST(m.d AS DOUBLE)) AS BIGINT),
             |    CAST(round(CAST(m.a21*a.lv + m.a22*a.bv + m.b2 AS DOUBLE)
             |      / CAST(m.d AS DOUBLE)) AS BIGINT)
             |  FROM app a JOIN mm m ON m.cust = a.cust AND m.i = a.i),
             |fin AS (
             |  SELECT app.cust, app.lv, app.bv FROM app
             |  JOIN (SELECT ph.cust, coalesce(nch.nc, CAST(0 AS BIGINT)) AS nc
             |        FROM ph LEFT JOIN nch ON nch.cust = ph.cust) k
             |    ON k.cust = app.cust AND app.i = k.nc)
             |SELECT ph.cust AS custkey, CAST(ph.n AS BIGINT) AS n,
             |  fin.lv AS level_end, fin.bv AS trend_end
             |FROM ph JOIN fin ON fin.cust = ph.cust
             |ORDER BY custkey""".stripMargin)),

    // Spearman rank correlation per priority between order value and
    // order date: exact doubled midranks per tied value-cell (the
    // Mann-Whitney discipline), Pearson on rank2 closed with the one
    // shared-double combination (the linearCka shape).
    Q("q351_spearman",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_orderpriority".as("prio"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          $"o_orderdate".cast("timestamp_ltz").cast("long").as("sec"))
        graft.ops.Eval.spearmanByGroup(o, "prio", "cents", "sec")
          .select($"grp".as("prio"), $"n", $"rho_micro")
          .orderBy($"prio")
      },
      Some("""WITH b AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
             |    epoch_us(o_orderdate) // 1000000 AS y
             |  FROM orders),
             |cx AS (SELECT grp, x, CAST(count(*) AS BIGINT) AS m
             |       FROM b GROUP BY 1, 2),
             |rx AS (SELECT grp, x,
             |    2 * (sum(m) OVER (PARTITION BY grp ORDER BY x) - m) + m + 1
             |      AS r_x
             |  FROM cx),
             |cy AS (SELECT grp, y, CAST(count(*) AS BIGINT) AS m
             |       FROM b GROUP BY 1, 2),
             |ry AS (SELECT grp, y,
             |    2 * (sum(m) OVER (PARTITION BY grp ORDER BY y) - m) + m + 1
             |      AS r_y
             |  FROM cy),
             |rk AS (
             |  SELECT b.grp, rx.r_x, ry.r_y
             |  FROM b JOIN rx ON rx.grp = b.grp AND rx.x = b.x
             |  JOIN ry ON ry.grp = b.grp AND ry.y = b.y),
             |mm AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(r_x) AS BIGINT) AS sx, CAST(sum(r_y) AS BIGINT) AS sy,
             |    CAST(sum(r_x * r_x) AS BIGINT) AS sxx,
             |    CAST(sum(r_x * r_y) AS BIGINT) AS sxy,
             |    CAST(sum(r_y * r_y) AS BIGINT) AS syy
             |  FROM rk GROUP BY 1)
             |SELECT grp AS prio, n,
             |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             |      AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
             |    THEN CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |  END AS rho_micro
             |FROM mm ORDER BY prio""".stripMargin)),

    // Mann-Kendall monotone trend per priority: Kendall tau-b between
    // the month index and the monthly order count — the bounded
    // pre-aggregated series contract (pairs quadratic in MONTHS, never
    // facts). C-D is an exact integer pair-sign sum.
    Q("q352_mann_kendall",
      (s, d) => {
        import s.implicits._
        val m = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("prio"),
            trunc(to_date($"o_orderdate"), "month").as("mon"))
          .agg(count(lit(1)).as("cnt"))
          .select($"prio",
            (year($"mon") * 12 + month($"mon")).cast("long").as("mi"),
            $"cnt")
        graft.ops.Eval.kendallTauB(m, "prio", "mi", "cnt", "mi")
          .select($"grp".as("prio"), $"n", $"cd", $"tau_micro")
          .orderBy($"prio")
      },
      Some("""WITH m AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(year(date_trunc('month', o_orderdate)) * 12
             |      + month(date_trunc('month', o_orderdate)) AS BIGINT) AS mi,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM orders GROUP BY 1, 2),
             |p AS (
             |  SELECT a.grp, CAST(count(*) AS BIGINT) AS n0,
             |    CAST(sum(CAST(sign(CAST(b.mi - a.mi AS DOUBLE)) AS BIGINT)
             |      * CAST(sign(CAST(b.cnt - a.cnt AS DOUBLE)) AS BIGINT))
             |      AS BIGINT) AS cd
             |  FROM m a JOIN m b ON a.grp = b.grp AND a.mi < b.mi
             |  GROUP BY 1),
             |tx AS (SELECT grp, CAST(sum(mm * (mm - 1) // 2) AS BIGINT) AS t_x
             |  FROM (SELECT grp, mi, CAST(count(*) AS BIGINT) AS mm
             |        FROM m GROUP BY 1, 2) GROUP BY 1),
             |ty AS (SELECT grp, CAST(sum(mm * (mm - 1) // 2) AS BIGINT) AS t_y
             |  FROM (SELECT grp, cnt, CAST(count(*) AS BIGINT) AS mm
             |        FROM m GROUP BY 1, 2) GROUP BY 1),
             |nr AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1)
             |SELECT nr.grp AS prio, nr.n, p.cd,
             |  CASE WHEN p.n0 - tx.t_x > 0 AND p.n0 - ty.t_y > 0
             |    THEN CAST(round(CAST(p.cd AS DOUBLE)
             |      / sqrt(CAST(p.n0 - tx.t_x AS DOUBLE)
             |        * CAST(p.n0 - ty.t_y AS DOUBLE))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |  END AS tau_micro
             |FROM nr JOIN p ON p.grp = nr.grp
             |JOIN tx ON tx.grp = nr.grp JOIN ty ON ty.grp = nr.grp
             |ORDER BY prio""".stripMargin)),

    // Classical additive decomposition of the monthly order-count
    // series per priority: centered 2x12 MA trend (exact integer
    // numerator, one shared milli division), month-of-year seasonal
    // index over the detrended values, integer remainder.
    Q("q353_seasonal_decompose",
      (s, d) => {
        import s.implicits._
        val m = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("prio"),
            trunc(to_date($"o_orderdate"), "month").as("mon"))
          .agg(count(lit(1)).as("cnt"))
          .select($"prio",
            (year($"mon") * 12 + month($"mon")).cast("long").as("mi"),
            $"cnt")
        graft.ops.TimeSeries.classicalDecompose(m, "prio", "mi", "cnt",
            period = 12)
          .select($"key".as("prio"), $"t".as("mi"), $"y".as("cnt"),
            $"trend_milli", $"seasonal_milli", $"remainder_milli")
          .orderBy($"prio", $"mi")
      },
      Some("""WITH m AS (
             |  SELECT o_orderpriority AS prio,
             |    CAST(year(date_trunc('month', o_orderdate)) * 12
             |      + month(date_trunc('month', o_orderdate)) AS BIGINT) AS mi,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM orders GROUP BY 1, 2),
             |tr AS (
             |  SELECT prio, mi, cnt,
             |    CASE WHEN count(cnt) OVER w1 = 12 AND count(cnt) OVER w2 = 12
             |      THEN CAST(round(CAST(sum(cnt) OVER w1 + sum(cnt) OVER w2
             |        AS DOUBLE) * CAST(1000 AS DOUBLE)
             |        / CAST(24 AS DOUBLE)) AS BIGINT)
             |    END AS trend_milli
             |  FROM m
             |  WINDOW w1 AS (PARTITION BY prio ORDER BY mi
             |    ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING),
             |  w2 AS (PARTITION BY prio ORDER BY mi
             |    ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)),
             |se AS (
             |  SELECT prio, mi % 12 AS moy,
             |    CAST(round(CAST(sum(cnt * 1000 - trend_milli) AS DOUBLE)
             |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS seasonal_milli
             |  FROM tr WHERE trend_milli IS NOT NULL GROUP BY 1, 2)
             |SELECT tr.prio, tr.mi, tr.cnt, tr.trend_milli,
             |  se.seasonal_milli,
             |  CASE WHEN tr.trend_milli IS NOT NULL
             |    THEN tr.cnt * 1000 - tr.trend_milli - se.seasonal_milli
             |  END AS remainder_milli
             |FROM tr LEFT JOIN se
             |  ON se.prio = tr.prio AND se.moy = tr.mi % 12
             |ORDER BY tr.prio, tr.mi""".stripMargin)),

    // Wald SPRT early-stopping monitor per variant: H0 p=0.15 vs H1
    // p=0.20 over the time-ordered purchase stream, α=0.05, β=0.10.
    // The engine derives every crossing from the CONVERSION-ROW table
    // (two-phase ranks + a k+1 equi-join — no window over the raw
    // stream); the oracle brute-forces the cumulative LLR walk.
    Q("q357_sprt",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d).select(
          ($"user_id" % 2).cast("long").as("variant"),
          $"ts".cast("long").as("sec"), $"event_id",
          ($"event_type" === "purchase").as("cv"))
        graft.ops.Eval.sprtDecision(e, "variant", Seq("sec", "event_id"),
            $"cv", p0Micro = 150000L, p1Micro = 200000L,
            alphaMilli = 50L, betaMilli = 100L)
          .orderBy($"variant")
      },
      Some("""WITH e AS (
             |  SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec, event_id,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cv
             |  FROM events),
             |con AS (SELECT
             |  CAST(round(ln(CAST(200000 AS DOUBLE) / CAST(150000 AS DOUBLE))
             |    * 1000000) AS BIGINT) AS a,
             |  CAST(round(ln((CAST(1000000 AS DOUBLE) - CAST(200000 AS DOUBLE))
             |      / (CAST(1000000 AS DOUBLE) - CAST(150000 AS DOUBLE)))
             |    * 1000000) AS BIGINT) AS b,
             |  CAST(round(ln((CAST(1000 AS DOUBLE) - CAST(100 AS DOUBLE))
             |      / CAST(50 AS DOUBLE)) * 1000000) AS BIGINT) AS biga,
             |  CAST(round(ln(CAST(100 AS DOUBLE)
             |      / (CAST(1000 AS DOUBLE) - CAST(50 AS DOUBLE)))
             |    * 1000000) AS BIGINT) AS bigb),
             |w AS (
             |  SELECT variant, cv,
             |    CAST(row_number() OVER ww AS BIGINT) AS n,
             |    CAST(sum(cv) OVER (ww ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS k
             |  FROM e WINDOW ww AS (PARTITION BY variant ORDER BY sec, event_id)),
             |l AS (SELECT variant, n, k,
             |    a * k + b * (n - k) AS llr FROM w CROSS JOIN con),
             |h1 AS (SELECT variant, CAST(min(n) AS BIGINT) AS pos
             |  FROM l CROSS JOIN con WHERE llr >= biga GROUP BY 1),
             |h0 AS (SELECT variant, CAST(min(n) AS BIGINT) AS pos
             |  FROM l CROSS JOIN con WHERE llr <= bigb GROUP BY 1),
             |tot AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_obs,
             |  CAST(sum(cv) AS BIGINT) AS n_conv FROM e GROUP BY 1),
             |dec AS (
             |  SELECT tot.variant, n_obs, n_conv,
             |    CASE WHEN h1.pos IS NOT NULL
             |        AND (h0.pos IS NULL OR h1.pos < h0.pos) THEN 'h1'
             |      WHEN h0.pos IS NOT NULL THEN 'h0'
             |      ELSE 'continue' END AS decision,
             |    CASE WHEN h1.pos IS NOT NULL
             |        AND (h0.pos IS NULL OR h1.pos < h0.pos) THEN h1.pos
             |      ELSE h0.pos END AS decide_at
             |  FROM tot LEFT JOIN h1 ON h1.variant = tot.variant
             |  LEFT JOIN h0 ON h0.variant = tot.variant)
             |SELECT dec.variant, dec.n_obs, dec.n_conv, dec.decision,
             |  dec.decide_at,
             |  CAST(coalesce(l.llr, con.a * dec.n_conv
             |    + con.b * (dec.n_obs - dec.n_conv)) AS BIGINT) AS llr_micro
             |FROM dec CROSS JOIN con
             |LEFT JOIN l ON l.variant = dec.variant AND l.n = dec.decide_at
             |ORDER BY dec.variant""".stripMargin)),

    // Empirical-Bayes shrinkage of per-user purchase rates toward the
    // pooled mean: method-of-moments beta prior (between-user variance
    // terms micro-rounded before the sum), nu = max(1, m(1-m)/s^2 - 1).
    Q("q358_eb_shrinkage",
      (s, d) => {
        import s.implicits._
        graft.ops.Eval.ebShrunkRates(Tables.events(s, d), "user_id",
            $"event_type" === "purchase")
          .select($"key".as("user_id"), $"n", $"k", $"raw_micro",
            $"shrunk_micro")
          .orderBy($"user_id")
      },
      Some("""WITH per AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS k
             |  FROM events GROUP BY 1),
             |pool AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
             |  CAST(sum(k) AS BIGINT) AS tk FROM per),
             |wm AS (
             |  SELECT per.*, CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE) AS m, tn,
             |    CAST(round(CAST(n AS DOUBLE)
             |      * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE))
             |      * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS t_micro
             |  FROM per CROSS JOIN pool),
             |sv AS (SELECT CAST(sum(t_micro) AS BIGINT) AS ts FROM wm)
             |SELECT user_id, n, k,
             |  CAST(round(CAST(k AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |    / CAST(n AS DOUBLE)) AS BIGINT) AS raw_micro,
             |  CAST(round((CAST(k AS DOUBLE) + m * nu)
             |    / (CAST(n AS DOUBLE) + nu) * CAST(1000000 AS DOUBLE))
             |    AS BIGINT) AS shrunk_micro
             |FROM (
             |  SELECT wm.*, greatest(CAST(1.0 AS DOUBLE),
             |      m * (CAST(1.0 AS DOUBLE) - m)
             |        / (CAST(ts AS DOUBLE) / CAST(1000000 AS DOUBLE)
             |          / CAST(tn AS DOUBLE))
             |      - CAST(1.0 AS DOUBLE)) AS nu
             |  FROM wm CROSS JOIN sv)
             |ORDER BY user_id""".stripMargin)),

    // Post-stratification (g-computation) ATE: per-nation treated vs
    // control order-value difference, stratum-size weighted — the
    // standardization estimator. Strata missing either arm drop out.
    Q("q359_poststrat_ate",
      (s, d) => {
        import s.implicits._
        val df = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .select($"c_nationkey".as("nat"), $"c_custkey",
            round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        graft.ops.Causal.postStratifiedAte(df, "nat",
          $"c_custkey" % 2 === 0, $"cents")
      },
      Some("""WITH b AS (
             |  SELECT c_nationkey AS st, c_custkey % 2 = 0 AS t,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |w AS (
             |  SELECT st, CAST(count(*) AS BIGINT) AS n_s,
             |    CAST(sum(CASE WHEN t THEN 1 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN t THEN c END) AS BIGINT) AS s1,
             |    CAST(sum(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN NOT t THEN c END) AS BIGINT) AS s0
             |  FROM b GROUP BY 1),
             |sup AS (
             |  SELECT *, CAST(round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |    * CAST(10 AS DOUBLE)) AS BIGINT) AS diff_milli
             |  FROM w WHERE n1 IS NOT NULL AND n0 IS NOT NULL),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             |  CAST(sum(n_s) AS BIGINT) AS n_rows FROM w)
             |SELECT n_strata, CAST(count(*) AS BIGINT) AS n_used, n_rows,
             |  CAST(sum(n_s) AS BIGINT) AS n_supported,
             |  CAST(round(CAST(sum(diff_milli * n_s) AS DOUBLE)
             |    / CAST(sum(n_s) AS DOUBLE)) AS BIGINT) AS ate_milli
             |FROM sup CROSS JOIN tot
             |GROUP BY n_strata, n_rows""".stripMargin)),

    // Survey raking (IPF) of the event (type x iso-weekday) count
    // table to uniform row/column targets: 3 full rounds, every scale
    // factor one shared double micro-rounded — both engines walk
    // identical integer weight tables (the reference's survey-weighting
    // step, distributed).
    Q("q360_raking_ipf",
      (s, d) => {
        import s.implicits._
        val counts = Tables.events(s, d)
          .select($"event_type".as("r"),
            (weekday($"ts".cast("date")) + 1).cast("long").as("c"))
          .groupBy($"r", $"c").agg(count(lit(1)).as("n"))
        val tot = counts.agg((sum($"n") * 1000000L).as("w"),
          countDistinct($"r").as("nr"), countDistinct($"c").as("nc"))
        val rowT = counts.select($"r").distinct().crossJoin(broadcast(tot))
          .select($"r", expr("w div nr").as("target_micro"))
        val colT = counts.select($"c").distinct().crossJoin(broadcast(tot))
          .select($"c", expr("w div nc").as("target_micro"))
        graft.ops.Causal.rake2Way(counts, rowT, colT, iters = 3)
          .orderBy($"r", $"c")
      },
      Some("""WITH e AS (
             |  SELECT event_type AS r,
             |    CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS c
             |  FROM events),
             |cnt AS (SELECT r, c, CAST(count(*) AS BIGINT) AS n
             |        FROM e GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(n) * 1000000 AS BIGINT) AS w,
             |  CAST(count(DISTINCT r) AS BIGINT) AS nr,
             |  CAST(count(DISTINCT c) AS BIGINT) AS nc FROM cnt),
             |rt AS (SELECT DISTINCT r, (SELECT w // nr FROM tot) AS rt FROM cnt),
             |ct AS (SELECT DISTINCT c, (SELECT w // nc FROM tot) AS ct FROM cnt),
             |w0 AS (SELECT r, c, n, CAST(n * 1000000 AS BIGINT) AS w FROM cnt),
             |r1 AS (SELECT w0.r, w0.c, n, CAST(round(CAST(w AS DOUBLE)
             |    * (CAST(rt AS DOUBLE) / CAST(rs AS DOUBLE))) AS BIGINT) AS w
             |  FROM w0
             |  JOIN (SELECT r, CAST(sum(w) AS BIGINT) AS rs FROM w0 GROUP BY 1) s
             |    ON s.r = w0.r
             |  JOIN rt ON rt.r = w0.r),
             |c1 AS (SELECT r1.r, r1.c, n, CAST(round(CAST(w AS DOUBLE)
             |    * (CAST(ct AS DOUBLE) / CAST(cs AS DOUBLE))) AS BIGINT) AS w
             |  FROM r1
             |  JOIN (SELECT c, CAST(sum(w) AS BIGINT) AS cs FROM r1 GROUP BY 1) s
             |    ON s.c = r1.c
             |  JOIN ct ON ct.c = r1.c),
             |r2 AS (SELECT c1.r, c1.c, n, CAST(round(CAST(w AS DOUBLE)
             |    * (CAST(rt AS DOUBLE) / CAST(rs AS DOUBLE))) AS BIGINT) AS w
             |  FROM c1
             |  JOIN (SELECT r, CAST(sum(w) AS BIGINT) AS rs FROM c1 GROUP BY 1) s
             |    ON s.r = c1.r
             |  JOIN rt ON rt.r = c1.r),
             |c2 AS (SELECT r2.r, r2.c, n, CAST(round(CAST(w AS DOUBLE)
             |    * (CAST(ct AS DOUBLE) / CAST(cs AS DOUBLE))) AS BIGINT) AS w
             |  FROM r2
             |  JOIN (SELECT c, CAST(sum(w) AS BIGINT) AS cs FROM r2 GROUP BY 1) s
             |    ON s.c = r2.c
             |  JOIN ct ON ct.c = r2.c),
             |r3 AS (SELECT c2.r, c2.c, n, CAST(round(CAST(w AS DOUBLE)
             |    * (CAST(rt AS DOUBLE) / CAST(rs AS DOUBLE))) AS BIGINT) AS w
             |  FROM c2
             |  JOIN (SELECT r, CAST(sum(w) AS BIGINT) AS rs FROM c2 GROUP BY 1) s
             |    ON s.r = c2.r
             |  JOIN rt ON rt.r = c2.r),
             |c3 AS (SELECT r3.r, r3.c, n, CAST(round(CAST(w AS DOUBLE)
             |    * (CAST(ct AS DOUBLE) / CAST(cs AS DOUBLE))) AS BIGINT) AS w
             |  FROM r3
             |  JOIN (SELECT c, CAST(sum(w) AS BIGINT) AS cs FROM r3 GROUP BY 1) s
             |    ON s.c = r3.c
             |  JOIN ct ON ct.c = r3.c)
             |SELECT r, c, n, w AS w_micro FROM c3 ORDER BY r, c""".stripMargin)),

    // Robust location estimates per priority: 5%-per-tail trimmed and
    // winsorized means of order value, exact integer rank cutoffs from
    // two-phase ranks, one shared division each.
    Q("q361_robust_means",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_orderpriority".as("prio"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          $"o_orderkey")
        graft.ops.Eval.robustMeans(o, "prio", "cents", "o_orderkey",
            qMilli = 50L)
          .select($"grp".as("prio"), $"n", $"k_tail", $"mean_milli",
            $"trimmed_milli", $"winsor_milli")
          .orderBy($"prio")
      },
      Some("""WITH b AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             |    o_orderkey AS tb
             |  FROM orders),
             |r AS (SELECT grp, v,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY v, tb)
             |      AS BIGINT) AS r
             |  FROM b),
             |nt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(v) AS BIGINT) AS sv,
             |    CAST((count(*) * 50) // 1000 AS BIGINT) AS k
             |  FROM b GROUP BY 1),
             |mid AS (
             |  SELECT r.grp, CAST(sum(v) AS BIGINT) AS mid_sum,
             |    CAST(count(*) AS BIGINT) AS mid_n
             |  FROM r JOIN nt ON nt.grp = r.grp
             |  WHERE r.r > nt.k AND r.r <= nt.n - nt.k GROUP BY 1),
             |lo AS (SELECT r.grp, v AS v_lo FROM r JOIN nt ON nt.grp = r.grp
             |       WHERE r.r = nt.k + 1),
             |hi AS (SELECT r.grp, v AS v_hi FROM r JOIN nt ON nt.grp = r.grp
             |       WHERE r.r = nt.n - nt.k)
             |SELECT nt.grp AS prio, nt.n, nt.k AS k_tail,
             |  CAST(round(CAST(sv AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(nt.n AS DOUBLE)) AS BIGINT) AS mean_milli,
             |  CAST(round(CAST(mid_sum AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(mid_n AS DOUBLE)) AS BIGINT) AS trimmed_milli,
             |  CAST(round(CAST(mid_sum + nt.k * v_lo + nt.k * v_hi AS DOUBLE)
             |    * CAST(1000 AS DOUBLE)
             |    / CAST(nt.n AS DOUBLE)) AS BIGINT) AS winsor_milli
             |FROM nt JOIN mid ON mid.grp = nt.grp
             |JOIN lo ON lo.grp = nt.grp JOIN hi ON hi.grp = nt.grp
             |ORDER BY prio""".stripMargin)),

    // First/last-touch attribution: each purchase credits the first
    // and last click by the same user within 24h — per-user equi-join
    // + partial-aggregating argmin/argmax, no window over the stream.
    Q("q362_touch_attribution",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.touchAttribution(Tables.events(s, d),
            convType = "purchase", touchType = "click",
            windowSec = 86400L)
          .orderBy($"conv_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id AS u, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
             |    event_type,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |cv AS (SELECT u, event_id AS conv_id, sec AS conv_sec, cents
             |       FROM e WHERE event_type = 'purchase'),
             |tc AS (SELECT u, event_id AS t_id, sec AS t_sec
             |       FROM e WHERE event_type = 'click'),
             |iw AS (
             |  SELECT cv.conv_id, tc.t_id, tc.t_sec
             |  FROM cv JOIN tc ON tc.u = cv.u
             |  WHERE tc.t_sec <= cv.conv_sec
             |    AND tc.t_sec > cv.conv_sec - 86400),
             |cr AS (
             |  SELECT conv_id,
             |    arg_min(t_id, CAST(t_sec * 1000000000 + t_id AS BIGINT))
             |      AS first_touch_id,
             |    arg_max(t_id, CAST(t_sec * 1000000000 + t_id AS BIGINT))
             |      AS last_touch_id,
             |    CAST(count(*) AS BIGINT) AS n_touches
             |  FROM iw GROUP BY 1)
             |SELECT cv.conv_id, cv.conv_sec, cv.cents,
             |  cr.first_touch_id, cr.last_touch_id,
             |  coalesce(cr.n_touches, 0) AS n_touches
             |FROM cv LEFT JOIN cr ON cr.conv_id = cv.conv_id
             |ORDER BY cv.conv_id""".stripMargin)),

    // Uplift (Qini) decile table: users scored by activity volume,
    // treated = even user id, converted = any purchase. Per-decile
    // uplift plus the cumulative Qini curve from the top decile down.
    Q("q363_uplift_qini",
      (s, d) => {
        import s.implicits._
        val per = Tables.events(s, d).groupBy($"user_id")
          .agg(count(lit(1)).as("sc"),
            max(when($"event_type" === "purchase", 1L).otherwise(0L))
              .as("cvl"))
        graft.ops.Causal.upliftDeciles(per, "user_id", $"sc",
            $"user_id" % 2 === 0, $"cvl" === 1L)
          .orderBy($"bucket")
      },
      Some("""WITH per AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS sc,
             |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cvl
             |  FROM events GROUP BY 1),
             |r AS (SELECT user_id, sc, cvl,
             |    row_number() OVER (ORDER BY sc, user_id) AS rn,
             |    count(*) OVER () AS n
             |  FROM per),
             |bk AS (SELECT user_id, sc, cvl,
             |    CAST(((rn - 1) * 10) // n AS BIGINT) AS bucket FROM r),
             |cells AS (
             |  SELECT bucket,
             |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN user_id % 2 = 0 AND cvl = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN user_id % 2 != 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN user_id % 2 != 0 AND cvl = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c0
             |  FROM bk GROUP BY 1),
             |cum AS (
             |  SELECT *, CAST(sum(n1) OVER wd AS BIGINT) AS cn1,
             |    CAST(sum(c1) OVER wd AS BIGINT) AS cc1,
             |    CAST(sum(n0) OVER wd AS BIGINT) AS cn0,
             |    CAST(sum(c0) OVER wd AS BIGINT) AS cc0
             |  FROM cells
             |  WINDOW wd AS (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING))
             |SELECT bucket, n1, c1, n0, c0,
             |  CASE WHEN n1 > 0 AND n0 > 0 THEN
             |    CAST(round((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT) END AS uplift_micro,
             |  CASE WHEN cn0 > 0 THEN
             |    CAST(round((CAST(cc1 AS DOUBLE) - CAST(cc0 AS DOUBLE)
             |      * (CAST(cn1 AS DOUBLE) / CAST(cn0 AS DOUBLE)))
             |      * CAST(1000 AS DOUBLE)) AS BIGINT) END AS qini_milli
             |FROM cum ORDER BY bucket""".stripMargin)),

    // Delta-method SE for the revenue-per-event ratio metric by
    // variant: six integer sums per variant, then one shared-shape
    // double chain — the cluster-correct ratio readout.
    Q("q364_ratio_delta",
      (s, d) => {
        import s.implicits._
        val units = Tables.events(s, d).groupBy($"user_id")
          .agg(sum(when($"event_type" === "purchase",
              round($"value" * 100, 0).cast("long")).otherwise(0L)).as("x"),
            count(lit(1)).as("y"))
          .select(($"user_id" % 2).as("variant"), $"x", $"y")
        Eval.ratioMetricDelta(units, "variant", $"x", $"y")
          .orderBy($"variant")
      },
      Some("""WITH u AS (
             |  SELECT user_id % 2 AS variant,
             |    CAST(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100, 0) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS x,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY user_id, user_id % 2),
             |a AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM u GROUP BY 1)
             |SELECT variant, n, sx, sy,
             |  CAST(round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)
             |    * 1000000.0) AS BIGINT) AS ratio_micro,
             |  CAST(round(sqrt(greatest((
             |      (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
             |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |        / (CAST(n AS DOUBLE) - 1.0)
             |      - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |        * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
             |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |          / (CAST(n AS DOUBLE) - 1.0))
             |      + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |        * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
             |        * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
             |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |          / (CAST(n AS DOUBLE) - 1.0)))
             |    / (CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 0.0))
             |    * 1000000.0) AS BIGINT) AS se_micro
             |FROM a WHERE n > 1 AND sy > 0 ORDER BY variant""".stripMargin)),

    // Leave-one-clerk-out jackknife SE of global revenue-per-order:
    // totals minus the fold, θ_i micro-rounded BEFORE the exact
    // integer sum of squared deviations (centered on the full θ).
    Q("q365_jackknife_ratio",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(($"o_custkey" % 97).as("fold"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        Eval.jackknifeRatio(o, "fold", $"cents", lit(1L))
      },
      Some("""WITH f AS (
             |  SELECT o_custkey % 97 AS fold,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS sx_i,
             |    CAST(count(*) AS BIGINT) AS sy_i
             |  FROM orders GROUP BY 1),
             |t AS (SELECT CAST(sum(sx_i) AS BIGINT) AS sx,
             |    CAST(sum(sy_i) AS BIGINT) AS sy,
             |    CAST(count(*) AS BIGINT) AS g FROM f),
             |th AS (SELECT g, sx, sy,
             |    CAST(round(CAST(sx - sx_i AS DOUBLE) * 1000.0
             |      / CAST(sy - sy_i AS DOUBLE)) AS BIGINT)
             |    - CAST(round(CAST(sx AS DOUBLE) * 1000.0
             |      / CAST(sy AS DOUBLE)) AS BIGINT) AS dev
             |  FROM f, t WHERE sy - sy_i > 0),
             |a AS (SELECT g, sx, sy, CAST(count(*) AS BIGINT) AS g_eff,
             |    CAST(sum(dev) AS BIGINT) AS sd,
             |    CAST(sum(dev * dev) AS BIGINT) AS sdd
             |  FROM th GROUP BY 1, 2, 3)
             |SELECT g_eff AS n_folds,
             |  CAST(round(CAST(sx AS DOUBLE) * 1000000.0
             |    / CAST(sy AS DOUBLE)) AS BIGINT) AS theta_micro,
             |  CAST(round(sqrt(greatest(
             |    CAST(g_eff - 1 AS DOUBLE) / CAST(g_eff AS DOUBLE)
             |      * (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)
             |        * CAST(sd AS DOUBLE) / CAST(g_eff AS DOUBLE)),
             |    0.0))) AS BIGINT) AS jk_se_milli
             |FROM a""".stripMargin)),

    // ACF lags 1..7 + Ljung-Box Q over the daily order-count series
    // per priority (dense observation index): lag pairs via ONE
    // equi-join, per-term pico-rounded integer sums.
    Q("q366_acf_ljungbox",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("key"),
            to_date($"o_orderdate").as("day"))
          .agg(count(lit(1)).as("x"))
        val idx = daily.withColumn("t",
          row_number().over(Window.partitionBy($"key").orderBy($"day"))
            .cast("long") - 1L)
        graft.ops.TimeSeries.acfLjungBox(idx, "key", "t", "x", maxLag = 7)
          .orderBy($"key", $"lag")
      },
      Some("""WITH dly AS (
             |  SELECT o_orderpriority AS key, CAST(o_orderdate AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM orders GROUP BY 1, 2),
             |ix AS (SELECT key, x,
             |    CAST(row_number() OVER (PARTITION BY key ORDER BY day) - 1
             |      AS BIGINT) AS t
             |  FROM dly),
             |st AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ss
             |  FROM ix GROUP BY 1 HAVING count(*) > 7),
             |hd AS (SELECT key, k, t + k AS t2, x AS xh
             |  FROM ix CROSS JOIN
             |    (SELECT CAST(unnest([1,2,3,4,5,6,7]) AS BIGINT) AS k)),
             |pr AS (SELECT hd.key, k, CAST(count(*) AS BIGINT) AS m,
             |    CAST(sum(xh * xt) AS BIGINT) AS sp,
             |    CAST(sum(xh) AS BIGINT) AS sh,
             |    CAST(sum(xt) AS BIGINT) AS st2
             |  FROM hd JOIN (SELECT key, t AS t2, x AS xt FROM ix) b
             |    ON b.key = hd.key AND b.t2 = hd.t2
             |  GROUP BY 1, 2),
             |pl AS (SELECT pr.key, k, m, n,
             |    CAST(round((CAST(sp AS DOUBLE)
             |        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             |          * (CAST(sh AS DOUBLE) + CAST(st2 AS DOUBLE))
             |        + CAST(m AS DOUBLE)
             |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |      / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
             |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             |      * 1000000.0) AS BIGINT) AS r_micro
             |  FROM pr JOIN st ON st.key = pr.key),
             |tp AS (SELECT *,
             |    CAST(round(CAST(r_micro AS DOUBLE) / 1000000.0
             |      * (CAST(r_micro AS DOUBLE) / 1000000.0)
             |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
             |      * 1000000000000.0) AS BIGINT) AS term_pico
             |  FROM pl),
             |lb AS (SELECT key,
             |    CAST(round(CAST(max(n) AS DOUBLE)
             |      * (CAST(max(n) AS DOUBLE) + 2.0)
             |      * (CAST(sum(term_pico) AS DOUBLE) / 1000000000000.0)
             |      * 1000.0) AS BIGINT) AS lb_q_milli
             |  FROM tp GROUP BY 1)
             |SELECT tp.key, k AS lag, m, r_micro, lb_q_milli
             |FROM tp JOIN lb ON lb.key = tp.key
             |ORDER BY tp.key, lag""".stripMargin)),

    // Two-sample log-rank test: time to first purchase per user (days
    // from first event; censored at last event), even-vs-odd user ids.
    Q("q367_logrank",
      (s, d) => {
        import s.implicits._
        val per = Tables.events(s, d)
          .select($"user_id", $"event_type", $"ts".cast("long").as("sec"))
          .groupBy($"user_id")
          .agg(min($"sec").as("t0"),
            min(when($"event_type" === "purchase", $"sec")).as("tp"),
            max($"sec").as("tl"))
        val subj = per.select(($"user_id" % 2).cast("int").as("side"),
          when($"tp".isNotNull, expr("(tp - t0) div 86400"))
            .otherwise(expr("(tl - t0) div 86400")).as("dur"),
          when($"tp".isNotNull, 1L).otherwise(0L).as("ev"))
        graft.ops.Survival.logRank(subj, "side", "dur", "ev")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
             |  FROM events),
             |per AS (SELECT user_id, CAST(min(sec) AS BIGINT) AS t0,
             |    min(CASE WHEN event_type = 'purchase' THEN sec END) AS tp,
             |    CAST(max(sec) AS BIGINT) AS tl
             |  FROM e GROUP BY 1),
             |subj AS (SELECT user_id % 2 AS side,
             |    CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400
             |         ELSE (tl - t0) // 86400 END AS dur,
             |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
             |  FROM per),
             |cells AS (SELECT dur AS t,
             |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             |    CAST(sum(CASE WHEN side = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
             |    CAST(sum(CASE WHEN side = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0
             |  FROM subj GROUP BY 1),
             |rk AS (SELECT *, CAST(sum(c1) OVER sw AS BIGINT) AS n1t,
             |    CAST(sum(c0) OVER sw AS BIGINT) AS n0t,
             |    d1 + d0 AS dt
             |  FROM cells
             |  WINDOW sw AS (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)),
             |ev2 AS (SELECT *, n1t + n0t AS nt FROM rk WHERE dt > 0),
             |agg AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
             |    CAST(sum(CAST(round(CAST(dt AS DOUBLE) * CAST(n1t AS DOUBLE)
             |      / CAST(nt AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT)
             |      AS e1_micro,
             |    CAST(sum(CAST(round((CASE WHEN nt <= 1 THEN 0.0
             |      ELSE CAST(dt AS DOUBLE)
             |        * (CAST(n1t AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (CAST(n0t AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
             |        / (CAST(nt AS DOUBLE) - 1.0) END) * 1000000.0)
             |      AS BIGINT)) AS BIGINT) AS v_micro
             |  FROM ev2),
             |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c0) AS BIGINT) AS n0 FROM cells)
             |SELECT n1, n0, o1, e1_micro, v_micro,
             |  CAST(round((CAST(o1 AS DOUBLE)
             |      - CAST(e1_micro AS DOUBLE) / 1000000.0)
             |    / sqrt(CAST(v_micro AS DOUBLE) / 1000000.0) * 1000.0)
             |    AS BIGINT) AS z_milli
             |FROM agg, tot""".stripMargin)),

    // PACF via Durbin–Levinson over the q366 ACF: the oracle replays
    // the recursion as a recursive CTE carrying the φ vector as a
    // list, every double op in the identical left-fold order.
    Q("q372_pacf",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("key"),
            to_date($"o_orderdate").as("day"))
          .agg(count(lit(1)).as("x"))
        val idx = daily.withColumn("t",
          row_number().over(Window.partitionBy($"key").orderBy($"day"))
            .cast("long") - 1L)
        graft.ops.TimeSeries.pacfDurbinLevinson(idx, "key", "t", "x",
            maxLag = 7)
          .orderBy($"key", $"lag")
      },
      Some(pacfOracleSql(7)))
  ,

    // Holt-Winters additive seasonal smoothing (p = 7, α = 3/10,
    // β = 1/10, γ = 2/10) over the daily order-count series: the
    // level/trend/seasonal triple recursion, oracle-replayed as a
    // recursive CTE carrying the seasonal vector as a list.
    Q("q373_holt_winters",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("key"),
            to_date($"o_orderdate").as("day"))
          .agg(count(lit(1)).as("x"))
        val idx = daily.withColumn("t",
          row_number().over(Window.partitionBy($"key").orderBy($"day"))
            .cast("long") - 1L)
        graft.ops.TimeSeries.holtWintersAdditive(idx, "key", "t", "x",
            p = 7, na = 3L, da = 10L, nb = 1L, db = 10L, ng = 2L, dg = 10L)
          .orderBy($"key")
      },
      Some(holtWintersOracleSql(p = 7, na = 3, da = 10, nb = 1, db = 10,
        ng = 2, dg = 10)))
  )

  /** DuckDB replica of [[graft.ops.TimeSeries.holtWintersAdditive]] on
    * the daily order-count series: recursive CTE carrying
    * (l, b, seasonal list); each integer numerator is exact, the one
    * double op per component is the shared round(int/int).
    */
  private def holtWintersOracleSql(p: Int, na: Int, da: Int, nb: Int,
      db: Int, ng: Int, dg: Int): String = {
    val lNew = s"""CAST(round(CAST($na * (rl.xs[d.m + 1]
                  |  - d.s[(d.m % $p) + 1])
                  |  + ${da - na} * (d.l + d.b) AS DOUBLE)
                  |  / CAST($da AS DOUBLE)) AS BIGINT)""".stripMargin
    val bNew = s"""CAST(round(CAST($nb * (($lNew) - d.l)
                  |  + ${db - nb} * d.b AS DOUBLE)
                  |  / CAST($db AS DOUBLE)) AS BIGINT)""".stripMargin
    val sUpd = s"""CAST(round(CAST($ng * (rl.xs[d.m + 1] - ($lNew))
                  |  + ${dg - ng} * d.s[(d.m % $p) + 1] AS DOUBLE)
                  |  / CAST($dg AS DOUBLE)) AS BIGINT)""".stripMargin
    s"""WITH RECURSIVE dly AS (
       |  SELECT o_orderpriority AS key, CAST(o_orderdate AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM orders GROUP BY 1, 2),
       |rl AS (SELECT key, list(x ORDER BY day) AS xs
       |  FROM dly GROUP BY 1 HAVING count(*) > $p),
       |b0 AS (SELECT key, xs,
       |    CAST(round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        xs[1:$p]), (a, v) -> a + v) AS DOUBLE)
       |      / CAST($p AS DOUBLE)) AS BIGINT) AS l0
       |  FROM rl),
       |rec AS (
       |  SELECT key, $p AS m, l0 AS l, CAST(0 AS BIGINT) AS b,
       |    list_transform(xs[1:$p], v -> v - l0) AS s
       |  FROM b0
       |  UNION ALL
       |  SELECT d.key, d.m + 1,
       |    $lNew,
       |    $bNew,
       |    list_transform(d.s, (v, i) ->
       |      CASE WHEN i = (d.m % $p) + 1 THEN $sUpd ELSE v END)
       |  FROM rec d JOIN rl ON rl.key = d.key WHERE d.m < len(rl.xs))
       |SELECT rec.key, CAST(len(xs) AS BIGINT) AS n, l AS level_end,
       |  b AS trend_end,
       |  l + b + s[CAST(len(xs) % $p AS BIGINT) + 1] AS forecast1
       |FROM rec JOIN rl ON rl.key = rec.key WHERE m = len(xs)
       |ORDER BY rec.key""".stripMargin
  }

  /** DuckDB replica of [[graft.ops.TimeSeries.pacfDurbinLevinson]] on
    * the daily order-count series: the q366 ACF CTEs, then a recursive
    * CTE carrying (φ list, φ_mm, E) per key — `pm` is inlined at every
    * use site, left-fold sums via list_reduce with a prepended 0.
    */
  private def pacfOracleSql(maxLag: Int): String = {
    val pm = s"""(rl.rs[d.m + 1] - list_reduce(list_prepend(
                |  CAST(0 AS DOUBLE), list_transform(generate_series(1, d.m),
                |    j -> d.phi[j] * rl.rs[d.m + 1 - j])),
                |  (x, y) -> x + y)) / d.e""".stripMargin
    s"""WITH RECURSIVE dly AS (
       |  SELECT o_orderpriority AS key, CAST(o_orderdate AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM orders GROUP BY 1, 2),
       |ix AS (SELECT key, x,
       |    CAST(row_number() OVER (PARTITION BY key ORDER BY day) - 1
       |      AS BIGINT) AS t
       |  FROM dly),
       |st AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ss
       |  FROM ix GROUP BY 1 HAVING count(*) > $maxLag),
       |hd AS (SELECT key, k, t + k AS t2, x AS xh
       |  FROM ix CROSS JOIN
       |    (SELECT CAST(unnest([${(1 to maxLag).mkString(",")}]) AS BIGINT)
       |      AS k)),
       |pr AS (SELECT hd.key, k, CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(xh * xt) AS BIGINT) AS sp,
       |    CAST(sum(xh) AS BIGINT) AS sh,
       |    CAST(sum(xt) AS BIGINT) AS st2
       |  FROM hd JOIN (SELECT key, t AS t2, x AS xt FROM ix) b
       |    ON b.key = hd.key AND b.t2 = hd.t2
       |  GROUP BY 1, 2),
       |pl AS (SELECT pr.key, k, m, n,
       |    CAST(round((CAST(sp AS DOUBLE)
       |        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
       |          * (CAST(sh AS DOUBLE) + CAST(st2 AS DOUBLE))
       |        + CAST(m AS DOUBLE)
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
       |      / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
       |        * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
       |      * 1000000.0) AS BIGINT) AS r_micro
       |  FROM pr JOIN st ON st.key = pr.key),
       |rl AS (SELECT key,
       |    list(CAST(r_micro AS DOUBLE) / 1000000.0 ORDER BY k) AS rs
       |  FROM pl GROUP BY 1 HAVING count(*) = $maxLag),
       |dl AS (
       |  SELECT key, 1 AS m, [rs[1]] AS phi, rs[1] AS pm,
       |    CAST(1 AS DOUBLE) - rs[1] * rs[1] AS e
       |  FROM rl
       |  UNION ALL
       |  SELECT d.key, d.m + 1,
       |    list_append(list_transform(d.phi, (v, i) ->
       |        v - ($pm) * d.phi[d.m + 1 - i]),
       |      $pm),
       |    $pm,
       |    d.e * (CAST(1 AS DOUBLE) - ($pm) * ($pm))
       |  FROM dl d JOIN rl ON rl.key = d.key WHERE d.m < $maxLag)
       |SELECT pl.key, pl.k AS lag, pl.r_micro,
       |  CAST(round(pm * 1000000.0) AS BIGINT) AS pacf_micro
       |FROM dl JOIN pl ON pl.key = dl.key AND pl.k = dl.m
       |ORDER BY pl.key, lag""".stripMargin
  }
}
