package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{LangModel, LinkGraph}
import graft.ops.{Allocate, Behavior, Eval, Inequality}

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
             |sy0 AS (SELECT tok, count(*) AS wf, string_split_regex(tok, '') AS syms
             |        FROM toks GROUP BY tok),
             |p1c AS (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy0)
             |  GROUP BY 1, 2),
             |m1 AS (SELECT p1, p2, c FROM p1c ORDER BY c DESC, p1, p2 LIMIT 1),
             |scan1 AS (
             |  SELECT tok, wf, syms, 2 AS i, [syms[1]] AS acc FROM sy0
             |  UNION ALL
             |  SELECT tok, wf, syms, i + 1,
             |    CASE WHEN acc[-1] = m.p1 AND syms[i] = m.p2
             |      THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
             |      ELSE list_append(acc, syms[i]) END
             |  FROM scan1, m1 m WHERE i <= len(syms)),
             |sy1 AS (SELECT tok, wf, acc AS syms FROM scan1
             |        WHERE i = len(syms) + 1),
             |p2c AS (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy1)
             |  GROUP BY 1, 2),
             |m2 AS (SELECT p1, p2, c FROM p2c ORDER BY c DESC, p1, p2 LIMIT 1),
             |scan2 AS (
             |  SELECT tok, wf, syms, 2 AS i, [syms[1]] AS acc FROM sy1
             |  UNION ALL
             |  SELECT tok, wf, syms, i + 1,
             |    CASE WHEN acc[-1] = m.p1 AND syms[i] = m.p2
             |      THEN list_append(acc[1:len(acc)-1], m.p1 || m.p2)
             |      ELSE list_append(acc, syms[i]) END
             |  FROM scan2, m2 m WHERE i <= len(syms)),
             |sy2 AS (SELECT tok, wf, acc AS syms FROM scan2
             |        WHERE i = len(syms) + 1),
             |p3c AS (
             |  SELECT (u).p1 AS p1, (u).p2 AS p2, CAST(sum(wf) AS BIGINT) AS c
             |  FROM (SELECT wf, unnest(list_filter(
             |          list_transform(syms, (x, i) ->
             |            CASE WHEN i <= len(syms) - 1
             |                 THEN {'p1': x, 'p2': syms[i+1]} END),
             |          v -> v IS NOT NULL)) AS u
             |        FROM sy2)
             |  GROUP BY 1, 2),
             |m3 AS (SELECT p1, p2, c FROM p3c ORDER BY c DESC, p1, p2 LIMIT 1)
             |SELECT CAST(1 AS BIGINT) AS merge_round, p1 AS left_sym,
             |  p2 AS right_sym, c AS pair_count FROM m1
             |UNION ALL SELECT 2, p1, p2, c FROM m2
             |UNION ALL SELECT 3, p1, p2, c FROM m3
             |ORDER BY merge_round""".stripMargin)),

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
             |FROM l ORDER BY partkey""".stripMargin)))
}
