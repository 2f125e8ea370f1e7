package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{LangModel, Sketches, TextAnalysis}
import graft.ops.{Behavior, Eval, Frontier, Spatial}

/** Eighth-wave operators: behavioral analytics over the event log
  * (cohort retention, Markov transitions, dwell time), exact evaluation
  * metrics (tie-aware AUC, calibration bins), geospatial assignment and
  * radius search on integer micro-degrees, the two-phase Pareto
  * frontier, BM25 salience, vocabulary-coverage OOV rates, and the HLL
  * register merge algebra.
  *
  * Oracle discipline as everywhere: exact integer arithmetic end to
  * end; any fractional step is ONE shared-shape double expression whose
  * operands are exact integers (DuckDB side always promotes to DOUBLE
  * via an explicit CAST before the first fractional literal — bare
  * decimal literals are DECIMAL-typed there, and decimal arithmetic
  * rounds differently than the double arithmetic Spark does).
  */
object AnalyticsQueries extends QueryPack {

  /** Shared oracle fragment: synthetic coastal coordinates — the SQL
    * text comes from [[Spatial.latSql]] itself, so the Spark expression
    * and the oracle can never drift. */
  private def latSql(k: String) = Spatial.latSql(k)
  private def lonSql(k: String) = Spatial.lonSql(k)

  val all: Seq[Q] = Seq(

    // Weekly cohort retention over the event log: users cohorted by
    // first active week, cells = users of that cohort active at each
    // week offset. All integer epoch-week arithmetic.
    Q("q157_cohort_retention",
      (s, d) => {
        import s.implicits._
        Behavior.cohortRetention(Tables.events(s, d))
          .orderBy($"cohort_week", $"week_offset")
      },
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 604800 AS wk
             |  FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
             |SELECT c.cohort_week, uw.wk - c.cohort_week AS week_offset,
             |  count(*) AS n_users
             |FROM uw JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // First-order Markov transition matrix between event types: one
    // partitioned lag over each user's (ts, event_id)-ordered timeline,
    // probabilities in micro-units from exact counts.
    Q("q158_event_transitions",
      (s, d) => {
        import s.implicits._
        Behavior.eventTransitions(Tables.events(s, d))
          .orderBy($"prev_type", $"next_type")
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS next_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_type
             |  FROM events),
             |pairs AS (
             |  SELECT prev_type, next_type, count(*) AS n_transitions
             |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
             |SELECT prev_type, next_type, n_transitions,
             |  CAST(round(CAST(n_transitions AS DOUBLE) * 1000000.0 /
             |    (sum(n_transitions) OVER (PARTITION BY prev_type))) AS BIGINT) AS p_micro
             |FROM pairs ORDER BY 1, 2""".stripMargin)),

    // Dwell time per event type: consecutive-event gaps attributed to
    // the earlier event's state; exact epoch-second sums.
    Q("q159_time_in_state",
      (s, d) => {
        import s.implicits._
        Behavior.timeInState(Tables.events(s, d)).orderBy($"state")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type AS state,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |seq AS (
             |  SELECT state, sec,
             |    lead(sec) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_sec
             |  FROM e)
             |SELECT state, count(*) AS n_intervals,
             |  CAST(sum(next_sec - sec) AS BIGINT) AS total_sec
             |FROM seq WHERE next_sec IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // One-vs-rest tie-aware ROC AUC per embedding label, scoring on the
    // first embedding coordinate (micro-rounded — floats promote to
    // double exactly on both engines). Mann–Whitney on grouped counts:
    // no per-row ranks, windows only over the bounded per-score table.
    Q("q160_auc_one_vs_rest",
      (s, d) => {
        import s.implicits._
        val scored = Tables.embeddings(s, d).select(
          round(col("embedding").getItem(0) * 1000000.0, 0).cast("long").as("score"),
          $"label")
        Eval.aucOneVsRest(scored, "score", "label").orderBy($"label")
      },
      Some("""WITH s AS (
             |  SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT) AS sc, label
             |  FROM embeddings),
             |per AS (SELECT sc, count(*) AS tot FROM s GROUP BY 1),
             |tots AS (
             |  SELECT sc, tot,
             |    coalesce(sum(tot) OVER (ORDER BY sc
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS all_before
             |  FROM per),
             |bl AS (SELECT sc, label, count(*) AS cnt FROM s GROUP BY 1, 2),
             |cells AS (
             |  SELECT bl.label, bl.cnt, tots.tot,
             |    tots.all_before - coalesce(sum(bl.cnt) OVER (PARTITION BY bl.label
             |      ORDER BY bl.sc ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS neg_before
             |  FROM bl JOIN tots USING (sc)),
             |per_label AS (
             |  SELECT label, CAST(sum(cnt) AS BIGINT) AS n_pos,
             |    CAST(sum(cnt * (2 * neg_before + (tot - cnt))) AS BIGINT) AS wins2
             |  FROM cells GROUP BY 1),
             |fin AS (
             |  SELECT label, n_pos,
             |    CAST(sum(n_pos) OVER () - n_pos AS BIGINT) AS n_neg, wins2
             |  FROM per_label)
             |SELECT label, n_pos, n_neg,
             |  CASE WHEN n_neg > 0 THEN
             |    CAST(round(CAST(wins2 AS DOUBLE) * 1000000.0 /
             |      (2.0 * CAST(n_pos AS DOUBLE) * n_neg)) AS BIGINT) END AS auc_micro
             |FROM fin ORDER BY label""".stripMargin)),

    // Reliability bins: predicted probability (affine map of the first
    // embedding coordinate, clamped to [0, 1e6]) vs empirical rate of
    // the odd-label class, 10 equal-width bins.
    Q("q161_calibration_bins",
      (s, d) => {
        import s.implicits._
        val scored = Tables.embeddings(s, d).select(
          least(greatest(
            round((col("embedding").getItem(0) + 1.0) / 2.0 * 1000000.0, 0).cast("long"),
            lit(0L)), lit(1000000L)).as("p_micro"),
          ($"label" % 2).cast("long").as("y"))
        Eval.calibrationBins(scored, "p_micro", "y", bins = 10).orderBy($"bin")
      },
      Some("""WITH s AS (
             |  SELECT least(greatest(
             |      CAST(round((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0
             |        * 1000000.0) AS BIGINT),
             |      0), 1000000) AS p,
             |    CAST(label % 2 AS BIGINT) AS y
             |  FROM embeddings),
             |b AS (SELECT least(p * 10 // 1000000, 9) AS bin, p, y FROM s)
             |SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
             |  CAST(round(CAST(sum(p) AS DOUBLE) / count(*)) AS BIGINT) AS mean_pred_micro,
             |  CAST(round(CAST(sum(y) AS DOUBLE) * 1000000.0 / count(*)) AS BIGINT)
             |    AS emp_rate_micro
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Nearest landing site per customer point: broadcast site dimension
    // + one arg-min pass, exact integer squared micro-degree distance,
    // ties to the lower site id.
    Q("q162_nearest_site",
      (s, d) => {
        import s.implicits._
        val pts = Tables.customer(s, d).select($"c_custkey".as("id"),
          Spatial.synthLatMicro("c_custkey").as("lat"),
          Spatial.synthLonMicro("c_custkey").as("lon"))
        val sites = Tables.supplier(s, d).select($"s_suppkey".as("site_id"),
          Spatial.synthLatMicro("s_suppkey").as("lat"),
          Spatial.synthLonMicro("s_suppkey").as("lon"))
        Spatial.nearestSite(pts, sites).orderBy($"id")
      },
      Some(s"""WITH p AS (
             |  SELECT c_custkey AS id, ${latSql("c_custkey")} AS plat,
             |    ${lonSql("c_custkey")} AS plon FROM customer),
             |st AS (
             |  SELECT s_suppkey AS site_id, ${latSql("s_suppkey")} AS slat,
             |    ${lonSql("s_suppkey")} AS slon FROM supplier),
             |dist AS (
             |  SELECT p.id, st.site_id,
             |    (p.plat - st.slat) * (p.plat - st.slat) +
             |    (p.plon - st.slon) * (p.plon - st.slon) AS dist2
             |  FROM p CROSS JOIN st)
             |SELECT id, site_id, dist2 FROM dist
             |QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, site_id) = 1
             |ORDER BY id""".stripMargin)),

    // Neighbors within 0.05° of each customer point: grid-blocked
    // candidate join (3×3 neighbor cells at cell size = r), exact
    // integer distance filter; zero-neighbor points kept. Oracle is the
    // brute-force quadratic — the blocking must reproduce it exactly.
    Q("q163_radius_neighbors",
      (s, d) => {
        import s.implicits._
        val pts = Tables.customer(s, d).select($"c_custkey".as("id"),
          Spatial.synthLatMicro("c_custkey").as("lat"),
          Spatial.synthLonMicro("c_custkey").as("lon"))
        Spatial.radiusNeighbors(pts, rMicro = 50000L).orderBy($"id")
      },
      Some(s"""WITH p AS (
             |  SELECT c_custkey AS id, ${latSql("c_custkey")} AS lat,
             |    ${lonSql("c_custkey")} AS lon FROM customer)
             |SELECT a.id, CAST(count(b.id) AS BIGINT) AS n_neighbors
             |FROM p a LEFT JOIN p b ON a.id <> b.id
             |  AND (a.lat - b.lat) * (a.lat - b.lat) +
             |      (a.lon - b.lon) * (a.lon - b.lon) <= 2500000000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Pareto frontier of orders on (price, recency) under strict-both
    // dominance — the two-phase range-partitioned prefix-max skyline.
    // Oracle is the direct NOT EXISTS dominance definition.
    Q("q164_pareto_frontier",
      (s, d) => {
        import s.implicits._
        val pts = Tables.orders(s, d).select(
          round($"o_totalprice" * 100, 0).cast("long").as("x"),
          expr("cast(cast(o_orderdate as timestamp_ltz) as long)").as("y"))
        Frontier.paretoFrontier(pts, "x", "y")
          .select($"x".as("price_cents"), $"y".as("order_sec"))
          .orderBy($"price_cents", $"order_sec")
      },
      Some("""WITH pts AS (
             |  SELECT DISTINCT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             |    epoch_us(o_orderdate) // 1000000 AS order_sec
             |  FROM orders)
             |SELECT price_cents, order_sec FROM pts p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM pts q
             |  WHERE q.price_cents > p.price_cents AND q.order_sec > p.order_sec)
             |ORDER BY 1, 2""".stripMargin)),

    // Top-3 salient terms per document by Okapi BM25 (k1=1.2, b=0.75) —
    // the length-normalized TF-IDF upgrade; one shared-shape double
    // score from exact integer tf/df/dl/N, micro-rounded.
    Q("q165_bm25_topk",
      (s, d) => {
        import s.implicits._
        LangModel.bm25TopK(Tables.documents(s, d), "doc_id", "text", k = 3)
          .select($"id".as("doc_id"), $"rnk", $"tok", $"score_micro")
          .orderBy($"doc_id", $"rnk")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS tok
             |  FROM documents),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM u GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
             |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |st AS (SELECT
             |  (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents) AS nd,
             |  (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS tot),
             |sc AS (
             |  SELECT tf.doc_id, tf.tok,
             |    CAST(round(
             |      ln((CAST(st.nd - dfq.df AS DOUBLE) + 0.5) /
             |          (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0)
             |      * (CAST(tf.tf AS DOUBLE) * 2.2 /
             |          (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl /
             |            (CAST(st.tot AS DOUBLE) / st.nd))))
             |      * 1000000) AS BIGINT) AS score_micro
             |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok) CROSS JOIN st)
             |SELECT doc_id,
             |  CAST(row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score_micro DESC, tok) AS BIGINT) AS rnk,
             |  tok, score_micro
             |FROM sc QUALIFY rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // Per-document OOV rate against the deterministic corpus top-100
    // vocabulary (count desc, token asc) — vocabulary coverage triage.
    Q("q166_oov_rate",
      (s, d) => {
        import s.implicits._
        LangModel.oovRate(Tables.documents(s, d), "doc_id", "text", vocabSize = 100)
          .select($"id".as("doc_id"), $"n_tokens", $"n_oov", $"oov_micro")
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS tok
             |  FROM documents),
             |voc AS (
             |  SELECT tok FROM (
             |    SELECT tok, count(*) AS c FROM u GROUP BY 1
             |    ORDER BY c DESC, tok LIMIT 100)),
             |agg AS (
             |  SELECT u.doc_id, count(*) AS n_tokens,
             |    count(CASE WHEN voc.tok IS NULL THEN 1 END) AS n_oov
             |  FROM u LEFT JOIN voc ON u.tok = voc.tok GROUP BY 1)
             |SELECT doc_id, n_tokens, n_oov,
             |  CAST(round(CAST(n_oov AS DOUBLE) * 1000000.0 / n_tokens) AS BIGINT)
             |    AS oov_micro
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // Ordered funnel (view → click → purchase) within 1 day of funnel
    // entry: staged per-user min-aggregations, all joins on user_id,
    // exact epoch-micros; conversion in micro-units of step-1 users.
    Q("q168_funnel_conversion",
      (s, d) => {
        import s.implicits._
        Behavior.funnelConversion(Tables.events(s, d),
            steps = Seq("view", "click", "purchase"), windowSec = 86400L)
          .orderBy($"step_idx")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |s1 AS (
             |  SELECT user_id, min(us) AS t, min(us) + 86400000000 AS dl
             |  FROM e WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(us) AS t, min(s1.dl) AS dl
             |  FROM e JOIN s1 USING (user_id)
             |  WHERE event_type = 'click' AND us >= s1.t AND us <= s1.dl
             |  GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(us) AS t
             |  FROM e JOIN s2 USING (user_id)
             |  WHERE event_type = 'purchase' AND us >= s2.t AND us <= s2.dl
             |  GROUP BY 1),
             |c AS (
             |  SELECT 1 AS step_idx, 'view' AS step,
             |    (SELECT count(*) FROM s1) AS n_users
             |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
             |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
             |SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
             |  CAST(n_users AS BIGINT) AS n_users,
             |  CASE WHEN (SELECT count(*) FROM s1) > 0 THEN
             |    CAST(round(CAST(n_users AS DOUBLE) * 1000000.0 /
             |      (SELECT count(*) FROM s1)) AS BIGINT)
             |  ELSE 0 END AS conv_micro
             |FROM c ORDER BY 1""".stripMargin)),

    // Top-10 session-opening paths: each user's first three event types
    // joined with '>' — rank window on the user key, in-row re-sort of
    // the collected steps, distributed TakeOrdered for the top-N.
    Q("q169_top_paths",
      (s, d) => {
        import s.implicits._
        Behavior.topPaths(Tables.events(s, d), k = 3, topN = 10)
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
             |  FROM events),
             |p AS (
             |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
             |  FROM r WHERE rn <= 3 GROUP BY 1)
             |SELECT path, count(*) AS n_users FROM p
             |GROUP BY 1 ORDER BY n_users DESC, path LIMIT 10""".stripMargin)),

    // Peak concurrent intervals per event type (interval = [sec,
    // sec + round(value)) seconds): the sweep-line +1/−1 prefix as a
    // TWO-PHASE range-partitioned sum — never a per-group global-order
    // window. Oracle is the single-window textbook sweep; the per-group
    // max is tie-permutation-invariant (see Sweep scaladoc).
    Q("q170_interval_concurrency",
      (s, d) => {
        import s.implicits._
        val iv = Tables.events(s, d).select(
          $"event_type".as("grp"),
          expr("cast(ts as long)").as("start"),
          (expr("cast(ts as long)")
            + greatest(round($"value", 0).cast("long"), lit(0L))).as("end"))
        graft.ops.Sweep.maxConcurrency(iv)
          .select($"grp".as("event_type"), $"n_intervals", $"max_concurrency")
          .orderBy($"event_type")
      },
      Some("""WITH iv AS (
             |  SELECT event_type AS grp,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 +
             |      greatest(CAST(round(value) AS BIGINT), 0) AS e
             |  FROM events),
             |ivf AS (SELECT * FROM iv WHERE e > s),
             |ev AS (
             |  SELECT grp, s AS t, CAST(1 AS BIGINT) AS delta FROM ivf
             |  UNION ALL
             |  SELECT grp, e, CAST(-1 AS BIGINT) FROM ivf),
             |run AS (
             |  SELECT grp, sum(delta) OVER (PARTITION BY grp ORDER BY t, delta
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             |  FROM ev),
             |mx AS (SELECT grp, CAST(max(c) AS BIGINT) AS max_concurrency
             |  FROM run GROUP BY 1),
             |cnt AS (SELECT grp, count(*) AS n_intervals FROM ivf GROUP BY 1)
             |SELECT cnt.grp AS event_type, cnt.n_intervals, mx.max_concurrency
             |FROM cnt JOIN mx USING (grp) ORDER BY 1""".stripMargin)),

    // Dynamic partition pruning: orders written month-partitioned, then
    // joined to a runtime dim (the Q1 months present in the data — the
    // literal seasonal predicate is what Catalyst's DPP selectivity
    // heuristic requires; a column-vs-column filter is not "likely
    // selective" and gets no pruning subquery). The broadcast-hinted
    // dim feeds the fact scan's dynamicpruning partition filter under
    // the default reuseBroadcastOnly mode, so only ~1/4 of the
    // partitions are read (PlanAuditSpec pins the expression); the
    // oracle recomputes from the unpartitioned source.
    Q("q171_dpp_join",
      (s, d) => {
        import s.implicits._
        import graft.core.Exact
        val dir = graft.core.Scratch.dir("q171_ordmonth")
        Tables.orders(s, d)
          .withColumn("omonth", date_format($"o_orderdate", "yyyy-MM"))
          .write.mode("overwrite").partitionBy("omonth").parquet(dir)
        val dim = Tables.orders(s, d)
          .select(date_format($"o_orderdate", "yyyy-MM").as("omonth")).distinct()
          .filter(substring($"omonth", 6, 2).isin("01", "02", "03"))
        s.read.parquet(dir).join(broadcast(dim), "omonth")
          .groupBy($"omonth")
          .agg(count(lit(1)).as("n"), Exact.centsSum($"o_totalprice").as("rev_cents"))
          .orderBy($"omonth")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS omonth, count(*) AS n,
             |  CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
             |FROM orders
             |WHERE substring(strftime(o_orderdate, '%Y-%m'), 6, 2) IN ('01', '02', '03')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-type value-over-time trend: grouped OLS (slope/intercept/R²)
    // from exact decimal(38) moments — one aggregation pass, shared
    // double shapes on the one-row-per-group moment table.
    Q("q172_group_ols",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_type".as("grp"),
          expr("cast(ts as long) div 86400 - 19723").as("x"),
          round($"value" * 100, 0).cast("long").as("y"))
        Eval.olsByGroup(ev, "grp", "x", "y").orderBy($"grp")
      },
      Some("""WITH e AS (
             |  SELECT event_type AS grp,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 - 19723 AS x,
             |    CAST(round(value * 100) AS BIGINT) AS y
             |  FROM events),
             |m AS (
             |  SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
             |  FROM e GROUP BY 1),
             |m2 AS (
             |  SELECT grp, n,
             |    CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS cov,
             |    CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS varx,
             |    CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS vary,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
             |  FROM m)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  CASE WHEN varx <> 0 THEN round(cov / varx, 4) + 0.0 END AS slope,
             |  CASE WHEN varx <> 0 THEN
             |    round((syd - cov / varx * sxd) / CAST(n AS DOUBLE), 4) + 0.0 END
             |    AS intercept,
             |  CASE WHEN varx <> 0 AND vary <> 0 THEN
             |    round(cov * cov / (varx * vary), 4) + 0.0 END AS r2
             |FROM m2 ORDER BY grp""".stripMargin)),

    // Runtime bloom-filter join pruning — the row-level counterpart of
    // q171's partition-level DPP: with the dim side too big to
    // broadcast (forced here), Catalyst builds a bloom filter from the
    // selective dim and semi-filters the fact BEFORE its shuffle,
    // cutting shuffle volume to ~the join's selectivity. Runs in a
    // child session so the thresholds touch only this query's plans;
    // the oracle is the plain join (the filter is transparent).
    Q("q173_runtime_bloom_join",
      (s, d) => {
        import s.implicits._
        import graft.core.Exact
        val s2 = s.newSession()
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = Tables.lineitem(s2, d)
        val o = Tables.orders(s2, d).filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            Exact.centsSum($"l_extendedprice").as("rev_cents"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT)
             |    AS rev_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact weighted quantiles per group (price weighted by quantity):
    // integer crossing test den·cum ≥ num·W — no fractional target,
    // every tie engine-agreed, grouped windows over the per-value table.
    Q("q174_weighted_quantiles",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_returnflag".as("grp"),
          round($"l_extendedprice" * 100, 0).cast("long").as("cents"),
          $"l_quantity".cast("long").as("qty"))
        graft.ops.WeightedStats.weightedQuantiles(li, "grp", "cents", "qty",
            Seq((1, 2, "wmedian_cents"), (9, 10, "wp90_cents")))
          .orderBy($"grp")
      },
      Some("""WITH li AS (
             |  SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice*100, 0) AS BIGINT) AS v,
             |    CAST(l_quantity AS BIGINT) AS w
             |  FROM lineitem WHERE l_quantity > 0),
             |bv AS (SELECT grp, v, CAST(sum(w) AS BIGINT) AS w FROM li GROUP BY 1, 2),
             |c AS (
             |  SELECT grp, v,
             |    sum(w) OVER (PARTITION BY grp ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(w) OVER (PARTITION BY grp) AS tot
             |  FROM bv)
             |SELECT grp, CAST(min(tot) AS BIGINT) AS total_weight,
             |  min(CASE WHEN cum * 2 >= tot * 1 THEN v END) AS wmedian_cents,
             |  min(CASE WHEN cum * 10 >= tot * 9 THEN v END) AS wp90_cents
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // "Customers also bought": top-3 co-purchased parts per part by
    // shared-order count — directed pair counts off the same salted
    // co-occurrence shape as the q128 graph, per-source rank window.
    Q("q175_copurchase_topk",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") =!= col("y.pk"))
          .groupBy(col("x.pk").as("part_id"), col("y.pk").as("also_part"))
          .agg(count(lit(1)).as("n_orders"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"part_id")
          .orderBy($"n_orders".desc, $"also_part".asc)
        pairs.withColumn("rnk", row_number().over(w).cast("long"))
          .filter($"rnk" <= 3)
          .select($"part_id", $"rnk", $"also_part", $"n_orders")
          .orderBy($"part_id", $"rnk")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |pairs AS (
             |  SELECT x.pk AS part_id, y.pk AS also_part, count(*) AS n_orders
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk <> y.pk
             |  GROUP BY 1, 2)
             |SELECT part_id,
             |  CAST(row_number() OVER (PARTITION BY part_id
             |    ORDER BY n_orders DESC, also_part) AS BIGINT) AS rnk,
             |  also_part, n_orders
             |FROM pairs QUALIFY rnk <= 3 ORDER BY part_id, rnk""".stripMargin)),

    // ORC source/sink round-trip (zlib, month-partitioned) with a
    // pushed-down predicate on the read — the columnar-format seam next
    // to parquet (S3-S5), CSV (q141), and the V2 doc store (q56):
    // Spark's native ORC reader prunes partitions and pushes filters
    // exactly like parquet (PlanAuditSpec pins PushedFilters on this
    // scan). Oracle recomputes from the parquet source.
    Q("q176_orc_roundtrip",
      (s, d) => {
        import s.implicits._
        import graft.core.Exact
        val dir = graft.core.Scratch.dir("q176_orc")
        Tables.orders(s, d)
          .withColumn("omonth", date_format($"o_orderdate", "yyyy-MM"))
          .write.mode("overwrite").option("compression", "zlib")
          .partitionBy("omonth").orc(dir)
        s.read.orc(dir)
          .filter($"omonth" >= "1996-01" && $"omonth" < "1997-01"
            && $"o_totalprice" > 100000.0)
          .groupBy($"omonth")
          .agg(count(lit(1)).as("n"), Exact.centsSum($"o_totalprice").as("rev_cents"))
          .orderBy($"omonth")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS omonth, count(*) AS n,
             |  CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
             |    AS rev_cents
             |FROM orders
             |WHERE strftime(o_orderdate, '%Y-%m') >= '1996-01'
             |  AND strftime(o_orderdate, '%Y-%m') < '1997-01'
             |  AND o_totalprice > 100000.0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAMING leaderboard under the batch oracle (the q156 replay
    // pattern, second streaming operator to run end-to-end in the
    // conformance gate): events replayed chronologically through
    // StreamTopK (transformWithState MapState) in three file-source
    // micro-batches; the FINAL generation per key (max keyTotal) must
    // equal the batch top-5 per event type. Items are zero-padded so
    // the processor's string tie-break equals the oracle's numeric one.
    Q("q177_stream_topk_replay",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val prev = graft.streaming.StreamQuota.configure(s)
        try {
          val ev = Tables.events(s, d).select($"event_type",
            format_string("%06d", $"user_id").as("item"),
            expr("cast(ts as long) div 86400 - 19723").as("day"))
          val root = graft.core.Scratch.dir("q177_replay")
          val in = s"$root/in"
          val slices = Seq(
            ("s1", $"day" < 10), ("s2", $"day" >= 10 && $"day" < 20),
            ("s3", $"day" >= 20))
          s.catalog.dropTempView("q177_out")
          // ONE streaming query fed incrementally — MapState must
          // accumulate across micro-batches, and state lives per query
          // (a fresh query per slice would reset the counts); the first
          // slice overwrites the source dir, later slices append files,
          // each processAllAvailable drains one batch boundary
          ev.filter(slices.head._2).select($"event_type", $"item").coalesce(1)
            .write.mode("overwrite").parquet(in)
          val stream = s.readStream
            .schema("event_type STRING, item STRING")
            .parquet(in)
            .as[(String, String)]
          val q = graft.streaming.StreamTopK.topKPerKey(stream, k = 5)
            .writeStream.outputMode("append").format("memory")
            .queryName("q177_out").start()
          q.processAllAvailable()
          slices.tail.foreach { case (_, cond) =>
            ev.filter(cond).select($"event_type", $"item").coalesce(1)
              .write.mode("append").parquet(in)
            q.processAllAvailable()
          }
          q.stop()
          // window max instead of a self-join: the memory-sink relation
          // carries identical attribute ids on both sides of a
          // self-join and trips conflicting-reference resolution
          s.table("q177_out")
            .withColumn("mx", max($"keyTotal").over(Window.partitionBy($"key")))
            .filter($"keyTotal" === $"mx")
            .select($"key".as("event_type"), $"item".cast("long").as("user_id"),
              $"cnt")
            .withColumn("rnk", row_number().over(
              Window.partitionBy($"event_type").orderBy($"cnt".desc, $"user_id".asc))
              .cast("long"))
            .orderBy($"event_type", $"rnk")
        } finally s.conf.set(
          "spark.sql.streaming.stateStore.providerClass", prev)
      },
      Some("""WITH c AS (
             |  SELECT event_type, user_id, count(*) AS cnt
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT event_type, user_id, cnt,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY cnt DESC, user_id) AS rnk
             |  FROM c)
             |SELECT event_type, CAST(user_id AS BIGINT) AS user_id, cnt,
             |  CAST(rnk AS BIGINT) AS rnk
             |FROM r WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin)),

    // HLL merge algebra: per-source register tables max-merged into the
    // global registers; the oracle computes the single-pass registers
    // directly (q111's shape) — merge ≡ direct is the mergeability
    // property that makes sketches incrementally maintainable.
    Q("q167_hll_merge",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"source", explode(TextAnalysis.tokens($"text")).as("tok"))
        val perSource = Sketches.hllRegistersBy(toks, Seq("source"), "tok", p = 6)
        Sketches.hllMergeRegisters(perSource.select($"bucket", $"register"))
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

    // Temperature-scaled source mixing (the multilingual-sampling
    // move: weight ∝ n^0.7 flattens the head): kilo-unit weights from
    // one shared exp(0.7·ln n) shape, then the largest-remainder
    // prorate hands out an exactly-conserved 1M-unit budget.
    Q("q217_temperature_mix",
      (s, d) => {
        import s.implicits._
        val n = Tables.documents(s, d)
          .groupBy($"lang").agg(count(lit(1)).as("n"))
        val w = n.withColumn("w_kilo",
            round(exp(lit(0.7) * log($"n".cast("double"))) * 1000.0, 0)
              .cast("long"))
          .withColumn("g", lit("all"))
        graft.ops.Allocate.prorate(w, "g", "lang", "w_kilo",
            budget = 1000000L)
          .select($"lang", $"weight".as("w_kilo"), $"alloc")
          .orderBy($"lang")
      },
      Some("""WITH n AS (SELECT lang, count(*) AS n FROM documents
             |  GROUP BY 1),
             |w AS (SELECT lang,
             |        CAST(round(exp(0.7 * ln(CAST(n AS DOUBLE))) * 1000.0)
             |          AS BIGINT) AS w_kilo
             |      FROM n),
             |b AS (SELECT lang, w_kilo,
             |        sum(w_kilo) OVER () AS wsum
             |      FROM w WHERE w_kilo > 0),
             |c AS (SELECT lang, w_kilo,
             |        (1000000 * w_kilo) // wsum AS base,
             |        (1000000 * w_kilo) % wsum AS rem
             |      FROM b),
             |r AS (SELECT lang, w_kilo, base,
             |        1000000 - sum(base) OVER () AS leftover,
             |        row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
             |      FROM c)
             |SELECT lang, w_kilo,
             |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
             |    AS BIGINT) AS alloc
             |FROM r ORDER BY lang""".stripMargin)),

    // Tokenizer-vocabulary coverage: what share of all token
    // occurrences the top-100 types per language capture — the rank
    // window runs on the (lang, type) vocabulary table, never the
    // corpus; exact integer micro share.
    Q("q218_vocab_coverage",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val tc = Tables.documents(s, d)
          .select($"lang", explode(split(trim($"text"), "\\s+")).as("tok"))
          .groupBy($"lang", $"tok").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy($"lang").orderBy($"c".desc, $"tok")
        tc.withColumn("rn", row_number().over(w))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_types"), sum($"c").as("n_tokens"),
            sum(when($"rn" <= 100, $"c").otherwise(0L)).as("top100_tokens"))
          .withColumn("coverage_micro",
            expr("(top100_tokens * 1000000) div n_tokens"))
          .orderBy($"lang")
      },
      Some("""WITH toks AS (
             |  SELECT lang, unnest(string_split_regex(trim(text), '\s+'))
             |    AS tok
             |  FROM documents),
             |tc AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |r AS (SELECT lang, c,
             |        row_number() OVER (PARTITION BY lang
             |          ORDER BY c DESC, tok) AS rn
             |      FROM tc)
             |SELECT lang, count(*) AS n_types,
             |  CAST(sum(c) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN rn <= 100 THEN c ELSE 0 END) AS BIGINT)
             |    AS top100_tokens,
             |  CAST((sum(CASE WHEN rn <= 100 THEN c ELSE 0 END) * 1000000)
             |       // sum(c) AS BIGINT) AS coverage_micro
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)))
}
