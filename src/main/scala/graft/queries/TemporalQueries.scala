package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Allocate, Calendar, Survival, TimeSeries}

/** Fifteenth-wave operators — sequential/temporal analytics whose
  * imperative formulations all collapse to relational plans: FIFO lot
  * matching as a cumulative-interval join, CUSUM change detection via
  * the Lindley closed form (no fold at all), running-peak drawdown,
  * closed-form business-day calendars, Kaplan–Meier survival with the
  * fold bounded by distinct TIMES (not subjects), and a rolling-median
  * robust screen.
  *
  * Ordering discipline for lineitem-driven series: (sec, ok, ln) is
  * NOT unique (the synthetic data carries duplicate (l_orderkey,
  * l_linenumber) pairs), so every window order appends the value
  * column — remaining ties are value-identical rows, which commute
  * through every computation here.
  */
object TemporalQueries extends QueryPack {

  val all: Seq[Q] = Seq(

    // FIFO lot matching per part: returns are supply lots, shipments
    // consume them in arrival order. The two-pointer walk becomes a
    // pure interval-intersection join on per-key cumulative quantity —
    // both cumsum windows and the join share the partkey partitioning,
    // and per-key output is linear (<= nB + nD - 1 pairs).
    Q("q197_fifo_match",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_partkey" < 1000)
          .select($"l_partkey".as("pk"),
            $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
            $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
            $"l_quantity".cast("long").as("q"), $"l_returnflag".as("rf"))
        val buys = li.filter($"rf" === "R").drop("rf")
        val sells = li.filter($"rf" =!= "R").drop("rf")
        Allocate.fifoMatch(buys, sells, "pk",
            Seq("sec", "ok", "ln", "q"), "q")
          // total order incl. matched_qty: bit-stable row order for the
          // driver's streaming hasher even if upstream ties ever appear
          .orderBy($"key", $"buy_sec", $"buy_ok", $"buy_ln", $"buy_q",
            $"sell_sec", $"sell_ok", $"sell_ln", $"sell_q", $"matched_qty")
      },
      Some("""WITH li AS (
             |  SELECT l_partkey AS pk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(l_quantity AS BIGINT) AS q, l_returnflag AS rf
             |  FROM lineitem WHERE l_partkey < 1000),
             |b AS (SELECT pk, sec, ok, ln, q,
             |        sum(q) OVER (PARTITION BY pk ORDER BY sec, ok, ln, q
             |          ROWS UNBOUNDED PRECEDING) AS bhi
             |      FROM li WHERE rf = 'R'),
             |s AS (SELECT pk, sec, ok, ln, q,
             |        sum(q) OVER (PARTITION BY pk ORDER BY sec, ok, ln, q
             |          ROWS UNBOUNDED PRECEDING) AS dhi
             |      FROM li WHERE rf <> 'R')
             |SELECT b.pk AS key,
             |  b.sec AS buy_sec, b.ok AS buy_ok, b.ln AS buy_ln,
             |  b.q AS buy_q,
             |  s.sec AS sell_sec, s.ok AS sell_ok, s.ln AS sell_ln,
             |  s.q AS sell_q,
             |  CAST(least(b.bhi, s.dhi)
             |    - greatest(b.bhi - b.q, s.dhi - s.q) AS BIGINT)
             |    AS matched_qty
             |FROM b JOIN s ON b.pk = s.pk
             |  AND b.bhi - b.q < s.dhi AND s.dhi - s.q < b.bhi
             |ORDER BY key, buy_sec, buy_ok, buy_ln, buy_q,
             |  sell_sec, sell_ok, sell_ln, sell_q, matched_qty""".stripMargin)),

    // One-sided CUSUM on shipped quantity per supplier (k=26, h=500):
    // the clamped recurrence solved in CLOSED FORM (Lindley:
    // C_i = S_i - min(0, min prefix S)) — two frames on one window
    // sort, per-row exactness with zero sequential state.
    Q("q198_cusum_qty",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_suppkey".as("sk"),
          $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
          $"l_quantity".cast("long").as("q"))
        TimeSeries.cusumStats(li, "sk", Seq("sec", "ok", "ln", "q"), "q",
            k = 26L, h = 500L)
          .select($"key".as("suppkey"), $"n", $"final_cusum",
            $"max_cusum", $"n_alarms")
          .orderBy($"suppkey")
      },
      Some("""WITH li AS (
             |  SELECT l_suppkey AS sk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem),
             |w AS (SELECT sk, sec, ok, ln, q,
             |        sum(q - 26) OVER (PARTITION BY sk
             |          ORDER BY sec, ok, ln, q ROWS UNBOUNDED PRECEDING) AS s
             |      FROM li),
             |c AS (SELECT sk, q, s,
             |        min(s) OVER (PARTITION BY sk ORDER BY sec, ok, ln, q
             |          ROWS UNBOUNDED PRECEDING) AS smin
             |      FROM w)
             |SELECT sk AS suppkey, count(*) AS n,
             |  CAST(sum(q - 26) - least(CAST(0 AS BIGINT), min(s)) AS BIGINT)
             |    AS final_cusum,
             |  CAST(max(s - least(CAST(0 AS BIGINT), smin)) AS BIGINT)
             |    AS max_cusum,
             |  CAST(sum(CASE WHEN s - least(CAST(0 AS BIGINT), smin) > 500
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Maximum drawdown of each user's engagement walk (purchase +5,
    // other events -1): prefix sum -> running max -> peak shortfall,
    // one window sort, exact signed integers.
    Q("q199_engagement_drawdown",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"user_id", expr("cast(ts as long)").as("sec"), $"event_id",
          when($"event_type" === "purchase", 5L).otherwise(-1L).as("delta"))
        TimeSeries.maxDrawdown(ev, "user_id", Seq("sec", "event_id"), "delta")
          .select($"key".as("user_id"), $"n", $"final_value",
            $"max_drawdown")
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec, event_id,
             |    CASE WHEN event_type = 'purchase' THEN 5 ELSE -1 END AS delta
             |  FROM events),
             |w AS (SELECT user_id, sec, event_id, delta,
             |        sum(delta) OVER (PARTITION BY user_id
             |          ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS v
             |      FROM ev),
             |m AS (SELECT user_id, delta, v,
             |        max(v) OVER (PARTITION BY user_id
             |          ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING)
             |          AS peak
             |      FROM w)
             |SELECT user_id, count(*) AS n,
             |  CAST(sum(delta) AS BIGINT) AS final_value,
             |  CAST(max(peak - v) AS BIGINT) AS max_drawdown
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Business-day SLA profile: weekday count between order date and a
    // deterministic promise date via the pure closed form g(e2) - g(e1)
    // (g = 5 full weeks + clamped residue; no calendar table, no UDF,
    // codegen integer ops only). One builder emits both engines' text.
    Q("q200_business_days",
      (s, d) => {
        import s.implicits._
        val e1 = "(cast(cast(o_orderdate as timestamp_ltz) as long) div 86400)"
        val o = Tables.orders(s, d)
          .withColumn("bd", expr(Calendar.busDaysSql(
            e1, s"($e1 + o_orderkey % 40)", divOp = "div")))
        o.groupBy($"o_orderpriority".as("prio"))
          .agg(count(lit(1)).as("n"),
            sum($"bd").cast("long").as("sum_busdays"),
            max($"bd").cast("long").as("max_busdays"),
            sum(when($"bd" <= 20, 1L).otherwise(0L)).as("n_within_sla"))
          .orderBy($"prio")
      },
      Some {
        val e1 = "(epoch_us(o_orderdate) // 1000000 // 86400)"
        val bd = Calendar.busDaysSql(e1, s"($e1 + o_orderkey % 40)",
          divOp = "//")
        s"""SELECT o_orderpriority AS prio, count(*) AS n,
           |  CAST(sum($bd) AS BIGINT) AS sum_busdays,
           |  CAST(max($bd) AS BIGINT) AS max_busdays,
           |  CAST(sum(CASE WHEN $bd <= 20 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_within_sla
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Kaplan-Meier survival per order priority (duration = okey % 60
    // days, ~1/7 right-censored): the product-limit fold runs over
    // DISTINCT TIMES (<= 60 cells/group), never over subjects — the
    // fact table collapses in one groupBy first; survival kept in
    // micro-units with one truncating division per step so DuckDB
    // replays it bit-for-bit.
    Q("q201_kaplan_meier",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_orderpriority".as("grp"),
          ($"o_orderkey" % 60).as("dur"),
          when($"o_orderkey" % 7 =!= 0, 1L).otherwise(0L).as("ev"))
        Survival.kaplanMeier(o, "grp", "dur", "ev")
          .orderBy($"grp", $"t")
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(o_orderkey % 60 AS BIGINT) AS t,
             |    CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END AS ev
             |  FROM orders),
             |cells AS (SELECT grp, t, count(*) AS c,
             |            CAST(sum(ev) AS BIGINT) AS d
             |          FROM base GROUP BY 1, 2),
             |r AS (SELECT grp, t, d,
             |        CAST(sum(c) OVER (PARTITION BY grp ORDER BY t
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |          AS BIGINT) AS n_risk
             |      FROM cells),
             |l AS (SELECT grp,
             |        list({'t': t, 'n': n_risk, 'd': d} ORDER BY t)
             |          FILTER (d > 0) AS steps
             |      FROM r GROUP BY 1)
             |SELECT r.grp AS grp, r.t AS t, r.n_risk AS n_risk, r.d AS d,
             |  list_reduce(
             |    list_prepend({'t': CAST(0 AS BIGINT),
             |                  'n': CAST(1000000 AS BIGINT),
             |                  'd': CAST(0 AS BIGINT)},
             |      list_filter(l.steps, s -> s.t <= r.t)),
             |    (acc, s) -> {'t': s.t,
             |                 'n': (acc.n * (s.n - s.d)) // s.n,
             |                 'd': s.d}).n AS s_micro
             |FROM r JOIN l ON l.grp = r.grp
             |WHERE r.d > 0
             |ORDER BY grp, t""".stripMargin)),

    // Rolling-median robust screen on shipped quantity per supplier
    // (w=15): exact sorted-frame middle element, outlier when the
    // deviation exceeds half the local median (division-free integer
    // test |x-med|*2 > med), judged only on full frames.
    Q("q202_rolling_median_screen",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_suppkey".as("sk"),
          $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
          $"l_quantity".cast("long").as("q"))
        TimeSeries.rollingMedianOutliers(li, "sk",
            Seq("sec", "ok", "ln", "q"), "q", w = 15, tol2 = 1L)
          .select($"key".as("suppkey"), $"n_judged", $"n_outliers")
          .orderBy($"suppkey")
      },
      Some("""WITH li AS (
             |  SELECT l_suppkey AS sk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem),
             |f AS (SELECT sk, q,
             |        list(q) OVER (PARTITION BY sk ORDER BY sec, ok, ln, q
             |          ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS fr
             |      FROM li),
             |j AS (SELECT sk, q, list_sort(fr)[8] AS med
             |      FROM f WHERE len(fr) = 15)
             |SELECT sk AS suppkey, count(*) AS n_judged,
             |  CAST(sum(CASE WHEN abs(q - med) * 2 > med * 1
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bounded Bellman-Ford over the weighted trade graph (edge cost
    // shrinks with trade volume): 3 min-plus relaxation rounds — the
    // weighted generalization of q178's BFS, no settled-set shortcut
    // because a longer-hop path may still be cheaper. Oracle = the
    // same three chained min-relaxations.
    Q("q203_weighted_shortest_path",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey".as("c"), $"l_suppkey".as("p"))
          .agg(count(lit(1)).as("n"))
          .withColumn("w", greatest(lit(1L), lit(8L) - least($"n", lit(7L))))
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"), $"w")
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst"), $"w"))
        val seeds = Tables.customer(s, d).filter($"c_custkey" < 10)
          .select($"c_custkey".as("id"))
        graft.ext.LinkGraph.weightedShortestPaths(edges, seeds, rounds = 3)
          .orderBy($"node_id")
      },
      Some("""WITH pairs AS (
             |  SELECT o_custkey AS c, l_suppkey AS p, count(*) AS n
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2),
             |pw AS (SELECT c, p,
             |         CAST(greatest(1, 8 - least(n, 7)) AS BIGINT) AS w
             |       FROM pairs),
             |edges AS (SELECT c AS src, p + 1000000 AS dst, w FROM pw
             |          UNION ALL SELECT p + 1000000, c, w FROM pw),
             |d0 AS (SELECT c_custkey AS id, CAST(0 AS BIGINT) AS dist
             |       FROM customer WHERE c_custkey < 10),
             |d1 AS (SELECT id, min(dist) AS dist FROM (
             |         SELECT id, dist FROM d0
             |         UNION ALL SELECT e.dst, d0.dist + e.w
             |         FROM d0 JOIN edges e ON e.src = d0.id) GROUP BY id),
             |d2 AS (SELECT id, min(dist) AS dist FROM (
             |         SELECT id, dist FROM d1
             |         UNION ALL SELECT e.dst, d1.dist + e.w
             |         FROM d1 JOIN edges e ON e.src = d1.id) GROUP BY id),
             |d3 AS (SELECT id, min(dist) AS dist FROM (
             |         SELECT id, dist FROM d2
             |         UNION ALL SELECT e.dst, d2.dist + e.w
             |         FROM d2 JOIN edges e ON e.src = d2.id) GROUP BY id)
             |SELECT id AS node_id, CAST(dist AS BIGINT) AS dist
             |FROM d3 ORDER BY id""".stripMargin)),

    // Two-step Markov matrix: the one-step micro-probability matrix
    // (q158's counts, integer-div normalized) SQUARED in exact integer
    // arithmetic — products summed over the mid state before one
    // closing division; the matrix square is a |states|^2-cardinality
    // operation however large the corpus.
    Q("q204_markov_two_step",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.markovTwoStep(Tables.events(s, d))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS b,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS a
             |  FROM events),
             |n1 AS (SELECT a, b, count(*) AS n FROM seq
             |       WHERE a IS NOT NULL GROUP BY 1, 2),
             |p1 AS (SELECT a, b,
             |         (n * 1000000) // sum(n) OVER (PARTITION BY a) AS p
             |       FROM n1)
             |SELECT x.a AS from_type, y.b AS to_type,
             |  CAST(sum(x.p * y.p) // 1000000 AS BIGINT) AS p2_micro
             |FROM p1 x JOIN p1 y ON x.b = y.a
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Lead-lag screen: Pearson r between daily click volume and
    // purchase volume at every lag 0..6, from exact integer sufficient
    // statistics with one shared-shape double per lag — "does x lead
    // y?" without ever materializing more than the daily table.
    Q("q205_lag_crosscorr",
      (s, d) => {
        import s.implicits._
        val e = Tables.events(s, d).select(
          expr("cast(ts as long) div 86400").as("day"), $"event_type")
        val days = e.groupBy($"day").agg(
          sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
        graft.ops.TimeSeries.lagCrossCorr(days, "day", "x", "y", maxLag = 6)
          .select($"lag".as("lag_steps"), $"n", $"r_micro")
          .orderBy($"lag_steps")
      },
      Some("""WITH e AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400
             |    AS day, event_type FROM events),
             |ds AS (SELECT day,
             |        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |          AS BIGINT) AS x,
             |        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |          AS BIGINT) AS y
             |      FROM e GROUP BY 1),
             |pr AS (SELECT lg.lag_steps, a.x, b.y
             |       FROM ds a
             |       CROSS JOIN (SELECT unnest(range(0, 7)) AS lag_steps) lg
             |       JOIN ds b ON b.day = a.day + lg.lag_steps),
             |st AS (SELECT lag_steps, count(*) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(x * x) AS BIGINT) AS sxx,
             |         CAST(sum(y * y) AS BIGINT) AS syy,
             |         CAST(sum(x * y) AS BIGINT) AS sxy
             |       FROM pr GROUP BY 1)
             |SELECT CAST(lag_steps AS BIGINT) AS lag_steps, n,
             |  CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    * 1000000.0
             |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             |    AS BIGINT) AS r_micro
             |FROM st
             |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             |ORDER BY lag_steps""".stripMargin)),

    // Day-of-week seasonality index of order revenue: the dow falls
    // out of the same epoch-day closed form as q200 (0=Monday), the
    // index is exact integer micro-units (1e6 = flat) on the 7-row
    // post-aggregate table.
    Q("q206_dow_seasonality",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val e1 = "(cast(cast(o_orderdate as timestamp_ltz) as long) div 86400)"
        val byDow = Tables.orders(s, d)
          .withColumn("dow", expr(Calendar.dowSql(e1)))
          .groupBy($"dow".cast("long").as("dow"))
          .agg(count(lit(1)).as("n"),
            graft.core.Exact.centsSum($"o_totalprice").as("rev_cents"))
        byDow
          .withColumn("total", sum($"rev_cents").over(Window.partitionBy()))
          .select($"dow", $"n", $"rev_cents",
            expr("(rev_cents * 7000000) div total").as("index_micro"))
          .orderBy($"dow")
      },
      Some("""WITH o AS (
             |  SELECT (epoch_us(o_orderdate) // 1000000 // 86400) AS e,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |g AS (SELECT CAST((e + 3) % 7 AS BIGINT) AS dow, count(*) AS n,
             |        CAST(sum(cents) AS BIGINT) AS rev_cents
             |      FROM o GROUP BY 1),
             |t AS (SELECT dow, n, rev_cents,
             |        sum(rev_cents) OVER () AS total FROM g)
             |SELECT dow, n, rev_cents,
             |  CAST((rev_cents * 7000000) // total AS BIGINT) AS index_micro
             |FROM t ORDER BY dow""".stripMargin)),

    // Welch's t per event type between user cohorts (user_id parity):
    // one conditional-aggregation pass collects (n, Σx, Σx²) per side
    // in exact cents; the statistic is one shared-shape double over
    // six integers, micro-rounded — A/B readout with no float
    // accumulation anywhere.
    Q("q207_welch_ab",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type".as("grp"),
          ($"user_id" % 2).cast("int").as("variant"),
          round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Eval.welchT(ev, "grp", "variant", "cents")
          .orderBy($"grp")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS grp, user_id % 2 AS v,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |j AS (SELECT grp,
             |        CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |        CAST(sum(CASE WHEN v = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
             |        CAST(sum(CASE WHEN v = 0 THEN cents * cents ELSE 0 END)
             |          AS BIGINT) AS ss0,
             |        CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |        CAST(sum(CASE WHEN v = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
             |        CAST(sum(CASE WHEN v = 1 THEN cents * cents ELSE 0 END)
             |          AS BIGINT) AS ss1
             |      FROM ev GROUP BY 1
             |      HAVING n0 >= 2 AND n1 >= 2),
             |x AS (SELECT grp, n0, n1,
             |        CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
             |          - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS md,
             |        (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
             |           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
             |          / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))
             |          / CAST(n0 AS DOUBLE)
             |        + (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
             |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
             |          / CAST(n1 AS DOUBLE) AS se2
             |      FROM j)
             |SELECT grp, n0, n1,
             |  CAST(round(md * 1000000.0) AS BIGINT) AS mean_diff_micro,
             |  CAST(round(md * 1000000.0 / sqrt(se2)) AS BIGINT) AS t_micro
             |FROM x WHERE se2 > 0 ORDER BY grp""".stripMargin)),

    // Mann-Whitney U with exact midranks under ties: ranks live on the
    // (grp, value) TIE-CELL table (doubled-integer midranks from a
    // prefix-sum window over cells, never a per-row rank), U2 = 2U is
    // an exact integer, z gets the tie-corrected variance through one
    // shared double shape — the nonparametric twin of q207.
    Q("q208_mann_whitney",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type".as("grp"),
          ($"user_id" % 2).cast("int").as("variant"),
          round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Eval.mannWhitneyU(ev, "grp", "variant", "cents")
          .orderBy($"grp")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS grp, user_id % 2 AS v,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |cells AS (SELECT grp, cents AS x, count(*) AS m,
             |            CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END)
             |              AS BIGINT) AS m1
             |          FROM ev GROUP BY 1, 2),
             |rk AS (SELECT grp, m, m1,
             |         2 * coalesce(sum(m) OVER (PARTITION BY grp ORDER BY x
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           + m + 1 AS rank2
             |       FROM cells),
             |g AS (SELECT grp, CAST(sum(m) AS BIGINT) AS nn,
             |        CAST(sum(m1) AS BIGINT) AS n1,
             |        CAST(sum(m1 * rank2) AS BIGINT) AS r1_2,
             |        CAST(sum(m * m * m - m) AS BIGINT) AS tsum
             |      FROM rk GROUP BY 1),
             |x AS (SELECT grp, nn - n1 AS n0, n1, nn, tsum,
             |        r1_2 - n1 * (n1 + 1) AS u2
             |      FROM g
             |      WHERE nn - n1 > 0 AND n1 > 0
             |        AND tsum < nn * nn * nn - nn)
             |SELECT grp, n0, n1, u2,
             |  CAST(round(CAST(u2 - n0 * n1 AS DOUBLE) * 1000000.0
             |    / (2.0 * sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
             |        * (CAST(nn + 1 AS DOUBLE)
             |           - CAST(tsum AS DOUBLE)
             |             / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))))))
             |    AS BIGINT) AS z_micro
             |FROM x ORDER BY grp""".stripMargin)),

    // K-variant one-vs-rest Mann-Whitney (q208 generalized past
    // {0,1}): every user-segment variant vs the rest, the tie-cell
    // rank table computed ONCE per group and reused by all variants
    // through one (grp, value) join.
    Q("q233_mann_whitney_ovr",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type".as("grp"),
          ($"user_id" % 4).cast("int").as("variant"),
          round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Eval.mannWhitneyOneVsRest(ev, "grp", "variant", "cents")
          .orderBy($"grp", $"variant")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS grp, user_id % 4 AS v,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |cells AS (SELECT grp, cents AS x, count(*) AS m FROM ev GROUP BY 1, 2),
             |rk AS (SELECT grp, x, m,
             |         2 * coalesce(sum(m) OVER (PARTITION BY grp ORDER BY x
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |           + m + 1 AS rank2
             |       FROM cells),
             |g AS (SELECT grp, CAST(sum(m) AS BIGINT) AS nn,
             |        CAST(sum(m * m * m - m) AS BIGINT) AS tsum
             |      FROM rk GROUP BY 1),
             |vc AS (SELECT grp, v AS variant, cents AS x, count(*) AS mv
             |       FROM ev GROUP BY 1, 2, 3),
             |pv AS (SELECT vc.grp, vc.variant,
             |         CAST(sum(vc.mv) AS BIGINT) AS n1,
             |         CAST(sum(vc.mv * rk.rank2) AS BIGINT) AS r1_2
             |       FROM vc JOIN rk ON rk.grp = vc.grp AND rk.x = vc.x
             |       GROUP BY 1, 2),
             |x AS (SELECT pv.grp, pv.variant, g.nn - pv.n1 AS n0, pv.n1,
             |        g.nn, g.tsum, pv.r1_2 - pv.n1 * (pv.n1 + 1) AS u2
             |      FROM pv JOIN g ON g.grp = pv.grp
             |      WHERE g.nn - pv.n1 > 0 AND pv.n1 > 0
             |        AND g.tsum < g.nn * g.nn * g.nn - g.nn)
             |SELECT grp, CAST(variant AS BIGINT) AS variant, n0, n1, u2,
             |  CAST(round(CAST(u2 - n0 * n1 AS DOUBLE) * 1000000.0
             |    / (2.0 * sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
             |        * (CAST(nn + 1 AS DOUBLE)
             |           - CAST(tsum AS DOUBLE)
             |             / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))))))
             |    AS BIGINT) AS z_micro
             |FROM x ORDER BY grp, variant""".stripMargin)),

    // K-variant one-vs-rest Welch's t (q207 generalized): rest-side
    // moments are integer DIFFERENCES of the group totals — one
    // per-variant pass plus one total pass, never a rescan per variant.
    Q("q234_welch_ovr",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type".as("grp"),
          ($"user_id" % 4).cast("int").as("variant"),
          round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Eval.welchOneVsRest(ev, "grp", "variant", "cents")
          .orderBy($"grp", $"variant")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS grp, user_id % 4 AS v,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |per AS (SELECT grp, v AS variant,
             |          CAST(count(*) AS BIGINT) AS n1,
             |          CAST(sum(cents) AS BIGINT) AS s1,
             |          CAST(sum(cents * cents) AS BIGINT) AS ss1
             |        FROM ev GROUP BY 1, 2),
             |tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS nt,
             |          CAST(sum(cents) AS BIGINT) AS st,
             |          CAST(sum(cents * cents) AS BIGINT) AS sst
             |        FROM ev GROUP BY 1),
             |j AS (SELECT per.grp, per.variant, per.n1, per.s1, per.ss1,
             |        tot.nt - per.n1 AS n0, tot.st - per.s1 AS s0,
             |        tot.sst - per.ss1 AS ss0
             |      FROM per JOIN tot ON tot.grp = per.grp
             |      WHERE tot.nt - per.n1 >= 2 AND per.n1 >= 2),
             |x AS (SELECT grp, variant, n0, n1,
             |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS md,
             |        (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
             |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
             |          / CAST(n1 AS DOUBLE)
             |        + (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
             |           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
             |          / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))
             |          / CAST(n0 AS DOUBLE) AS se2
             |      FROM j)
             |SELECT grp, CAST(variant AS BIGINT) AS variant, n0, n1,
             |  CAST(round(md * 1000000.0) AS BIGINT) AS mean_diff_micro,
             |  CAST(round(md * 1000000.0 / sqrt(se2)) AS BIGINT) AS t_micro
             |FROM x WHERE se2 > 0 ORDER BY grp, variant""".stripMargin)),

    // Benjamini–Hochberg FDR step-up over the q234 Welch panel — the
    // multiple-testing closure on the one-vs-rest lane: |t| → two-sided
    // p via the Abramowitz–Stegun 26.2.17 polynomial (identical Horner
    // order both engines, micro-rounded), then the exact integer
    // step-up test p_micro·m ≤ rank·α_micro at α = 0.05 and the
    // reject-ranks-1..k* closure.
    Q("q380_bh_fdr",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type".as("grp"),
          ($"user_id" % 4).cast("int").as("variant"),
          round($"value" * 100, 0).cast("long").as("cents"))
        val panel = graft.ops.Eval.welchOneVsRest(ev, "grp", "variant", "cents")
        graft.ops.Eval.bhFdr(panel, "t_micro", alphaMicro = 50000L,
            idCols = Seq("grp", "variant"))
          .orderBy($"rnk")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS grp, user_id % 4 AS v,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |per AS (SELECT grp, v AS variant,
             |          CAST(count(*) AS BIGINT) AS n1,
             |          CAST(sum(cents) AS BIGINT) AS s1,
             |          CAST(sum(cents * cents) AS BIGINT) AS ss1
             |        FROM ev GROUP BY 1, 2),
             |tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS nt,
             |          CAST(sum(cents) AS BIGINT) AS st,
             |          CAST(sum(cents * cents) AS BIGINT) AS sst
             |        FROM ev GROUP BY 1),
             |j AS (SELECT per.grp, per.variant, per.n1, per.s1, per.ss1,
             |        tot.nt - per.n1 AS n0, tot.st - per.s1 AS s0,
             |        tot.sst - per.ss1 AS ss0
             |      FROM per JOIN tot ON tot.grp = per.grp
             |      WHERE tot.nt - per.n1 >= 2 AND per.n1 >= 2),
             |x AS (SELECT grp, variant, n0, n1,
             |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS md,
             |        (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
             |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
             |          / CAST(n1 AS DOUBLE)
             |        + (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
             |           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
             |          / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))
             |          / CAST(n0 AS DOUBLE) AS se2
             |      FROM j),
             |w AS (SELECT grp, CAST(variant AS BIGINT) AS variant,
             |        CAST(round(md * 1000000.0 / sqrt(se2)) AS BIGINT) AS t_micro
             |      FROM x WHERE se2 > 0),
             |p AS (SELECT grp, variant, t_micro,
             |        CAST(round(least(
             |          exp(zz * zz / -2.0) / 2.5066282746310002
             |          * (tt * (0.319381530 + tt * (-0.356563782 + tt *
             |             (1.781477937 + tt * (-1.821255978 + tt * 1.330274429)))))
             |          * 2.0, 1.0) * 1000000.0) AS BIGINT) AS p_micro
             |      FROM (SELECT grp, variant, t_micro,
             |              CAST(abs(t_micro) AS DOUBLE) / 1000000.0 AS zz,
             |              1.0 / (1.0 + 0.2316419
             |                * (CAST(abs(t_micro) AS DOUBLE) / 1000000.0)) AS tt
             |            FROM w)),
             |r AS (SELECT *,
             |        CAST(row_number() OVER (ORDER BY p_micro, grp, variant)
             |          AS BIGINT) AS rnk,
             |        CAST(count(*) OVER () AS BIGINT) AS m
             |      FROM p),
             |ks AS (SELECT coalesce(max(CASE WHEN p_micro * m <= rnk * 50000
             |         THEN rnk END), 0) AS kstar FROM r)
             |SELECT grp, variant, t_micro, p_micro, rnk,
             |  rnk <= kstar AS reject
             |FROM r CROSS JOIN ks ORDER BY rnk""".stripMargin)),

    // MDE/power sizing per one-vs-rest cell: the smallest true shift a
    // two-sided α=.05 test detects at power .8 given the arms' realized
    // n and variance — spec-constant z multipliers, shared sqrt over
    // exact integer moment differences; relative MDE vs the rest mean.
    Q("q382_mde_power",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(
          $"event_type".as("grp"),
          ($"user_id" % 4).cast("int").as("variant"),
          round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Eval.mdePower(ev, "grp", "variant", "cents")
          .orderBy($"grp", $"variant")
      },
      Some("""WITH ev AS (
             |  SELECT event_type AS grp, user_id % 4 AS v,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |per AS (SELECT grp, v AS variant,
             |          CAST(count(*) AS BIGINT) AS n1,
             |          CAST(sum(cents) AS BIGINT) AS s1,
             |          CAST(sum(cents * cents) AS BIGINT) AS ss1
             |        FROM ev GROUP BY 1, 2),
             |tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS nt,
             |          CAST(sum(cents) AS BIGINT) AS st,
             |          CAST(sum(cents * cents) AS BIGINT) AS sst
             |        FROM ev GROUP BY 1),
             |j AS (SELECT per.grp, per.variant, per.n1, per.s1, per.ss1,
             |        tot.nt - per.n1 AS n0, tot.st - per.s1 AS s0,
             |        tot.sst - per.ss1 AS ss0
             |      FROM per JOIN tot ON tot.grp = per.grp
             |      WHERE tot.nt - per.n1 >= 2 AND per.n1 >= 2),
             |x AS (SELECT grp, variant, n0, n1, s0,
             |        (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
             |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
             |          / CAST(n1 AS DOUBLE)
             |        + (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
             |           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
             |          / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))
             |          / CAST(n0 AS DOUBLE) AS se2
             |      FROM j)
             |SELECT grp, CAST(variant AS BIGINT) AS variant, n0, n1,
             |  CAST(round(sqrt(se2) * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |    AS se_micro,
             |  CAST(round((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
             |    * sqrt(se2) * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |    AS mde_micro,
             |  CASE WHEN s0 <> 0 THEN
             |    CAST(round((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
             |      * sqrt(se2) * abs(CAST(n0 AS DOUBLE) / CAST(s0 AS DOUBLE))
             |      * CAST(1000 AS DOUBLE)) AS BIGINT) END AS mde_rel_milli
             |FROM x WHERE se2 > 0 ORDER BY grp, variant""".stripMargin)),

    // MRR waterfall per calendar month: revenue movement decomposed
    // into new / expansion / contraction / churn by a self equi-join
    // on (customer, month+1) over the pre-aggregated (customer, month)
    // table; the identity mrr(t) - mrr(t-1) = new + exp - con - churn
    // holds exactly in integer cents (spec-pinned).
    Q("q209_mrr_waterfall",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_custkey".as("cust"),
          ((year($"o_orderdate") - 1992) * 12 + month($"o_orderdate") - 1)
            .as("midx"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        graft.ops.Revenue.mrrWaterfall(o, "cust", "midx", "cents")
          .orderBy($"midx")
      },
      Some("""WITH m AS (
             |  SELECT o_custkey AS cust,
             |    CAST((year(o_orderdate) - 1992) * 12
             |         + month(o_orderdate) - 1 AS BIGINT) AS midx,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM orders GROUP BY 1, 2),
             |j AS (SELECT coalesce(a.cust, b.cust) AS cust,
             |        coalesce(a.midx, b.midx + 1) AS midx,
             |        a.rev AS rev, b.rev AS prev_rev
             |      FROM m a
             |      FULL OUTER JOIN m b
             |        ON a.cust = b.cust AND a.midx = b.midx + 1)
             |SELECT midx,
             |  CAST(sum(coalesce(rev, 0)) AS BIGINT) AS mrr_cents,
             |  CAST(sum(CASE WHEN prev_rev IS NULL THEN rev ELSE 0 END)
             |    AS BIGINT) AS new_cents,
             |  CAST(sum(CASE WHEN rev IS NOT NULL AND prev_rev IS NOT NULL
             |                     AND rev > prev_rev
             |                THEN rev - prev_rev ELSE 0 END) AS BIGINT)
             |    AS expansion_cents,
             |  CAST(sum(CASE WHEN rev IS NOT NULL AND prev_rev IS NOT NULL
             |                     AND rev < prev_rev
             |                THEN prev_rev - rev ELSE 0 END) AS BIGINT)
             |    AS contraction_cents,
             |  CAST(sum(CASE WHEN rev IS NULL THEN prev_rev ELSE 0 END)
             |    AS BIGINT) AS churned_cents
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The STREAMING sessionizer executed end-to-end under the batch
    // oracle (the q156 pattern for event-time state): every event plus
    // one far-future sentinel per user flows through
    // flatMapGroupsWithState, the sentinel flushes each user's final
    // open session through the streaming path, and the memory sink's
    // closed-session table (sentinel sessions filtered) must equal the
    // batch gaps-and-islands SQL exactly.
    Q("q210_stream_sessionize_replay",
      (s, d) => {
        import s.implicits._
        import graft.streaming.Sessionize
        val gap = 7200000000L // 2h in micros
        val raw = Tables.events(s, d) // ts normalized to TimestampType
        val root = graft.core.Scratch.dir("q210_replay")
        raw.coalesce(1).write.mode("overwrite").parquet(s"$root/data")
        val mxMicros = raw.agg(max(unix_micros($"ts"))).head.getLong(0)
        raw.select($"user_id").distinct()
          .select(lit(-1L).as("event_id"),
            timestamp_micros(lit(mxMicros + gap + 1L)).as("ts"), $"user_id",
            lit("sentinel").as("event_type"), lit(0.0).as("value"),
            lit(null).cast("string").as("props"))
          .coalesce(1).write.mode("append").parquet(s"$root/data")
        s.catalog.dropTempView("q210_sessions")
        val sess = Sessionize.runToCompletion(s, s"$root/data", gap,
          "q210_sessions")
        sess.filter($"session_start" <= mxMicros)
          .select($"user_id", $"session_start", $"session_end",
            $"n_events", $"total_value")
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsm, value
             |  FROM events),
             |l AS (SELECT *, lag(tsm) OVER (PARTITION BY user_id
             |        ORDER BY tsm) AS prev FROM e),
             |m AS (SELECT *, CASE WHEN prev IS NULL OR tsm - prev > 7200000000
             |                     THEN 1 ELSE 0 END AS new_s FROM l),
             |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
             |        ORDER BY tsm ROWS UNBOUNDED PRECEDING) AS sn FROM m)
             |SELECT user_id, min(tsm) AS session_start,
             |  max(tsm) AS session_end, count(*) AS n_events,
             |  sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0
             |    AS total_value
             |FROM s GROUP BY user_id, sn
             |ORDER BY user_id, session_start""".stripMargin)),

    // Theil-Sen robust trend per supplier over MONTHLY quantity rollups
    // (the pre-aggregation keeps the pairwise-slope table bounded:
    // ~84 months -> ~3.5k pairs/supplier). Slopes are shared-shape
    // micro doubles (negatives!); the median is the exact lower-middle
    // rank — no interpolation, engine-identical.
    Q("q211_theil_sen",
      (s, d) => {
        import s.implicits._
        val m = Tables.lineitem(s, d).select(
            $"l_suppkey".as("sk"),
            ((year($"l_shipdate") - 1992) * 12 + month($"l_shipdate") - 1)
              .cast("long").as("midx"),
            $"l_quantity".cast("long").as("q"))
          .groupBy($"sk", $"midx").agg(sum($"q").as("qty"))
        graft.ops.Eval.theilSen(m, "sk", "midx", "qty")
          .select($"grp".as("suppkey"), $"n_pairs", $"slope_micro")
          .orderBy($"suppkey")
      },
      Some("""WITH m AS (
             |  SELECT l_suppkey AS sk,
             |    CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
             |      AS BIGINT) AS midx,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |  FROM lineitem GROUP BY 1, 2),
             |p AS (SELECT a.sk AS sk, a.midx AS x1, b.midx AS x2,
             |        CAST(round(CAST(b.qty - a.qty AS DOUBLE) * 1000000.0
             |                   / CAST(b.midx - a.midx AS DOUBLE)) AS BIGINT)
             |          AS slope_micro
             |      FROM m a JOIN m b
             |        ON a.sk = b.sk AND a.midx < b.midx),
             |r AS (SELECT sk, slope_micro,
             |        count(*) OVER (PARTITION BY sk) AS cnt,
             |        row_number() OVER (PARTITION BY sk
             |          ORDER BY slope_micro, x1, x2) AS rn
             |      FROM p)
             |SELECT sk AS suppkey, CAST(cnt AS BIGINT) AS n_pairs,
             |  slope_micro
             |FROM r WHERE rn = (cnt + 1) // 2
             |ORDER BY suppkey""".stripMargin)),

    // ABC inventory classification: parts ranked by revenue, classed by
    // exact-integer cumulative-share thresholds (A <= 80%, B <= 95%)
    // — the Pareto cut on the PART dimension table; the fact table
    // collapses in one partial-combining groupBy first. The part
    // dimension SCALES with the fact table (TPC-H: |part| = 200k·SF),
    // so the cumulative revenue comes from the two-phase prefix sum —
    // the only partition-less window left is over the per-partition
    // sums (defaultParallelism rows), and the grand total is one agg
    // broadcast back, not a second global window.
    Q("q212_abc_classification",
      (s, d) => {
        import s.implicits._
        val rev = Tables.lineitem(s, d)
          .groupBy($"l_partkey".as("pk"))
          .agg(graft.core.Exact.centsSum($"l_extendedprice").as("rev"))
        val cum = graft.ops.Ranks.twoPhasePrefixSum(
          rev, Seq($"rev".desc, $"pk"), $"rev", "cum")
        val total = cum.agg(sum($"rev").as("total"))
        cum.crossJoin(broadcast(total))
          .withColumn("cls",
            when($"cum" * 5 <= $"total" * 4, "A")
              .when($"cum" * 20 <= $"total" * 19, "B").otherwise("C"))
          .groupBy($"cls")
          .agg(count(lit(1)).as("n_parts"), sum($"rev").as("rev_cents"),
            expr("(sum(rev) * 1000000) div max(total)").as("share_micro"))
          .orderBy($"cls")
      },
      Some("""WITH rev AS (
             |  SELECT l_partkey AS pk,
             |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT pk, rev,
             |        CAST(sum(rev) OVER (ORDER BY rev DESC, pk
             |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |        CAST(sum(rev) OVER () AS BIGINT) AS total
             |      FROM rev),
             |k AS (SELECT rev, total,
             |        CASE WHEN cum * 5 <= total * 4 THEN 'A'
             |             WHEN cum * 20 <= total * 19 THEN 'B'
             |             ELSE 'C' END AS cls
             |      FROM c)
             |SELECT cls, count(*) AS n_parts,
             |  CAST(sum(rev) AS BIGINT) AS rev_cents,
             |  CAST((sum(rev) * 1000000) // max(total) AS BIGINT)
             |    AS share_micro
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Longest consecutive-day activity streak per user: the volume
    // dies in one DISTINCT, islands come from the day - row_number
    // constant, runs from two bounded groupBys.
    Q("q213_longest_streak",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id",
          expr("cast(ts as long) div 86400").as("day"))
        graft.ops.Behavior.longestStreak(ev, "user_id", "day")
          .select($"user".as("user_id"), $"n_active_days",
            $"longest_streak")
          .orderBy($"user_id")
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day
             |  FROM events),
             |i AS (SELECT user_id, day,
             |        day - row_number() OVER (PARTITION BY user_id
             |          ORDER BY day) AS island
             |      FROM du),
             |runs AS (SELECT user_id, island, count(*) AS run
             |         FROM i GROUP BY 1, 2)
             |SELECT user_id, CAST(sum(run) AS BIGINT) AS n_active_days,
             |  CAST(max(run) AS BIGINT) AS longest_streak
             |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Seasonal decomposition (classical, additive): 7-day centered
    // moving-average trend on the daily revenue series (exact `div 7`
    // on full frames), day-of-week seasonal index as the mean of the
    // detrended residual — the residual can be negative, so the mean
    // is the shared round(CAST AS DOUBLE) shape, never integer div.
    // BOUND NOTE on the partition-less window: it runs over the DAILY
    // series — one row per calendar day after the groupBy collapse, a
    // few thousand rows for any horizon (the TPC-H date range is ~2.4k
    // days and does NOT scale with SF) — the standard two-phase shape
    // where the bounded post-aggregate table rides a single task.
    Q("q214_dow_decomposition",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.orders(s, d)
          .groupBy(expr(
            "cast(cast(o_orderdate as timestamp_ltz) as long) div 86400")
            .as("day"))
          .agg(graft.core.Exact.centsSum($"o_totalprice").as("cents"))
        val w = Window.orderBy($"day").rowsBetween(-3, 3)
        daily
          .withColumn("n_win", count(lit(1)).over(w))
          .withColumn("wsum", sum($"cents").over(w))
          .filter($"n_win" === 7)
          .withColumn("trend", expr("wsum div 7"))
          .withColumn("resid", $"cents" - $"trend")
          .groupBy(expr(graft.ops.Calendar.dowSql("day")).cast("long")
            .as("dow"))
          .agg(count(lit(1)).as("n_days"),
            round(sum($"resid").cast("double") * 1000000.0
              / count(lit(1)).cast("double"), 0).cast("long")
              .as("seasonal_micro"))
          .orderBy($"dow")
      },
      Some("""WITH daily AS (
             |  SELECT (epoch_us(o_orderdate) // 1000000 // 86400) AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |t AS (SELECT day, cents,
             |        count(*) OVER w AS n_win,
             |        CAST(sum(cents) OVER w AS BIGINT) // 7 AS trend
             |      FROM daily
             |      WINDOW w AS (ORDER BY day
             |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |r AS (SELECT day, cents - trend AS resid FROM t
             |      WHERE n_win = 7)
             |SELECT CAST((day + 3) % 7 AS BIGINT) AS dow,
             |  count(*) AS n_days,
             |  CAST(round(CAST(sum(resid) AS DOUBLE) * 1000000.0
             |             / CAST(count(*) AS DOUBLE)) AS BIGINT)
             |    AS seasonal_micro
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAM-STREAM interval join executed end-to-end under the batch
    // oracle (fourth streaming operator in the gate): purchases and
    // view/click streams, watermarked both sides, matched on user
    // within [purchase - 24h, purchase] through Spark's symmetric hash
    // join; the memory sink's pair table (inner join — pairs emit on
    // match, no watermark flush needed) aggregates to prior-event
    // counts that must equal the batch range-join SQL exactly.
    Q("q219_stream_interval_join_replay",
      (s, d) => {
        import s.implicits._
        import graft.streaming.IntervalJoin
        val raw = Tables.events(s, d) // ts normalized to TimestampType
        val root = graft.core.Scratch.dir("q219_replay")
        val p = raw.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("pid"), $"ts".as("pts"))
        val v = raw.filter($"event_type".isin("view", "click"))
          .select($"user_id", $"event_id".as("vid"), $"ts".as("vts"))
        p.coalesce(1).write.mode("overwrite").parquet(s"$root/p")
        v.coalesce(1).write.mode("overwrite").parquet(s"$root/v")
        val ls = s.readStream.schema(p.schema).parquet(s"$root/p")
        val rs = s.readStream.schema(v.schema).parquet(s"$root/v")
        s.catalog.dropTempView("q219_pairs")
        val q = IntervalJoin.joinWithin(ls, rs, "user_id", "pts", "vts",
            before = "24 hours", after = "0 seconds", delay = "10 minutes")
          .writeStream.outputMode("append").format("memory")
          .queryName("q219_pairs").start()
        q.processAllAvailable()
        q.stop()
        s.table("q219_pairs")
          .groupBy($"user_id", $"pid")
          .agg(count($"vid").as("n_prior"))
          .select($"user_id", $"pid".as("purchase_id"), $"n_prior")
          .orderBy($"purchase_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |p AS (SELECT user_id, event_id AS pid, us AS pus FROM e
             |      WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, event_id AS vid, us AS vus FROM e
             |      WHERE event_type IN ('view', 'click'))
             |SELECT p.user_id, p.pid AS purchase_id,
             |  count(v.vid) AS n_prior
             |FROM p JOIN v ON v.user_id = p.user_id
             |  AND v.vus >= p.pus - 86400000000 AND v.vus <= p.pus
             |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin)),

    // FIFTH streaming operator in the conformance gate: continuous
    // grouped-HLL maintenance replayed over the events file in 8
    // micro-batches (maxFilesPerTrigger=1), each batch max-merging its
    // register delta into the V2 doc store. Registers are a max-monoid
    // — associative, commutative, idempotent — so the batched state
    // must equal the direct single-pass register build the oracle
    // recomputes hash-for-hash.
    Q("q231_stream_hll_replay",
      (s, d) => {
        import s.implicits._
        import graft.streaming.{EventStream, StreamSketch}
        import graft.io.MemDocStore
        val raw = Tables.events(s, d).select($"event_type", $"user_id")
        val root = graft.core.Scratch.dir("q231_replay")
        raw.repartition(8).write.mode("overwrite").parquet(s"$root/data")
        MemDocStore.drop("q231_hll") // clean slate per run (merge is
        // idempotent on identical data, but a fresh build is the claim)
        val stream = s.readStream
          .schema(EventStream.rawSchema(s, s"$root/data"))
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/data")
        val q = StreamSketch.runHll(stream, "q231_hll", "event_type",
          "user_id", p = 6)
        q.processAllAvailable()
        q.stop()
        StreamSketch.counters(s, "q231_hll")
          .select($"event_type", $"bucket", $"register")
          .orderBy($"event_type", $"bucket")
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS k
             |  FROM events),
             |th AS (
             |  SELECT event_type, list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(k)),
             |        j -> CAST(ascii(substring(k, j, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007) AS h0
             |  FROM u),
             |mx AS (SELECT event_type,
             |        (((h0 * h0) % 1000000007) * 1103515245 + 12345) % 1000000007 AS h
             |       FROM th),
             |r AS (SELECT event_type, h % 64 AS bucket, h // 64 AS rest FROM mx)
             |SELECT event_type, bucket,
             |  max(CASE WHEN rest = 0 THEN CAST(25 AS BIGINT)
             |       ELSE 25 - length(bin(rest)) END) AS register
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Dedup impact report: the one-row answer to "what does exact
    // dedup buy us" — distinct contents, redundant copies, largest
    // clone family, all from one md5 groupBy (the q45 exact-dup key)
    // plus one aggregate over the bounded content table.
    Q("q220_dedup_impact",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .groupBy(md5($"text").as("h"))
          .agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_contents"),
            sum($"sz").as("n_docs"),
            sum($"sz" - 1).as("n_redundant"),
            max($"sz").as("max_cluster"),
            sum(when($"sz" > 1, 1L).otherwise(0L)).as("n_dup_clusters"))
      },
      Some("""WITH g AS (SELECT md5(text) AS h, count(*) AS sz
             |  FROM documents GROUP BY 1)
             |SELECT count(*) AS n_contents,
             |  CAST(sum(sz) AS BIGINT) AS n_docs,
             |  CAST(sum(sz - 1) AS BIGINT) AS n_redundant,
             |  CAST(max(sz) AS BIGINT) AS max_cluster,
             |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup_clusters
             |FROM g""".stripMargin)),

    // FIFO fill-rate / backlog per part — the shortage view q197's
    // matcher implies, from ONE conditional-aggregation pass (no join,
    // no window): matched = min(supply, demand), backlog = the excess
    // demand, fill rate in exact integer micro.
    Q("q221_fifo_backlog",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_partkey".as("partkey"))
          .agg(
            sum(when($"l_returnflag" === "R", $"l_quantity").otherwise(0)
              .cast("long")).as("supply"),
            sum(when($"l_returnflag" =!= "R", $"l_quantity").otherwise(0)
              .cast("long")).as("demand"))
          .filter($"demand" > 0)
          .select($"partkey", $"supply", $"demand",
            greatest(lit(0L), $"demand" - $"supply").as("backlog"),
            expr("(least(supply, demand) * 1000000) div demand")
              .as("fill_micro"))
          .orderBy($"partkey")
      },
      Some("""WITH g AS (
             |  SELECT l_partkey AS partkey,
             |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity
             |                  ELSE 0 END) AS BIGINT) AS supply,
             |    CAST(sum(CASE WHEN l_returnflag <> 'R' THEN l_quantity
             |                  ELSE 0 END) AS BIGINT) AS demand
             |  FROM lineitem GROUP BY 1)
             |SELECT partkey, supply, demand,
             |  greatest(CAST(0 AS BIGINT), demand - supply) AS backlog,
             |  CAST((least(supply, demand) * 1000000) // demand AS BIGINT)
             |    AS fill_micro
             |FROM g WHERE demand > 0 ORDER BY partkey""".stripMargin)),

    // Geometric and harmonic means per priority WITHOUT any cross-row
    // double accumulation: each row integerizes (ln cents in micro,
    // reciprocal in 1e15 units), the sums are exact 64-bit integers,
    // and each mean is ONE shared-shape double over two integers — the
    // engine's distributed-determinism discipline applied to the two
    // means naive float sums get wrong.
    Q("q222_robust_means",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_orderpriority".as("prio"),
            round($"o_totalprice" * 100, 0).cast("long").as("cents"))
          .filter($"cents" > 0)
          .withColumn("lnu", round(log($"cents".cast("double")) * 1000000.0, 0)
            .cast("long"))
          .withColumn("invp", expr("1000000000000000 div cents"))
        o.groupBy($"prio")
          .agg(count(lit(1)).as("n"), sum($"lnu").as("sln"),
            sum($"invp").as("sinv"))
          .select($"prio", $"n",
            round(exp($"sln".cast("double") / $"n".cast("double") / 1000000.0), 0)
              .cast("long").as("gm_cents"),
            round($"n".cast("double") * 1.0e15 / $"sinv".cast("double"), 0)
              .cast("long").as("hm_cents"))
          .orderBy($"prio")
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS prio,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |r AS (SELECT prio, cents,
             |        CAST(round(ln(CAST(cents AS DOUBLE)) * 1000000.0)
             |          AS BIGINT) AS lnu,
             |        1000000000000000 // cents AS invp
             |      FROM o WHERE cents > 0),
             |g AS (SELECT prio, count(*) AS n,
             |        CAST(sum(lnu) AS BIGINT) AS sln,
             |        CAST(sum(invp) AS BIGINT) AS sinv
             |      FROM r GROUP BY 1)
             |SELECT prio, n,
             |  CAST(round(exp(CAST(sln AS DOUBLE) / CAST(n AS DOUBLE)
             |                 / 1000000.0)) AS BIGINT) AS gm_cents,
             |  CAST(round(CAST(n AS DOUBLE) * 1.0e15
             |             / CAST(sinv AS DOUBLE)) AS BIGINT) AS hm_cents
             |FROM g ORDER BY prio""".stripMargin)),

    // Sequence-integrity audit on the KNOWN-dirty lineitem numbering
    // (duplicate (ok, ln) pairs ship in the synthetic data): per order,
    // holes = max(ln) - distinct(ln), dups = rows - distinct(ln); the
    // report is the (holes, dups) histogram — the data-quality shape
    // of the gaps-and-islands family.
    Q("q223_linenumber_gaps",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("n"),
            countDistinct($"l_linenumber").as("nd"),
            max($"l_linenumber").cast("long").as("mx"))
          .select(($"mx" - $"nd").as("holes"), ($"n" - $"nd").as("dups"))
          .groupBy($"holes", $"dups")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy($"holes", $"dups")
      },
      Some("""WITH o AS (
             |  SELECT l_orderkey, count(*) AS n,
             |    count(DISTINCT l_linenumber) AS nd,
             |    CAST(max(l_linenumber) AS BIGINT) AS mx
             |  FROM lineitem GROUP BY 1)
             |SELECT mx - nd AS holes, n - nd AS dups,
             |  count(*) AS n_orders
             |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // The custom physical operator on OVERLAPPING interval sets (the
    // general case its sweep kernel handles beyond q215's disjoint
    // cumulative axes): concurrent-session overlap between the two
    // user cohorts per event type — every (cohort-0, cohort-1) session
    // pair that overlaps in time, with exact total overlap seconds.
    // The oracle is the plain inequality range join + aggregate.
    Q("q224_interval_overlap_physical",
      (s, d) => {
        import s.implicits._
        val typeId = when($"event_type" === "click", 1L)
          .when($"event_type" === "error", 2L)
          .when($"event_type" === "purchase", 3L)
          .when($"event_type" === "signup", 4L).otherwise(5L)
        val ev = Tables.events(s, d).select(typeId.as("tid"),
          expr("cast(ts as long)").as("lo"),
          expr("cast(ts as long) + 300 + event_id % 900").as("hi"),
          ($"user_id" % 2).as("seg"), $"event_id")
        val l = ev.filter($"seg" === 0)
          .select($"tid".as("k"), $"lo", $"hi")
        val r = ev.filter($"seg" === 1)
          .select($"tid".as("k2"), $"lo".as("lo2"), $"hi".as("hi2"))
        graft.plans.IntervalOverlapJoin.join(
            l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
          .groupBy($"k".as("type_id"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(least($"hi", $"hi2") - greatest($"lo", $"lo2"))
              .as("overlap_sec"))
          .orderBy($"type_id")
      },
      Some("""WITH ev AS (
             |  SELECT CASE event_type WHEN 'click' THEN 1
             |           WHEN 'error' THEN 2 WHEN 'purchase' THEN 3
             |           WHEN 'signup' THEN 4 ELSE 5 END AS tid,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS lo,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
             |      + 300 + event_id % 900 AS hi,
             |    user_id % 2 AS seg
             |  FROM events)
             |SELECT l.tid AS type_id, count(*) AS n_pairs,
             |  CAST(sum(least(l.hi, r.hi) - greatest(l.lo, r.lo)) AS BIGINT)
             |    AS overlap_sec
             |FROM ev l JOIN ev r
             |  ON l.tid = r.tid AND l.seg = 0 AND r.seg = 1
             |  AND l.lo < r.hi AND r.lo < l.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q197 through the engine's OWN physical operator: the custom
    // LogicalPlan + SparkStrategy + IntervalOverlapJoinExec two-pointer
    // kernel (registered via GraftExtensions), answering the identical
    // plain-SQL oracle — the whole-operator extension ladder proven
    // under the correctness gate, not just a unit spec.
    Q("q215_fifo_physical",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).filter($"l_partkey" < 1000)
          .select($"l_partkey".as("pk"),
            $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
            $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
            $"l_quantity".cast("long").as("q"), $"l_returnflag".as("rf"))
        val buys = li.filter($"rf" === "R").drop("rf")
        val sells = li.filter($"rf" =!= "R").drop("rf")
        Allocate.fifoMatchPhysical(buys, sells, "pk",
            Seq("sec", "ok", "ln", "q"), "q")
          .orderBy($"key", $"buy_sec", $"buy_ok", $"buy_ln", $"buy_q",
            $"sell_sec", $"sell_ok", $"sell_ln", $"sell_q")
      },
      Some("""WITH li AS (
             |  SELECT l_partkey AS pk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(l_quantity AS BIGINT) AS q, l_returnflag AS rf
             |  FROM lineitem WHERE l_partkey < 1000),
             |b AS (SELECT pk, sec, ok, ln, q,
             |        sum(q) OVER (PARTITION BY pk ORDER BY sec, ok, ln, q
             |          ROWS UNBOUNDED PRECEDING) AS bhi
             |      FROM li WHERE rf = 'R'),
             |s AS (SELECT pk, sec, ok, ln, q,
             |        sum(q) OVER (PARTITION BY pk ORDER BY sec, ok, ln, q
             |          ROWS UNBOUNDED PRECEDING) AS dhi
             |      FROM li WHERE rf <> 'R')
             |SELECT b.pk AS key,
             |  b.sec AS buy_sec, b.ok AS buy_ok, b.ln AS buy_ln,
             |  b.q AS buy_q,
             |  s.sec AS sell_sec, s.ok AS sell_ok, s.ln AS sell_ln,
             |  s.q AS sell_q,
             |  CAST(least(b.bhi, s.dhi)
             |    - greatest(b.bhi - b.q, s.dhi - s.q) AS BIGINT)
             |    AS matched_qty
             |FROM b JOIN s ON b.pk = s.pk
             |  AND b.bhi - b.q < s.dhi AND s.dhi - s.q < b.bhi
             |ORDER BY key, buy_sec, buy_ok, buy_ln, buy_q,
             |  sell_sec, sell_ok, sell_ln, sell_q""".stripMargin)))
}
