package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.LinkGraph
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
             |ORDER BY a.day""".stripMargin)))
}
