package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.core.Exact.moneySum
import graft.ops.{AsOfJoin, GatedMerge, NameStandardizer, ScaleJoins}

/** Join operators (SURVEY.md §2.3): broadcast lookup joins (J1–J5), the
  * n-way full-outer reduce (J6–J9), two-key joins (J5/J7), semi/anti set
  * membership (P5/U4), the gated 1:1 trip merge (J11), the Levenshtein
  * self-similarity join (J14), and the greedy name standardizer (§7.3).
  *
  * Scale notes: lookup dims (nation/region) carry explicit `broadcast()`
  * hints — they stay O(100) rows at any fact-table scale. Fact-fact joins
  * (lineitem × orders) are left to Catalyst: sort-merge/shuffled-hash with
  * AQE skew splitting, shuffled on the join key once and reused.
  */
object JoinQueries extends QueryPack {

  val all: Seq[Q] = Seq(
    // J2/J3 — fact × small-dim broadcast lookup join + rollup.
    Q("q13_join_broadcast_lookup",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(
            moneySum($"l_extendedprice").as("revenue"),
            count(lit(1)).as("n_items"),
            countDistinct($"l_partkey").as("n_parts"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand,
             |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
             |  count(*) AS n_items,
             |  count(DISTINCT l_partkey) AS n_parts
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // J5 — the 5-way mapping chain (map_surveys,
    // R/preprocessing-surveys.R:974-1016): chained lookup joins ending in
    // a grouped rollup. nation/region broadcast; lineitem×orders×customer
    // are fact joins planned by Catalyst/AQE.
    Q("q14_join_chain_5way",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(moneySum($"l_extendedprice").as("revenue"), count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT r_name, n_name,
             |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // J5 (two-key) / J7 — join on a composite key, like the sites join on
    // (site_code, gaul_2_code).
    Q("q15_join_two_key",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val dim = o.groupBy($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("group_n"))
        o.join(dim, Seq("o_orderstatus", "o_orderpriority"), "left")
          .filter($"o_orderkey" < 200)
          .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority", $"group_n")
          .orderBy($"o_orderkey")
      },
      Some("""WITH dim AS (
             |  SELECT o_orderstatus, o_orderpriority, count(*) AS group_n
             |  FROM orders GROUP BY 1,2)
             |SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority, dim.group_n
             |FROM orders o
             |LEFT JOIN dim ON o.o_orderstatus = dim.o_orderstatus
             |            AND o.o_orderpriority = dim.o_orderpriority
             |WHERE o.o_orderkey < 200 ORDER BY o.o_orderkey""".stripMargin)),

    // J6 — reduce(full_join) of branch aggregates on a shared key
    // (R/preprocessing-surveys.R:286-293). Branches deliberately cover
    // different key ranges so all three null patterns appear.
    Q("q16_full_outer_reduce",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val b1 = o.filter($"o_custkey" < 250).groupBy($"o_custkey".as("custkey"))
          .agg(count(lit(1)).as("n_orders"))
        val b2 = c.filter($"c_custkey" >= 200 && $"c_custkey" < 400)
          .select($"c_custkey".as("custkey"), $"c_acctbal".as("acctbal"))
        val b3 = o.filter($"o_custkey" < 150).groupBy($"o_custkey".as("custkey"))
          .agg(moneySum($"o_totalprice").as("total_spend"))
        Seq(b1, b2, b3).reduce(_.join(_, Seq("custkey"), "full"))
          .orderBy($"custkey")
      },
      Some("""WITH b1 AS (
             |  SELECT o_custkey AS custkey, count(*) AS n_orders
             |  FROM orders WHERE o_custkey < 250 GROUP BY 1),
             |b2 AS (
             |  SELECT c_custkey AS custkey, c_acctbal AS acctbal
             |  FROM customer WHERE c_custkey >= 200 AND c_custkey < 400),
             |b3 AS (
             |  SELECT o_custkey AS custkey,
             |    sum(CAST(round(o_totalprice*100,0) AS BIGINT))/100.0 AS total_spend
             |  FROM orders WHERE o_custkey < 150 GROUP BY 1)
             |SELECT custkey, n_orders, acctbal, total_spend
             |FROM b1 FULL JOIN b2 USING (custkey) FULL JOIN b3 USING (custkey)
             |ORDER BY custkey""".stripMargin)),

    // P5 — set-membership as left-semi join (%in%, R/validation.R:317).
    Q("q17_semi_join",
      (s, d) => {
        import s.implicits._
        val big = Tables.orders(s, d).filter($"o_totalprice" > 400000)
        Tables.customer(s, d)
          .join(big, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // P5/U4 — negated membership as left-anti join (!%in%,
    // R/validation.R:440,887).
    Q("q18_anti_join",
      (s, d) => {
        import s.implicits._
        val open = Tables.orders(s, d).filter($"o_orderstatus" === "O")
        Tables.customer(s, d)
          .join(open, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name
             |FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |ORDER BY c_custkey""".stripMargin)),

    // J11 — gated 1:1 merge (merge_trips, R/merge-trips.R:44-73):
    // purchase events × error events on (user_id, day); only user-days
    // unique on BOTH sides join, the rest pass through unjoined.
    Q("q19_gated_merge",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).withColumn("day", to_date($"ts"))
        val left = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"day", $"event_id".as("p_event"), $"value".as("p_value"))
        val right = ev.filter($"event_type" === "error")
          .select($"user_id", $"day", $"event_id".as("e_event"), $"value".as("e_value"))
        GatedMerge.gatedOneToOne(left, right, Seq("user_id", "day"))
          .orderBy($"user_id", $"day", $"p_event".asc_nulls_first, $"e_event".asc_nulls_first)
      },
      Some("""WITH l AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, event_id AS p_event, value AS p_value
             |  FROM events WHERE event_type = 'purchase'),
             |r AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, event_id AS e_event, value AS e_value
             |  FROM events WHERE event_type = 'error'),
             |lc AS (SELECT *, count(*) OVER (PARTITION BY user_id, day) AS n FROM l),
             |rc AS (SELECT *, count(*) OVER (PARTITION BY user_id, day) AS n FROM r),
             |lu AS (SELECT user_id, day, p_event, p_value FROM lc WHERE n = 1),
             |ld AS (SELECT user_id, day, p_event, p_value FROM lc WHERE n > 1),
             |ru AS (SELECT user_id, day, e_event, e_value FROM rc WHERE n = 1),
             |rd AS (SELECT user_id, day, e_event, e_value FROM rc WHERE n > 1)
             |SELECT user_id, day, p_event, p_value, e_event, e_value
             |FROM lu FULL JOIN ru USING (user_id, day)
             |UNION ALL
             |SELECT user_id, day, p_event, p_value, NULL, NULL FROM ld
             |UNION ALL
             |SELECT user_id, day, NULL, NULL, e_event, e_value FROM rd
             |ORDER BY user_id, day, p_event NULLS FIRST, e_event NULLS FIRST""".stripMargin)),

    // J14 — self-similarity join with the built-in levenshtein expression
    // (stringdist matrix, R/preprocessing-surveys.R:1322-1332). The cross
    // join runs over the *distinct* name set, which stays tiny.
    Q("q20_levenshtein_pairs",
      (s, d) => {
        import s.implicits._
        val a = Tables.nation(s, d).select($"n_name".as("a"))
        val b = Tables.nation(s, d).select($"n_name".as("b"))
        a.crossJoin(b)
          .filter($"a" < $"b" && levenshtein($"a", $"b") <= 2)
          .select($"a", $"b", levenshtein($"a", $"b").cast("long").as("dist"))
          .orderBy($"a", $"b")
      },
      Some("""SELECT a.n_name AS a, b.n_name AS b, levenshtein(a.n_name, b.n_name) AS dist
             |FROM nation a, nation b
             |WHERE a.n_name < b.n_name AND levenshtein(a.n_name, b.n_name) <= 2
             |ORDER BY 1, 2""".stripMargin)),

    // §7.3 — greedy name standardization over a synthetic messy-name
    // column (segment names with injected first-two-letter transpositions,
    // mirroring enumerator typos). The greedy fixpoint maps every typo
    // back to its most frequent neighbor.
    Q("q21_name_standardize",
      (s, d) => {
        import s.implicits._
        val typo = concat(
          substring($"c_mktsegment", 2, 1),
          substring($"c_mktsegment", 1, 1),
          substring($"c_mktsegment", 3, 100))
        val df = Tables.customer(s, d)
          .withColumn("name", when($"c_custkey" % 11 === 0, typo).otherwise($"c_mktsegment"))
        NameStandardizer.standardize(s, df, "name", maxDist = 2)
          .groupBy($"name", $"name_canonical")
          .agg(count(lit(1)).as("n"))
          .orderBy($"name")
      },
      Some("""SELECT CASE WHEN c_custkey % 11 = 0
             |         THEN substring(c_mktsegment,2,1) || substring(c_mktsegment,1,1) || substring(c_mktsegment,3,100)
             |         ELSE c_mktsegment END AS name,
             |       c_mktsegment AS name_canonical,
             |       count(*) AS n
             |FROM customer GROUP BY 1,2 ORDER BY 1""".stripMargin)),

    // A16/W5 — grouped max + offset renumber (appended length rows,
    // R/survey-reshaping.R:430-446): pre-filter max over the partition,
    // then row_number over the filtered subset offsets past it.
    Q("q22_renumber_window",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_orderkey")
        val wo = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
        Tables.lineitem(s, d)
          .withColumn("mx", max($"l_linenumber").over(w))
          .filter($"l_quantity" >= 45)
          .withColumn("new_n", ($"mx" + row_number().over(wo)).cast("long"))
          .filter($"l_orderkey" < 500)
          .select($"l_orderkey", $"l_linenumber", $"new_n")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""WITH m AS (SELECT l_orderkey, max(l_linenumber) AS mx FROM lineitem GROUP BY 1),
             |f AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 45)
             |SELECT f.l_orderkey, f.l_linenumber,
             |  mx + row_number() OVER (PARTITION BY f.l_orderkey ORDER BY f.l_linenumber) AS new_n
             |FROM f JOIN m USING (l_orderkey)
             |WHERE f.l_orderkey < 500 ORDER BY 1, 2""".stripMargin)),

    // As-of (point-in-time) join: each event picks up its user's most
    // recent order at-or-before the event second — union-merge plan
    // (one shuffle + one window), not a per-row probe. Ties at equal
    // order time resolve to the max o_orderkey on both engines.
    Q("q90_asof_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id".as("k"), $"ts".cast("long").as("t"), $"event_id")
        // o_orderdate is TIMESTAMP_NTZ; session tz is UTC so the
        // NTZ→LTZ cast is instant-preserving and →long gives UTC epoch
        val osec = $"o_orderdate".cast("timestamp_ltz").cast("long")
        val ord = Tables.orders(s, d)
          .select($"o_custkey".as("k"), osec.as("t"), $"o_orderkey", osec.as("ot"))
        AsOfJoin.lastPrior(ev, ord, "k", "t", "o_orderkey", Seq("ot"))
          .select($"event_id", $"k".as("user_id"),
            $"o_orderkey".as("last_order_key"),
            expr("(t - ot) div 3600").as("gap_hours"))
          .orderBy($"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id AS k,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t, event_id
             |  FROM events),
             |ord AS (
             |  SELECT o_custkey AS k, epoch_us(o_orderdate) // 1000000 AS t, o_orderkey
             |  FROM orders),
             |u AS (
             |  SELECT k, t, 0 AS side, o_orderkey, NULL::BIGINT AS event_id FROM ord
             |  UNION ALL
             |  SELECT k, t, 1, NULL, event_id FROM ev),
             |w AS (
             |  SELECT k, t, side, event_id,
             |    last_value(o_orderkey IGNORE NULLS) OVER
             |      (PARTITION BY k ORDER BY t, side, coalesce(o_orderkey, 9223372036854775807)
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_order_key,
             |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER
             |      (PARTITION BY k ORDER BY t, side, coalesce(o_orderkey, 9223372036854775807)
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ot
             |  FROM u)
             |SELECT event_id, k AS user_id, last_order_key,
             |  CAST((t - ot) // 3600 AS BIGINT) AS gap_hours
             |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin)),

    // Range join with no equi key (event time proximity): for every
    // purchase event, how many events of ANY user landed within ±1 h.
    // Binned-equi-join plan — the time axis discretized to 1 h bins so
    // the range predicate rides an equi shuffle, never a nested loop.
    Q("q91_range_join_bins",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_id", $"ts".cast("long").as("t"), $"event_type")
        val anchors = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"t")
        ScaleJoins.rangeCountByBins(anchors, ev.select($"t"), "event_id", "t",
            before = 3600L, after = 3600L, binSec = 3600L)
          .orderBy($"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t,
             |    event_type
             |  FROM events)
             |SELECT a.event_id, count(*) AS n_nearby
             |FROM ev a JOIN ev p ON p.t >= a.t - 3600 AND p.t < a.t + 3600
             |WHERE a.event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SCD Type-2 dimension history: each customer's order-priority
    // change log collapsed into versioned validity intervals — runs of
    // identical values merge, each version closed at the next one's
    // start. Two windows over ONE partitionBy(custkey) exchange
    // (Scd2Spec pins the single-shuffle plan).
    Q("q108_scd2_history",
      (s, d) => {
        import s.implicits._
        val log = Tables.orders(s, d).select($"o_custkey",
          $"o_orderdate".cast("timestamp_ltz").cast("long").as("eff_sec"),
          $"o_orderkey", $"o_orderpriority")
        graft.ops.Scd2.fromChangeLog(log, Seq("o_custkey"),
            Seq("o_orderpriority"), "eff_sec", Seq("o_orderkey"))
          .select($"o_custkey", $"version",
            $"o_orderpriority".as("priority"),
            $"effective_from", $"effective_to", $"is_current")
          .orderBy($"o_custkey", $"version")
      },
      Some("""WITH log AS (
             |  SELECT o_custkey, epoch_us(o_orderdate) // 1000000 AS eff_sec,
             |    o_orderkey, o_orderpriority
             |  FROM orders),
             |chg AS (
             |  SELECT *,
             |    o_orderpriority IS DISTINCT FROM
             |      lag(o_orderpriority) OVER
             |        (PARTITION BY o_custkey ORDER BY eff_sec, o_orderkey) AS changed
             |  FROM log),
             |kept AS (SELECT * FROM chg WHERE changed)
             |SELECT o_custkey,
             |  CAST(row_number() OVER w AS BIGINT) AS version,
             |  o_orderpriority AS priority,
             |  eff_sec AS effective_from,
             |  lead(eff_sec) OVER w AS effective_to,
             |  lead(eff_sec) OVER w IS NULL AS is_current
             |FROM kept
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY eff_sec, o_orderkey)
             |ORDER BY o_custkey, version""".stripMargin)),

    // Skew-mitigated salted equi-join (the FIX paired with q97's skew
    // diagnostic): the fact side salted into 8 subkeys, the dimension
    // replicated per salt — result provably identical to the plain
    // join (the oracle IS the plain join), work spread across 8x the
    // tasks for any hot key.
    Q("q116_salted_join",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_suppkey", $"l_extendedprice")
        val sup = Tables.supplier(s, d)
          .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
        graft.ops.ScaleJoins.saltedJoin(li, sup, "l_suppkey", salts = 8)
          .groupBy($"s_nationkey")
          .agg(graft.core.Exact.moneySum($"l_extendedprice").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey,
             |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Jaro-Winkler fuzzy name matching via the native codegen
    // expression (graft.functions.JaroWinkler), semantics pinned to
    // DuckDB's jaro_winkler_similarity so the oracle calls it DIRECTLY
    // — the strongest form of cross-engine agreement for a custom
    // Expression.
    Q("q124_jaro_winkler_pairs",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.ensureRegistered(s)
        val names = Tables.part(s, d).select($"p_name").distinct()
        val a = names.select($"p_name".as("a"))
        val b = names.select($"p_name".as("b"))
        a.crossJoin(b)
          .filter($"a" < $"b")
          .withColumn("jw", graft.core.Exact.r6(
            graft.functions.JaroWinkler.jaroWinkler($"a", $"b")))
          .filter($"jw" >= 0.8)
          .select($"a", $"b", $"jw")
          .orderBy($"a", $"b")
      },
      Some("""WITH n AS (SELECT DISTINCT p_name FROM part)
             |SELECT a.p_name AS a, b.p_name AS b,
             |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) + 0.0 AS jw
             |FROM n a, n b
             |WHERE a.p_name < b.p_name
             |  AND round(jaro_winkler_similarity(a.p_name, b.p_name), 6) + 0.0 >= 0.8
             |ORDER BY 1, 2""".stripMargin)),

    // Bucketed co-located fact-to-fact join: both sides written
    // bucketed+sorted on the key, the join plans with NO exchange
    // (ScaleJoinsSpec asserts it) — the layout investment that turns
    // every subsequent key join into a local merge at 100 TB. The
    // oracle is the plain join.
    Q("q126_bucketed_join",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_quantity")
        val o = Tables.orders(s, d)
          .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
        graft.ops.ScaleJoins.bucketedJoin(s, li, o, "l_orderkey", 8,
            "q126_li", "q126_o")
          .groupBy($"o_orderpriority")
          .agg(sum($"l_quantity").cast("long").as("total_qty"),
            count(lit(1)).as("n_items"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
             |  count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Partitioned-write + partition-pruned read: events written
    // day-partitioned, the month-filtered read touches only matching
    // partitions (PartitionPruningSpec pins the pruned file count on
    // this layout pattern). Oracle recomputes from the unpartitioned
    // source.
    Q("q127_partitioned_write_prune",
      (s, d) => {
        import s.implicits._
        val dir = graft.core.Scratch.dir("q127_evprt")
        Tables.events(s, d)
          .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("day").parquet(dir)
        s.read.parquet(dir)
          .filter($"day" >= "2024-01-08" && $"day" < "2024-01-15")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            graft.core.Exact.centsSum($"value").as("value_cents"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events
             |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') >= '2024-01-08'
             |  AND strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') < '2024-01-15'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The q91 semantics written NAIVELY — a pure range-band join with
    // no equi key, exactly what stock Spark plans as an O(n*m) nested
    // loop. The injected RangeJoinBinning rule must rewrite it into
    // the two binned equi-join arms (PlanAuditSpec asserts the
    // executed plan has no nested loop); the oracle is the same SQL as
    // q91, so manual dataflow (q91) and rule-rewritten declarative
    // form (this query) are both pinned to the identical result.
    Q("q154_range_join_rule",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_id", $"ts".cast("long").as("t"), $"event_type")
        val anchors = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"t".as("at"))
        val others = ev.select($"t".as("pt"))
        anchors.join(others, $"pt" >= $"at" - 3600L && $"pt" < $"at" + 3600L)
          .groupBy($"event_id").agg(count(lit(1)).as("n_nearby"))
          .orderBy($"event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t,
             |    event_type
             |  FROM events)
             |SELECT a.event_id, count(*) AS n_nearby
             |FROM ev a JOIN ev p ON p.t >= a.t - 3600 AND p.t < a.t + 3600
             |WHERE a.event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
