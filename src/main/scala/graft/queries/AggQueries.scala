package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.core.Exact.{moneySum, r4}
import graft.functions.RobustBounds

/** Aggregation operators (SURVEY.md §2.4, §2.5): grouped sums/means/
  * medians/quantiles (A1–A5), deterministic first via min_by (A7),
  * min/max (A8), string-agg of distinct values (A9), conditional agg
  * (A10), window add-count (A11/W3), mode per group (A12), share-of-total
  * (A13/W4), robust median+MAD bounds (A15).
  *
  * Scale notes: every groupBy here is a partial+final HashAggregate (one
  * shuffle on the group keys); windows shuffle once on the partition key.
  * No driver collects anywhere.
  */
object AggQueries extends QueryPack {

  val all: Seq[Q] = Seq(
    // A1 A2 A5 — pricing summary (the reference's per-trip sum/mean rollups,
    // R/preprocessing-surveys.R:783-793, re-expressed on lineitem).
    Q("q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            moneySum($"l_extendedprice").as("sum_base_price"),
            moneySum($"l_discount").as("sum_disc"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", $"sum_qty" / $"count_order")
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS sum_base_price,
             |  sum(CAST(round(l_discount*100,0) AS BIGINT))/100.0 AS sum_disc,
             |  count(*) AS count_order,
             |  sum(l_quantity)/count(*) AS avg_qty
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // A6 A8 — distinct counts and min/max extremes per group.
    Q("q02_distinct_minmax",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_linestatus")
          .agg(
            countDistinct($"l_orderkey").as("n_orders"),
            countDistinct($"l_partkey").as("n_parts"),
            min($"l_shipdate").as("min_ship"),
            max($"l_shipdate").as("max_ship"),
            min($"l_quantity").as("min_qty"),
            max($"l_quantity").as("max_qty"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  count(DISTINCT l_orderkey) AS n_orders,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
             |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A3 A4 — exact percentile (linear interpolation = R type-7), the
    // reference's median/quantile summaries (R/export.R:570-578,
    // R/model-taxa.R:193-212). percentile, NOT percentile_approx: the
    // oracle compares hashes. Exact percentile buffers the whole group
    // — fine at the reference's group sizes; a 100 TB deployment with
    // skewed groups swaps in graft.functions.Percentiles
    // .percentileSketch (bounded GK sketch, rank-error contract pinned
    // by PercentilesSpec).
    Q("q03_median_quantiles",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            r4(expr("percentile(l_quantity, 0.5)")).as("med_qty"),
            r4(expr("percentile(l_extendedprice, 0.60D)")).as("p60_price"),
            r4(expr("percentile(l_extendedprice, 0.75D)")).as("p75_price"),
            r4(expr("percentile(l_extendedprice, 0.95D)")).as("p95_price"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
             |  round(quantile_cont(l_extendedprice, 0.60), 4) AS p60_price,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
             |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A7 A1 — per-"trip" rollup with deterministic first/last attribute
    // grab. The reference's dplyr first() relies on row order
    // (R/validation.R:334-346); here min_by/max_by on an explicit ordering
    // column makes it order-independent — the shuffle-safe form.
    Q("q04_trip_rollup_firsts",
      (s, d) => {
        import s.implicits._
        // min_by/max_by keyed on the UNIQUE o_orderkey: ties would make
        // first() engine-dependent (the §7.4 nondeterminism trap).
        Tables.orders(s, d)
          .groupBy($"o_custkey")
          .agg(
            min_by($"o_orderstatus", $"o_orderkey").as("first_status"),
            min_by($"o_orderpriority", $"o_orderkey").as("first_prio"),
            max_by($"o_orderstatus", $"o_orderkey").as("last_status"),
            min($"o_orderdate").as("earliest"),
            count(lit(1)).as("n_orders"),
            Exact.centsSum($"o_totalprice").as("cents"))
          .select($"o_custkey", $"first_status", $"first_prio", $"last_status",
            $"earliest", $"n_orders",
            ($"cents" / 100.0).as("spend"),
            ($"cents" / $"n_orders" / 100.0).as("spend_per_order"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, first_status, first_prio, last_status, earliest, n_orders,
             |  cents/100.0 AS spend, cents/n_orders/100.0 AS spend_per_order
             |FROM (
             |  SELECT o_custkey,
             |    arg_min(o_orderstatus, o_orderkey) AS first_status,
             |    arg_min(o_orderpriority, o_orderkey) AS first_prio,
             |    arg_max(o_orderstatus, o_orderkey) AS last_status,
             |    min(o_orderdate) AS earliest,
             |    count(*) AS n_orders,
             |    CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1)
             |ORDER BY o_custkey""".stripMargin)),

    // A9 — string-agg of sorted distinct values (reference
    // paste(unique(...), collapse="-"), R/export.R:107).
    Q("q05_stringagg_distinct",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(
            array_join(array_sort(collect_set($"o_orderstatus")), "-").as("statuses"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  string_agg(DISTINCT o_orderstatus, '-' ORDER BY o_orderstatus) AS statuses,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A10 — conditional aggregate: all-null group → null, else join of the
    // non-null distinct values (reference R/validation.R:244-248).
    Q("q06_conditional_stringagg",
      (s, d) => {
        import s.implicits._
        val v = when($"l_quantity" > 48, $"l_linestatus")
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(collect_set(v).as("vs"), count(lit(1)).as("n_rows"))
          .select(
            $"l_returnflag",
            when(size($"vs") === 0, lit(null).cast("string"))
              .otherwise(array_join(array_sort($"vs"), ",")).as("big_statuses"),
            $"n_rows")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CASE WHEN count(CASE WHEN l_quantity > 48 THEN 1 END) = 0 THEN NULL
             |       ELSE string_agg(DISTINCT CASE WHEN l_quantity > 48 THEN l_linestatus END,
             |                       ',' ORDER BY CASE WHEN l_quantity > 48 THEN l_linestatus END)
             |  END AS big_statuses,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A12 — mode / predominant value per group (reference's predominant
    // gear, R/preprocessing-surveys.R:806-821), with a deterministic
    // lexicographic tie-break.
    Q("q07_mode_per_group",
      (s, d) => {
        import s.implicits._
        val cnt = Tables.events(s, d)
          .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type".asc)
        cnt.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type".as("top_event"), $"cnt".as("n"))
          .orderBy($"user_id")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1,2)
             |SELECT user_id, event_type AS top_event, cnt AS n
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn FROM c)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // A13 W4 — share-of-total within a partition (species % of site catch,
    // R/preprocessing-surveys.R:885-889). Window sums use exact integer
    // cents so the share is bit-stable under any shuffle order.
    Q("q08_share_of_total",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey")
        val cents = round($"c_acctbal" * 100, 0).cast("long")
        Tables.customer(s, d)
          .select($"c_custkey", $"c_nationkey",
            r4(cents / sum(cents).over(w)).as("bal_share"))
          .filter($"c_custkey" < 300)
          .orderBy($"c_custkey")
      },
      Some("""SELECT * FROM (
             |  SELECT c_custkey, c_nationkey,
             |    round(CAST(round(c_acctbal*100,0) AS BIGINT)
             |          / sum(CAST(round(c_acctbal*100,0) AS BIGINT)) OVER (PARTITION BY c_nationkey), 4) + 0.0 AS bal_share
             |  FROM customer)
             |WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin)),

    // A11 W3 — add_count: group size kept on every row
    // (R/preprocessing-surveys.R:808-809; R/merge-trips.R:46-47).
    Q("q09_window_addcount",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        Tables.events(s, d)
          .filter($"user_id" < 5)
          .select($"event_id", $"user_id",
            count(lit(1)).over(w).as("n_user_events"),
            (sum(round($"value" * 100, 0).cast("long")).over(w) / 100.0).as("user_total"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             |  count(*) OVER (PARTITION BY user_id) AS n_user_events,
             |  sum(CAST(round(value*100,0) AS BIGINT)) OVER (PARTITION BY user_id)/100.0 AS user_total
             |FROM events WHERE user_id < 5 ORDER BY event_id""".stripMargin)),

    // A15 — robust outlier bounds via the custom LocScaleB Aggregator
    // (median ± k·MAD on ln(x+1), upper bound exponentiated back; see
    // graft.functions.RobustBounds for the formula + guards).
    Q("q10_robust_bounds",
      (s, d) => {
        import s.implicits._
        val f = RobustBounds.locScaleB(3.0)
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(f($"l_quantity").as("b"))
          .select($"l_returnflag", $"l_linestatus",
            r4($"b.lower_log").as("lower_log"),
            r4($"b.upper").as("upper_bound"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""WITH g AS (
             |  SELECT l_returnflag, l_linestatus, l_quantity AS x, ln(l_quantity + 1) AS y FROM lineitem),
             |med AS (
             |  SELECT l_returnflag, l_linestatus, median(x) AS mex, median(y) AS mey
             |  FROM g GROUP BY 1,2),
             |m AS (
             |  SELECT g.l_returnflag, g.l_linestatus, any_value(med.mey) AS mey,
             |    1.4826*median(abs(g.x - med.mex)) AS madx,
             |    1.4826*median(abs(g.y - med.mey)) AS mady
             |  FROM g JOIN med USING (l_returnflag, l_linestatus) GROUP BY 1,2)
             |SELECT l_returnflag, l_linestatus,
             |  CASE WHEN madx <= 0 THEN NULL ELSE round(mey - 3*mady, 4) + 0.0 END AS lower_log,
             |  CASE WHEN madx <= 0 THEN NULL ELSE round(exp(mey + 3*mady), 4) END AS upper_bound
             |FROM m ORDER BY 1,2""".stripMargin)),

    // Multi-granularity summary as ONE rollup pass — the Spark-first
    // form of the reference's separate-groupBys-then-union pattern
    // (R/preprocessing-surveys.R:908-916; SURVEY.md §2.4 note): district
    // ≙ priority, gear ≙ status; grouping_id distinguishes levels.
    Q("q65_rollup_summary",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .rollup($"o_orderpriority", $"o_orderstatus")
          .agg(count(lit(1)).as("n"),
            moneySum($"o_totalprice").as("spend"),
            grouping_id().as("level"))
          .orderBy($"level", $"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
      },
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             |  sum(CAST(round(o_totalprice*100,0) AS BIGINT))/100.0 AS spend,
             |  CAST(GROUPING(o_orderpriority)*2 + GROUPING(o_orderstatus) AS BIGINT) AS level
             |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
             |ORDER BY level, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // W1 W2 O2 O3 P10 — rank window + top-k per group.
    Q("q11_rank_topk",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey".asc)
        Tables.part(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 2)
          .select($"p_brand", $"rn", $"p_partkey", $"p_retailprice")
          .orderBy($"p_brand", $"rn")
      },
      Some("""SELECT p_brand, rn, p_partkey, p_retailprice
             |FROM (SELECT p_brand, p_partkey, p_retailprice,
             |        row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
             |      FROM part)
             |WHERE rn <= 2 ORDER BY p_brand, rn""".stripMargin)),

    // O4 A13 — top-N + "Other" bucket rollup with shares (reference
    // R/export.R:644-667): rank groups, relabel the tail, re-aggregate.
    // Cents stay integral until the final division so the re-aggregation
    // is exact.
    Q("q12_topn_other",
      (s, d) => {
        import s.implicits._
        val sums = Tables.events(s, d)
          .groupBy($"event_type", $"user_id")
          .agg(sum(round($"value" * 100, 0).cast("long")).as("vc"))
        val w = Window.partitionBy($"event_type").orderBy($"vc".desc, $"user_id".asc)
        val wt = Window.partitionBy($"event_type")
        sums.withColumn("rn", row_number().over(w))
          .withColumn("who", when($"rn" <= 3, $"user_id".cast("string")).otherwise(lit("Other")))
          .groupBy($"event_type", $"who")
          .agg(sum($"vc").as("vc2"), count(lit(1)).as("n_users"))
          .select($"event_type", $"who",
            ($"vc2" / 100.0).as("total_value"),
            $"n_users",
            r4($"vc2" / sum($"vc2").over(wt)).as("share"))
          .orderBy($"event_type", $"who")
      },
      Some("""WITH s AS (
             |  SELECT event_type, user_id, sum(CAST(round(value*100,0) AS BIGINT)) AS vc
             |  FROM events GROUP BY 1,2),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vc DESC, user_id) AS rn FROM s),
             |g AS (
             |  SELECT event_type,
             |    CASE WHEN rn <= 3 THEN CAST(user_id AS VARCHAR) ELSE 'Other' END AS who,
             |    CAST(sum(vc) AS BIGINT) AS vc2, count(*) AS n_users
             |  FROM r GROUP BY 1,2)
             |SELECT event_type, who, vc2/100.0 AS total_value, n_users,
             |  round(vc2 / CAST(sum(vc2) OVER (PARTITION BY event_type) AS DOUBLE), 4) AS share
             |FROM g ORDER BY event_type, who""".stripMargin)),

    // W — RANGE-frame rolling window over a calendar key: daily actives
    // and a 7-day trailing window on the integer day index. The range
    // frame runs on the DAY table (#days rows after the daily rollup),
    // so the single-partition ordered window is bin-sized, not
    // data-sized; all outputs are integer sums (order-independent).
    Q("q96_rolling_dau",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(expr("cast(ts as long) div 86400").as("day"), $"user_id")
        val daily = ev.groupBy($"day")
          .agg(countDistinct($"user_id").as("dau"), count(lit(1)).as("n_events"))
        val w = Window.orderBy($"day").rangeBetween(-6, Window.currentRow)
        daily
          .select($"day", $"dau", $"n_events",
            sum($"n_events").over(w).as("events_7d"),
            sum($"dau").over(w).as("dau_sum_7d"))
          .orderBy($"day")
      },
      Some("""WITH e AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day, user_id
             |  FROM events),
             |d AS (
             |  SELECT day, count(DISTINCT user_id) AS dau, count(*) AS n_events
             |  FROM e GROUP BY 1)
             |SELECT day, dau, n_events,
             |  CAST(sum(n_events) OVER
             |    (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_7d,
             |  CAST(sum(dau) OVER
             |    (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS dau_sum_7d
             |FROM d ORDER BY day""".stripMargin)),

    // Key-skew diagnostic — the pre-join audit for the 100 TB posture:
    // per-key counts (one partial+final agg), then a one-row summary of
    // the count distribution (exact type-7 percentiles + max/avg skew
    // ratio). What you run BEFORE picking salting/broadcast strategies.
    Q("q97_key_skew",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_partkey").agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_keys"), sum($"n").as("n_rows"),
            max($"n").as("max_n"),
            r4(expr("percentile(n, 0.5)")).as("p50_n"),
            r4(expr("percentile(n, 0.99)")).as("p99_n"),
            round(max($"n") / (sum($"n") / count(lit(1))) * 1000000, 0)
              .cast("long").as("skew_micro"))
      },
      Some("""WITH c AS (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1)
             |SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
             |  max(n) AS max_n,
             |  round(quantile_cont(n, 0.5), 4) AS p50_n,
             |  round(quantile_cont(n, 0.99), 4) AS p99_n,
             |  CAST(round(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)) * 1000000) AS BIGINT) AS skew_micro
             |FROM c""".stripMargin)),

    // Group-wise z-score outlier gate on EXACT integer moments: cents
    // sums and sums-of-squares ride decimal(38)/HUGEINT (exact, order-
    // independent — a distributed double variance is not reproducible),
    // the double mean/std/z derive from those exact integers through
    // the identical expression shape on both engines. Two passes: tiny
    // per-group stats broadcast back over the fact table.
    Q("q98_zscore_outliers",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_orderpriority".as("grp"),
          round($"o_totalprice" * 100, 0).cast("long").as("c"))
        val stats = o.groupBy($"grp")
          .agg(count(lit(1)).as("n"),
            sum($"c".cast("decimal(38,0)")).as("s"),
            sum(($"c" * $"c").cast("decimal(38,0)")).as("sq"))
          .select($"grp", $"n",
            ($"s".cast("double") / $"n").as("mean_c"),
            sqrt(($"sq".cast("double") - $"s".cast("double") * $"s".cast("double") / $"n")
              / ($"n" - lit(1))).as("std_c"))
        o.join(broadcast(stats), "grp")
          .groupBy($"grp", $"n", $"mean_c", $"std_c")
          .agg(
            sum(when(($"c" - $"mean_c") / $"std_c" > 2, 1L).otherwise(0L)).as("n_hi"),
            sum(when(($"c" - $"mean_c") / $"std_c" < -2, 1L).otherwise(0L)).as("n_lo"))
          .select($"grp", $"n", r4($"mean_c" / 100.0).as("mean_price"),
            r4($"std_c" / 100.0).as("std_price"), $"n_hi", $"n_lo")
          .orderBy($"grp")
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(round(o_totalprice*100, 0) AS BIGINT) AS c
             |  FROM orders),
             |st AS (SELECT grp, count(*) AS n, sum(c) AS s, sum(c*c) AS sq
             |       FROM o GROUP BY 1),
             |m AS (
             |  SELECT grp, n, CAST(s AS DOUBLE)/n AS mean_c,
             |    sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/(n-1)) AS std_c
             |  FROM st)
             |SELECT m.grp, CAST(m.n AS BIGINT) AS n,
             |  round(mean_c/100.0, 4)+0.0 AS mean_price,
             |  round(std_c/100.0, 4)+0.0 AS std_price,
             |  CAST(sum(CASE WHEN (o.c - mean_c)/std_c > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
             |  CAST(sum(CASE WHEN (o.c - mean_c)/std_c < -2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo
             |FROM o JOIN m USING (grp)
             |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin)),

    // Winsorized (clipped) robust mean per group: p05/p95 clip bounds
    // from exact percentiles, ROUNDED TO INTEGER CENTS before clipping
    // so the winsorized sum is an exact integer — a clipped double sum
    // would be order-dependent under distributed aggregation. Two
    // passes: tiny per-group bounds broadcast back.
    Q("q102_winsorized_mean",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_returnflag".as("grp"),
          round($"l_extendedprice" * 100, 0).cast("long").as("c"))
        val st = li.groupBy($"grp").agg(
          round(expr("percentile(c, 0.05)"), 0).cast("long").as("lo"),
          round(expr("percentile(c, 0.95)"), 0).cast("long").as("hi"))
        li.join(broadcast(st), "grp")
          .groupBy($"grp")
          .agg(count(lit(1)).as("n"),
            (sum(least(greatest($"c", $"lo"), $"hi")) / count(lit(1)) / 100.0).as("m"),
            sum(when($"c" < $"lo", 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when($"c" > $"hi", 1L).otherwise(0L)).as("n_clip_hi"),
            (min($"lo") / 100.0).as("lo_price"), (min($"hi") / 100.0).as("hi_price"))
          .select($"grp", $"n", r4($"m").as("mean_winsorized"),
            $"n_clip_lo", $"n_clip_hi", $"lo_price", $"hi_price")
          .orderBy($"grp")
      },
      Some("""WITH li AS (
             |  SELECT l_returnflag AS grp,
             |    CAST(round(l_extendedprice*100, 0) AS BIGINT) AS c
             |  FROM lineitem),
             |st AS (
             |  SELECT grp,
             |    CAST(round(quantile_cont(c, 0.05), 0) AS BIGINT) AS lo,
             |    CAST(round(quantile_cont(c, 0.95), 0) AS BIGINT) AS hi
             |  FROM li GROUP BY 1)
             |SELECT li.grp, count(*) AS n,
             |  round(CAST(sum(least(greatest(c, lo), hi)) AS BIGINT) / count(*) / 100.0, 4)+0.0 AS mean_winsorized,
             |  CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             |  CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
             |  min(lo) / 100.0 AS lo_price, min(hi) / 100.0 AS hi_price
             |FROM li JOIN st USING (grp)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Z-order (Morton) layout audit: interleave (user, day) into one
    // sort key and report per 256-key block how tight the min/max
    // bounds are in BOTH dimensions — the file-statistics locality a
    // Z-ordered writer buys for two-dimensional scan pruning. The key
    // is div/mod arithmetic (engine-portable); the oracle's expression
    // is GENERATED from the same term list (Layout.zKeySql) so the two
    // sides cannot drift.
    Q("q103_zorder_layout",
      (s, d) => {
        import s.implicits._
        import graft.ops.Layout
        val ev = Tables.events(s, d).select($"event_id", $"user_id",
          expr("cast(ts as long) div 86400 - 19723").as("day"))
        ev.withColumn("z", Layout.zKey($"user_id", $"day", 8))
          .groupBy(expr("z div 256").as("block"))
          .agg(count(lit(1)).as("n"),
            min($"user_id").as("min_user"), max($"user_id").as("max_user"),
            min($"day").as("min_day"), max($"day").as("max_day"))
          .orderBy($"block")
      },
      Some(s"""WITH e AS (
              |  SELECT event_id, user_id,
              |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 - 19723 AS day
              |  FROM events),
              |z AS (
              |  SELECT user_id, day,
              |    ${graft.ops.Layout.zKeySql("user_id", "day", 8)} AS z
              |  FROM e)
              |SELECT z // 256 AS block, count(*) AS n,
              |  min(user_id) AS min_user, max(user_id) AS max_user,
              |  CAST(min(day) AS BIGINT) AS min_day, CAST(max(day) AS BIGINT) AS max_day
              |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // GROUPING SETS with a non-hierarchical set list — ((rf,ls), (ls),
    // ()): q65's rollup covers the hierarchy case; this pins arbitrary
    // sets + an explicit engine-portable grouping id (grouping()·2 +
    // grouping() — never the engine's own gid bit order).
    Q("q105_grouping_sets",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupingSets(
            Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_linestatus"), Seq()),
            $"l_returnflag", $"l_linestatus")
          .agg(moneySum($"l_extendedprice").as("revenue"),
            count(lit(1)).as("n"),
            (grouping($"l_returnflag") * 2 + grouping($"l_linestatus"))
              .cast("long").as("gid"))
          .orderBy($"gid", coalesce($"l_returnflag", lit("~")),
            coalesce($"l_linestatus", lit("~")))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
             |  count(*) AS n,
             |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
             |ORDER BY gid, coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~')""".stripMargin)),

    // Incremental aggregate maintenance: fold the post-cutoff delta into
    // the pre-cutoff rollup STATE instead of re-scanning history. The
    // oracle recomputes from the FULL table directly — equality IS the
    // algebraic-merge correctness proof (counts and exact integer-cent
    // sums form a commutative monoid; raw double sums would not).
    Q("q114_incremental_rollup",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", $"value", $"ts".cast("long").as("t"))
        val cutoff = 1704672000L // 2024-01-08 00:00 UTC
        val keys = Seq("user_id", "event_type")
        val history = graft.ops.IncrementalAgg.rollupState(
          ev.filter($"t" < cutoff), keys, $"value")
        val delta = graft.ops.IncrementalAgg.rollupState(
          ev.filter($"t" >= cutoff), keys, $"value")
        graft.ops.IncrementalAgg.withAvg(
            graft.ops.IncrementalAgg.mergeStates(keys, history, delta))
          .select($"user_id", $"event_type", $"n", $"sum_cents", $"avg_value")
          .orderBy($"user_id", $"event_type")
      },
      Some("""SELECT user_id, event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) / count(*) / 100.0 AS avg_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Recency-weighted engagement: per-day halving decay as EXACT
    // integer weight units (2^(30-age) for age < 30, else 0) — the
    // reproducible form of exponential decay scoring. A float
    // e^(-lambda*age) sum is order-dependent; power-of-two units sum in
    // 64-bit exactly at any parallelism.
    Q("q117_decayed_engagement",
      (s, d) => {
        import s.implicits._
        val asOf = 1706745600L // 2024-02-01 00:00 UTC, just past the data
        Tables.events(s, d)
          .select($"user_id", $"ts".cast("long").as("t"))
          .withColumn("age_days", expr(s"($asOf - t) div 86400"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when($"age_days".between(0, 29),
                expr("shiftleft(cast(1 as bigint), cast(30 - age_days as int))"))
              .otherwise(0L)).as("score_units"),
            min($"age_days").as("days_since_last"))
          .orderBy($"user_id")
      },
      Some("""WITH t AS (
             |  SELECT user_id,
             |    (1706745600 - epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) // 86400 AS age_days
             |  FROM events)
             |SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CASE WHEN age_days BETWEEN 0 AND 29
             |        THEN (CAST(1 AS BIGINT) << CAST(30 - age_days AS INT))
             |        ELSE 0 END) AS BIGINT) AS score_units,
             |  min(age_days) AS days_since_last
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Declarative data-quality audit: five validity rules (ranges,
    // non-null, set membership, FK into supplier) scored in ONE
    // aggregation pass; NULL predicate = violation (tri-state folded
    // via coalesce). The per-rule unpivot stacks the one-row aggregate,
    // never the data.
    Q("q118_expectations_audit",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d).select($"s_suppkey")
        val joined = li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
        graft.ops.Expectations.audit(joined, Seq(
          "quantity_in_range" -> $"l_quantity".between(1, 50),
          "price_positive" -> ($"l_extendedprice" > 0),
          "discount_unit_interval" -> $"l_discount".between(0.0, 1.0),
          "returnflag_known" -> $"l_returnflag".isin("A", "N", "R"),
          "fk_supplier_exists" -> $"s_suppkey".isNotNull))
          .orderBy($"rule")
      },
      Some("""WITH j AS (
             |  SELECT l.*, s.s_suppkey AS fk
             |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
             |one AS (
             |  SELECT
             |    CAST(sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, false) THEN 1 ELSE 0 END) AS BIGINT) AS v_quantity,
             |    CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
             |    CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0.0 AND 1.0, false) THEN 1 ELSE 0 END) AS BIGINT) AS v_discount,
             |    CAST(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), false) THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
             |    CAST(sum(CASE WHEN fk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_fk,
             |    count(*) AS n_checked
             |  FROM j)
             |SELECT rule, n_violations, n_checked FROM (
             |  SELECT 'quantity_in_range' AS rule, v_quantity AS n_violations, n_checked FROM one
             |  UNION ALL SELECT 'price_positive', v_price, n_checked FROM one
             |  UNION ALL SELECT 'discount_unit_interval', v_discount, n_checked FROM one
             |  UNION ALL SELECT 'returnflag_known', v_flag, n_checked FROM one
             |  UNION ALL SELECT 'fk_supplier_exists', v_fk, n_checked FROM one)
             |ORDER BY rule""".stripMargin)),

    // Grouped Pearson correlation on EXACT integer moments (the q98
    // discipline extended to the cross-moment): Σx, Σy, Σxy, Σx², Σy²
    // ride decimal(38)/HUGEINT, the double correlation derives from
    // those exact integers through the identical expression on both
    // engines. Spark's built-in corr() is a streaming double pass —
    // order-dependent and unreproducible distributed.
    Q("q123_grouped_correlation",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_returnflag".as("grp"),
          $"l_quantity".cast("long").as("x"),
          round($"l_extendedprice" * 100, 0).cast("long").as("y"))
        li.groupBy($"grp")
          .agg(count(lit(1)).as("n"),
            sum($"x".cast("decimal(38,0)")).as("sx"),
            sum($"y".cast("decimal(38,0)")).as("sy"),
            sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
            sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
            sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
          .select($"grp", $"n",
            r4(($"n".cast("double") * $"sxy".cast("double")
                - $"sx".cast("double") * $"sy".cast("double"))
              / (sqrt($"n".cast("double") * $"sxx".cast("double")
                  - $"sx".cast("double") * $"sx".cast("double"))
                * sqrt($"n".cast("double") * $"syy".cast("double")
                  - $"sy".cast("double") * $"sy".cast("double"))))
              .as("corr_qty_price"))
          .orderBy($"grp")
      },
      Some("""WITH li AS (
             |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x,
             |    CAST(round(l_extendedprice*100, 0) AS BIGINT) AS y
             |  FROM lineitem),
             |m AS (
             |  SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
             |  FROM li GROUP BY 1)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0
             |    AS corr_qty_price
             |FROM m ORDER BY 1""".stripMargin))
  )
}
