package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.core.Exact.moneySum
import graft.ops.Reshape

/** Reshaping operators (SURVEY.md §2.8): unpivot/stack (R1/R3/R4), pivot
  * wider (R2), separate (R7), separate_rows (R8), complete month grid
  * (R9), conditional row expansion via explode_outer (R10), nest to
  * list-column + JSON doc (R11/R12), JSON field extraction (S2 analog),
  * and calendar/tumbling windows standing in for the reference's
  * floor_date bucketing.
  */
object ReshapeQueries extends QueryPack {

  val all: Seq[Q] = Seq(
    // R1/R4 — metrics to long (metric, value) rows via stack
    // (R/export.R:580-585).
    Q("q28_unpivot_metrics",
      (s, d) => {
        import s.implicits._
        val agg = Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            moneySum($"l_extendedprice").as("revenue"),
            moneySum($"l_discount").as("sum_disc"),
            moneySum($"l_tax").as("sum_tax"))
        Reshape.unpivot(agg, Seq("l_returnflag"),
            Seq("sum_qty", "revenue", "sum_disc", "sum_tax"))
          .orderBy($"l_returnflag", $"metric")
      },
      Some("""WITH a AS (
             |  SELECT l_returnflag,
             |    sum(l_quantity) AS sum_qty,
             |    sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue,
             |    sum(CAST(round(l_discount*100,0) AS BIGINT))/100.0 AS sum_disc,
             |    sum(CAST(round(l_tax*100,0) AS BIGINT))/100.0 AS sum_tax
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
             |UNION ALL SELECT l_returnflag, 'revenue', revenue FROM a
             |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
             |UNION ALL SELECT l_returnflag, 'sum_tax', sum_tax FROM a
             |ORDER BY l_returnflag, metric""".stripMargin)),

    // R2 — pivot_wider (R/preprocessing-surveys.R:536): long flag groups
    // to one column per flag value (explicit value list keeps the plan a
    // single pass; without it Spark needs a distinct-values job first).
    Q("q29_pivot_wider",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum($"l_quantity"))
          .withColumnRenamed("A", "qty_a")
          .withColumnRenamed("N", "qty_n")
          .withColumnRenamed("R", "qty_r")
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
             |  sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n,
             |  sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R7 — separate fixed-delim string into typed pieces
    // (R/preprocessing-surveys.R:98-102; "5_10" → min/max). Also the
    // too_few=align_start semantics: a missing piece yields null.
    Q("q30_separate",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(
            Reshape.separatePiece($"o_orderpriority", "-", 0).cast("int").as("prio_num"),
            Reshape.separatePiece($"o_orderpriority", "-", 1).as("prio_label"),
            Reshape.separatePiece($"o_orderpriority", "-", 2).as("prio_missing"))
          .groupBy($"prio_num", $"prio_label", $"prio_missing")
          .agg(count(lit(1)).as("n"))
          .orderBy($"prio_num")
      },
      Some("""SELECT CAST(nullif(split_part(o_orderpriority,'-',1),'') AS INT) AS prio_num,
             |  nullif(split_part(o_orderpriority,'-',2),'') AS prio_label,
             |  nullif(split_part(o_orderpriority,'-',3),'') AS prio_missing,
             |  count(*) AS n
             |FROM orders GROUP BY 1,2,3 ORDER BY 1""".stripMargin)),

    // R8 — separate_rows: explode a delimited list column
    // (R/validation.R:1136-1139).
    Q("q31_separate_rows",
      (s, d) => {
        import s.implicits._
        val df = Tables.orders(s, d)
          .withColumn("tags", concat_ws(",", $"o_orderstatus", $"o_orderpriority"))
        Reshape.separateRows(df, "tags", ",\\s*", "tag")
          .groupBy($"tag").agg(count(lit(1)).as("n"))
          .orderBy($"tag")
      },
      Some("""SELECT tag, count(*) AS n
             |FROM (SELECT unnest(string_split_regex(o_orderstatus || ',' || o_orderpriority, ',\s*')) AS tag
             |      FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // R9 — tidyr::complete month grid (R/export.R:586-597): distinct keys
    // × month sequence spanning the GLOBAL date range, left join, missing
    // combos stay null.
    Q("q32_scaffold_complete",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
        val base = o.filter($"o_custkey" < 20)
        val agg = base.groupBy($"o_custkey".as("custkey"),
            trunc($"o_orderdate", "month").as("month"))
          .agg(count(lit(1)).as("n"), moneySum($"o_totalprice").as("spend"))
        val bounds = o.agg(
          trunc(min($"o_orderdate"), "month").as("mn"),
          trunc(max($"o_orderdate"), "month").as("mx"))
        Reshape.completeMonths(agg, Seq("custkey"), "month", bounds)
          .orderBy($"custkey", $"month")
      },
      Some("""WITH base AS (SELECT * FROM orders WHERE o_custkey < 20),
             |agg AS (
             |  SELECT o_custkey AS custkey, date_trunc('month', o_orderdate) AS month,
             |    count(*) AS n,
             |    sum(CAST(round(o_totalprice*100,0) AS BIGINT))/100.0 AS spend
             |  FROM base GROUP BY 1,2),
             |b AS (SELECT date_trunc('month', min(o_orderdate)) AS mn,
             |             date_trunc('month', max(o_orderdate)) AS mx FROM orders),
             |months AS (SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month FROM b),
             |keys AS (SELECT DISTINCT o_custkey AS custkey FROM base)
             |SELECT k.custkey, m.month, a.n, a.spend
             |FROM keys k CROSS JOIN months m
             |LEFT JOIN agg a ON a.custkey = k.custkey AND a.month = m.month
             |ORDER BY 1, 2""".stripMargin)),

    // R10 — conditional row expansion: array of structs + explode_outer
    // keeps a null row for parents with no children
    // (expand_length_frequency, R/survey-reshaping.R:182-239).
    Q("q33_explode_outer",
      (s, d) => {
        import s.implicits._
        val items = Tables.lineitem(s, d)
          .filter($"l_quantity" >= 50)
          .select($"l_orderkey",
            struct($"l_partkey", $"l_extendedprice").as("it"))
        val nested = items.groupBy($"l_orderkey")
          .agg(sort_array(collect_list($"it")).as("its"))
        Tables.orders(s, d)
          .filter($"o_orderkey" < 500)
          .select($"o_orderkey")
          .join(nested, $"o_orderkey" === $"l_orderkey", "left")
          .select($"o_orderkey", explode_outer($"its").as("it"))
          .select($"o_orderkey", $"it.l_partkey".as("partkey"),
            $"it.l_extendedprice".as("price"))
          .orderBy($"o_orderkey", $"partkey".asc_nulls_first, $"price".asc_nulls_first)
      },
      Some("""SELECT o_orderkey, l_partkey AS partkey, l_extendedprice AS price
             |FROM orders
             |LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 50) li
             |  ON o_orderkey = li.l_orderkey
             |WHERE o_orderkey < 500
             |ORDER BY o_orderkey, partkey NULLS FIRST, price NULLS FIRST""".stripMargin)),

    // R11 R12 — nest to a list-of-structs column + serialize as a JSON
    // document (catch_df → MongoDB, R/export.R:417-437; ApexCharts doc
    // :795-821). The list is sorted so the doc is deterministic.
    Q("q34_nest_json",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity").cast("long").as("y"))
          .groupBy($"l_returnflag")
          .agg(to_json(sort_array(collect_list(struct($"l_linestatus".as("x"), $"y"))))
            .as("doc"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH a AS (
             |  SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS BIGINT) AS y
             |  FROM lineitem GROUP BY 1,2)
             |SELECT l_returnflag,
             |  CAST(to_json(list(struct_pack(x := l_linestatus, y := y) ORDER BY l_linestatus)) AS VARCHAR) AS doc
             |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)),

    // S2 analog — JSON field extraction from a string column
    // (flatten_row, R/ingestion.R:149-218; here schema-on-read style).
    Q("q35_json_extract",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("int"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), min($"k").as("min_k"),
            max($"k").as("max_k"), count($"k").as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props,'$.k') AS INT)) AS BIGINT) AS sum_k,
             |  min(CAST(json_extract_string(props,'$.k') AS INT)) AS min_k,
             |  max(CAST(json_extract_string(props,'$.k') AS INT)) AS max_k,
             |  count(CAST(json_extract_string(props,'$.k') AS INT)) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Event-time tumbling window over the ns-timestamp stream table —
    // the batch twin of the Structured Streaming path
    // (graft.streaming.EventStream); windows align to the epoch.
    Q("q36_window_tumbling",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
            (sum(round($"value" * 100, 0).cast("long")) / 100.0).as("total"))
          .select($"w.start".as("win_start"), $"event_type", $"n", $"total")
          .orderBy($"win_start", $"event_type")
      },
      Some("""SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600000000) AS win_start,
             |  event_type, count(*) AS n,
             |  sum(CAST(round(value*100,0) AS BIGINT))/100.0 AS total
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
