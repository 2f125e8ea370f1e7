package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.core.Exact.moneySum

/** Projection / filter / distinct / set operators (SURVEY.md §2.2, §2.6,
  * §2.7): select+rename (P1), predicate and null-predicate filters
  * (P3/P4), distinct and keep-first-per-key distinct (P6), multi-key sort
  * (O1), union-by-name with provenance (U1/U2).
  *
  * Scale notes: all filters here are scan-level predicates — `.explain`
  * shows them in `PushedFilters`, so parquet row groups are skipped
  * before any Spark CPU is spent.
  */
object FilterQueries extends QueryPack {

  val all: Seq[Q] = Seq(
    // P1 P3 P4 O1 — pushed-down predicate filter + select/rename +
    // per-row computed column + null-predicate (nullif → isNotNull).
    Q("q23_filter_project",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
          .filter($"l_discount" >= 0.02 && $"l_discount" <= 0.06)
          .withColumn("tax_nz", expr("nullif(l_tax, 0.0)"))
          .filter($"tax_nz".isNotNull)
          .select(
            $"l_orderkey".as("okey"), $"l_linenumber".as("line"),
            $"l_quantity".as("qty"),
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("disc_price"),
            $"tax_nz")
          .orderBy($"okey", $"line", $"qty", $"disc_price", $"tax_nz")
      },
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line, l_quantity AS qty,
             |  l_extendedprice * (1.0 - l_discount) AS disc_price,
             |  nullif(l_tax, 0.0) AS tax_nz
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
             |  AND l_discount >= 0.02 AND l_discount <= 0.06
             |  AND nullif(l_tax, 0.0) IS NOT NULL
             |ORDER BY 1, 2, 3, 4, 5""".stripMargin)),

    // P6 — distinct on a projection.
    Q("q24_distinct",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .select($"c_mktsegment", $"c_nationkey")
          .distinct()
          .orderBy($"c_mktsegment", $"c_nationkey")
      },
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey
             |FROM customer ORDER BY 1, 2""".stripMargin)),

    // P6 — distinct(.keep_all = TRUE): first whole row per key,
    // deterministic via an explicit ordering (the reference relies on row
    // order; §7.4 trap).
    Q("q25_distinct_keepfirst",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_custkey")
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"c_nationkey", $"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
          .orderBy($"c_nationkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_name, c_acctbal, c_mktsegment
             |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
             |      FROM customer)
             |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin)),

    // U1 U2 — bind_rows: union by name with missing columns null-padded
    // plus a provenance column (R/validation-functions.R:121,264).
    Q("q26_union_provenance",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val a = li.groupBy($"l_returnflag".as("key"))
          .agg(sum($"l_quantity").as("sum_qty"))
          .withColumn("src", lit("by_flag"))
        val b = li.groupBy($"l_linestatus".as("key"))
          .agg(moneySum($"l_extendedprice").as("revenue"))
          .withColumn("src", lit("by_status"))
        a.unionByName(b, allowMissingColumns = true)
          .select($"src", $"key", $"sum_qty", $"revenue")
          .orderBy($"src", $"key")
      },
      Some("""SELECT 'by_flag' AS src, l_returnflag AS key,
             |  sum(l_quantity) AS sum_qty, CAST(NULL AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY 2
             |UNION ALL
             |SELECT 'by_status' AS src, l_linestatus AS key,
             |  CAST(NULL AS DOUBLE) AS sum_qty,
             |  sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/100.0 AS revenue
             |FROM lineitem GROUP BY 2
             |ORDER BY src, key""".stripMargin)),

    // P9 — drop-all-NA columns (R/export.R:376): two-pass — per-column
    // non-null counts (one tiny aggregate row), then select survivors.
    // The aggregate is a single reduce, not a driver loop over data.
    Q("q27_drop_empty_cols",
      (s, d) => {
        import s.implicits._
        // o_comment-style all-null column synthesized, then dropped again
        // by the operator; n_orders survives.
        val df = Tables.orders(s, d)
          .filter($"o_orderkey" < 300)
          .select($"o_orderkey", $"o_orderstatus",
            lit(null).cast("string").as("all_null_col"),
            when($"o_totalprice" > 200000, $"o_totalprice").as("sometimes_null"))
        val counts = df.select(df.columns.map(c => count(col(c)).as(c)): _*).head()
        val keep = df.columns.zipWithIndex.collect {
          case (c, i) if counts.getLong(i) > 0 => col(c)
        }
        df.select(keep: _*).orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS sometimes_null
             |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin))
  )
}
