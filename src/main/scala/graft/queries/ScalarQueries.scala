package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.core.Exact.r4

/** Scalar-function surface (SURVEY.md §2.9): regex string ops, title/
  * case/trim, case_when chains + coalesce/nullif, the length-weight power
  * law with the octopus special case, natural log / exp, date/time
  * truncation-formatting-arithmetic, and trip-duration hours.
  *
  * Everything here is a built-in Catalyst expression — no UDFs — so the
  * whole map stays inside one WholeStageCodegen span.
  */
object ScalarQueries extends QueryPack {

  val all: Seq[Q] = Seq(
    // String functions: regexp_replace/extract, upper/lower, substring
    // title-case, concat_ws, length, rlike filter.
    Q("q37_string_functions",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter($"p_name".rlike("^[bh]"))
          .select(
            $"p_partkey",
            regexp_replace($"p_name", "[aeiou]", "").as("no_vowels"),
            upper($"p_name").as("upper_name"),
            concat(upper(substring($"p_name", 1, 1)), substring($"p_name", 2, 200)).as("title_ish"),
            regexp_extract($"p_brand", "([0-9]+)", 1).cast("int").as("brand_num"),
            length($"p_name").cast("long").as("name_len"),
            concat_ws("|", $"p_brand", $"p_type").as("brand_type"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
             |  upper(p_name) AS upper_name,
             |  upper(substring(p_name,1,1)) || substring(p_name,2,200) AS title_ish,
             |  CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
             |  length(p_name) AS name_len,
             |  concat_ws('|', p_brand, p_type) AS brand_type
             |FROM part WHERE regexp_matches(p_name, '^[bh]')
             |ORDER BY p_partkey""".stripMargin)),

    // case_when chains + coalesce + nullif (flags 1-13 style,
    // R/validation.R:130-176; habitat decode
    // R/preprocessing-surveys.R:309-319).
    Q("q38_case_coalesce",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(
            when($"o_totalprice" > 400000, "XL")
              .when($"o_totalprice" > 250000, "L")
              .when($"o_totalprice" > 100000, "M")
              .otherwise("S").as("bucket"),
            coalesce(expr("nullif(o_orderstatus, 'O')"), lit("open")).as("status2"),
            when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", "hot")
              .otherwise("cold").as("heat"))
          .groupBy($"bucket", $"status2", $"heat")
          .agg(count(lit(1)).as("n"))
          .orderBy($"bucket", $"status2", $"heat")
      },
      Some("""SELECT
             |  CASE WHEN o_totalprice > 400000 THEN 'XL'
             |       WHEN o_totalprice > 250000 THEN 'L'
             |       WHEN o_totalprice > 100000 THEN 'M'
             |       ELSE 'S' END AS bucket,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
             |  CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
             |       THEN 'hot' ELSE 'cold' END AS heat,
             |  count(*) AS n
             |FROM orders GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin)),

    // Math: the length-weight law W = a·L^b·N/1000 with the octopus
    // mantle-length special case L/5.5 (R/model-taxa.R:78-92,
    // R/preprocessing-surveys.R:696-710), plus ln/exp geometric mean.
    // Per-row doubles are rounded to fixed-point BEFORE the distributed
    // sum so the aggregate is order-independent.
    Q("q39_math_length_weight",
      (s, d) => {
        import s.implicits._
        val L = when($"l_returnflag" === "R", $"l_quantity" / 5.5).otherwise($"l_quantity")
        val w = lit(0.0631) * pow(L, 2.8) * $"l_linenumber" / 1000.0
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            (sum(round(w * 10000, 0).cast("long")) / 10000.0).as("est_weight"),
            r4(exp(sum(round(log($"l_quantity" + 1) * 1000000, 0).cast("long"))
              / count(lit(1)) / 1000000.0)).as("geo_qty"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  sum(CAST(round(0.0631 * pow(CASE WHEN l_returnflag = 'R' THEN l_quantity/5.5 ELSE l_quantity END, 2.8) * l_linenumber / 1000.0 * 10000, 0) AS BIGINT))/10000.0 AS est_weight,
             |  round(exp(sum(CAST(round(ln(l_quantity + 1) * 1000000, 0) AS BIGINT)) / count(*) / 1000000.0), 4) AS geo_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Date/time: month truncation (floor_date), ISO formatting, parts,
    // day arithmetic (R/export.R:171,334; R/validation.R:190-194).
    Q("q40_datetime_functions",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(trunc($"o_orderdate", "month").as("month"))
          .agg(count(lit(1)).as("n"))
          .select($"month", $"n",
            date_format($"month", "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"),
            year($"month").cast("long").as("yr"),
            month($"month").cast("long").as("mo"),
            datediff(lit(java.sql.Date.valueOf("2000-01-01")), $"month").cast("long").as("days_to_2000"))
          .orderBy($"month")
      },
      Some("""SELECT month, n,
             |  strftime(month, '%Y-%m-%dT%H:%M:%SZ') AS iso,
             |  year(month) AS yr, month(month) AS mo,
             |  datediff('day', month, DATE '2000-01-01') AS days_to_2000
             |FROM (SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n
             |      FROM orders GROUP BY 1)
             |ORDER BY month""".stripMargin)),

    // difftime hours (trip duration, R/preprocessing-surveys.R:1192-1196)
    // on the event stream: exact integer micros diff, then one division.
    Q("q41_duration_hours",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id")
          .agg(min($"ts").as("t_start"), max($"ts").as("t_end"))
          .select($"user_id", $"t_start", $"t_end",
            r4((unix_micros($"t_end") - unix_micros($"t_start")) / 3600000000.0).as("hours"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             |  CAST(min(ts) AS TIMESTAMP) AS t_start,
             |  CAST(max(ts) AS TIMESTAMP) AS t_end,
             |  round((epoch_us(CAST(max(ts) AS TIMESTAMP)) - epoch_us(CAST(min(ts) AS TIMESTAMP)))/3600000000.0, 4) AS hours
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Taxa rank inference + database routing (R/model-taxa.R:363-380):
    // scientific-name-shaped strings synthesized deterministically from
    // part names, then the " spp$"/"idae$"/"formes$"/binomial recodes.
    Q("q67_taxa_rank",
      (s, d) => {
        import s.implicits._
        val toks = Tables.part(s, d)
          .select($"p_partkey", split($"p_name", " ").as("t"),
            ($"p_partkey" % 60).cast("int").as("taxon_group"))
        val named = toks.select($"p_partkey", $"taxon_group",
          when($"p_partkey" % 5 === 0, concat(element_at($"t", 1), lit(" spp")))
            .when($"p_partkey" % 5 === 1, concat(element_at($"t", 1), lit("idae")))
            .when($"p_partkey" % 5 === 2, concat(element_at($"t", 1), lit("formes")))
            .when($"p_partkey" % 5 === 3,
              concat(element_at($"t", 1), lit(" "), element_at($"t", 2)))
            .otherwise(concat(element_at($"t", 1), lit(" nei")))
            .as("scientific_name"))
        graft.pipeline.Taxa.processSpeciesList(named, "scientific_name", "taxon_group")
          .select($"p_partkey", $"scientific_name", $"database", $"rank")
          .orderBy($"p_partkey")
      },
      Some("""WITH named AS (
             |  SELECT p_partkey, CAST(p_partkey % 60 AS INT) AS taxon_group,
             |    CASE p_partkey % 5
             |      WHEN 0 THEN string_split(p_name, ' ')[1] || ' spp'
             |      WHEN 1 THEN string_split(p_name, ' ')[1] || 'idae'
             |      WHEN 2 THEN string_split(p_name, ' ')[1] || 'formes'
             |      WHEN 3 THEN string_split(p_name, ' ')[1] || ' ' || string_split(p_name, ' ')[2]
             |      ELSE string_split(p_name, ' ')[1] || ' nei' END AS scientific_name
             |  FROM part)
             |SELECT p_partkey,
             |  regexp_replace(scientific_name, ' spp$', '') AS scientific_name,
             |  CASE WHEN taxon_group IN (57, 45, 43, 42, 56) THEN 'sealifebase'
             |       ELSE 'fishbase' END AS database,
             |  CASE WHEN regexp_matches(scientific_name, ' spp$') THEN 'Genus'
             |       WHEN regexp_matches(scientific_name, 'idae$') THEN 'Family'
             |       WHEN regexp_matches(scientific_name, 'formes$') THEN 'Order'
             |       WHEN regexp_matches(scientific_name, ' ')
             |            AND NOT regexp_matches(scientific_name, ' spp$|nei$') THEN 'Species'
             |       END AS rank
             |FROM named ORDER BY p_partkey""".stripMargin))
  )
}
