package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Valuation

/** Wave 33 — data valuation and calibration: exact Shapley credit over
  * the coalition lattice (the data-market question "what is each slice
  * worth"), with the same fixed-point/oracle discipline as the LOO
  * influence audit (q276): every transcendental term is rounded to
  * integer micro-units before summation so DuckDB replays the exact
  * integers.
  */
object ValuationQueries extends QueryPack {

  /** DuckDB replica of [[graft.ext.LinearModel.logisticGd]] on the two
    * standardized length features: one CTE trio (score+sigmoid,
    * gradient, update) per unrolled epoch, every intermediate rounded
    * to the identical micro-int as the Spark side.
    */
  private def logregOracleSql(epochs: Int): String = {
    val score = "w0 + CAST(round((CAST(w1 AS DOUBLE) * CAST(x0 AS DOUBLE) " +
      "+ CAST(w2 AS DOUBLE) * CAST(x1 AS DOUBLE)) / CAST(1000000 AS DOUBLE)) AS BIGINT)"
    val head =
      s"""WITH f AS (
         |  SELECT CAST(round(CAST(n_chars - 300 AS DOUBLE) * CAST(1000000 AS DOUBLE)
         |      / CAST(150 AS DOUBLE)) AS BIGINT) AS x0,
         |    CAST(round(CAST(len(string_split_regex(trim(text), '\\s+')) - 50
         |      AS DOUBLE) * CAST(1000000 AS DOUBLE) / CAST(25 AS DOUBLE)) AS BIGINT) AS x1,
         |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS y
         |  FROM documents),
         |e0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |  CAST(0 AS BIGINT) AS w2)""".stripMargin
    val rounds = (1 to epochs).map { i =>
      s"""
         |,p$i AS (SELECT y, x0, x1,
         |    CAST(round(CAST(1000000 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
         |      + exp(-(CAST($score AS DOUBLE)) / CAST(1000000 AS DOUBLE)))) AS BIGINT) AS p
         |  FROM f CROSS JOIN e${i - 1})
         |,g$i AS (SELECT CAST(sum(y * 1000000 - p) AS BIGINT) AS g0,
         |    CAST(sum((y * 1000000 - p) * x0) AS BIGINT) AS g1,
         |    CAST(sum((y * 1000000 - p) * x1) AS BIGINT) AS g2,
         |    CAST(count(*) AS BIGINT) AS n FROM p$i)
         |,e$i AS (SELECT
         |    w0 + CAST(round(CAST(g0 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
         |      AS w0,
         |    w1 + CAST(round(CAST(g1 AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * CAST(1000000 AS DOUBLE))) AS BIGINT) AS w1,
         |    w2 + CAST(round(CAST(g2 AS DOUBLE)
         |      / (CAST(n AS DOUBLE) * CAST(1000000 AS DOUBLE))) AS BIGINT) AS w2
         |  FROM e${i - 1} CROSS JOIN g$i)
         |,a$i AS (SELECT CAST($i AS BIGINT) AS epoch, w0, w1, w2,
         |    CAST(round(CAST(sum(CASE WHEN ($score >= 0) = (y = 1)
         |        THEN 1 ELSE 0 END) AS DOUBLE) * CAST(1000 AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_milli
         |  FROM f CROSS JOIN e$i GROUP BY w0, w1, w2)""".stripMargin
    }.mkString
    val tail = (1 to epochs).map(i => s"SELECT * FROM a$i")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY epoch")
    head + rounds + tail
  }

  val all: Seq[Q] = Seq(

    // Exact Shapley value of each language bucket toward a long-document
    // NB classifier's held-out accuracy: all 2^5 coalitions trained (as
    // integer sums of per-player count tables) and evaluated; credit
    // carries the exact 1/n! numerator plus its rounded micro value.
    Q("q296_shapley_players",
      (s, d) => {
        import s.implicits._
        Valuation.shapleyByGroup(Tables.documents(s, d), "doc_id", "text",
            "lang", $"n_chars" >= 250, panelMod = 7)
          .orderBy($"player")
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, lang AS grp, n_chars >= 250 AS gold,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |train AS (SELECT * FROM base WHERE id % 7 != 0),
             |panel AS (SELECT * FROM base WHERE id % 7 = 0),
             |gidx AS (
             |  SELECT grp, CAST(row_number() OVER (ORDER BY grp) - 1 AS BIGINT) AS idx,
             |    CAST(1 AS BIGINT)
             |      << CAST(row_number() OVER (ORDER BY grp) - 1 AS INT) AS bit
             |  FROM (SELECT DISTINCT grp FROM train)),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gidx),
             |ss AS (
             |  SELECT CAST(0 AS BIGINT) AS subset, CAST(0 AS BIGINT) AS i
             |  UNION ALL
             |  SELECT s.subset + CASE WHEN bb.b = 1 THEN g.bit ELSE 0 END, s.i + 1
             |  FROM ss s JOIN gidx g ON g.idx = s.i
             |  CROSS JOIN (SELECT 0 AS b UNION ALL SELECT 1) bb),
             |subsets AS (SELECT subset FROM ss, nn WHERE i = nn.n),
             |tokrows AS (SELECT grp, gold, unnest(l) AS tok FROM train),
             |gcounts AS (
             |  SELECT grp, tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1g,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0g
             |  FROM tokrows GROUP BY 1, 2),
             |vsz AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM gcounts),
             |gtok AS (SELECT grp, CAST(sum(c1g) AS BIGINT) AS n1g,
             |    CAST(sum(c0g) AS BIGINT) AS n0g FROM gcounts GROUP BY 1),
             |gdoc AS (SELECT grp,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS d1g,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS d0g
             |  FROM train GROUP BY 1),
             |member AS (
             |  SELECT subset, grp, n1g, n0g, d1g, d0g, bit
             |  FROM subsets CROSS JOIN gidx
             |  JOIN gtok USING (grp) JOIN gdoc USING (grp)
             |  WHERE (subset & bit) != 0),
             |sconst AS (
             |  SELECT s.subset,
             |    CAST(round(ln(CAST(coalesce(m.d1s, 0) + 1 AS DOUBLE)) * 1000000)
             |        AS BIGINT)
             |      - CAST(round(ln(CAST(coalesce(m.d0s, 0) + 1 AS DOUBLE)) * 1000000)
             |        AS BIGINT) AS prior_micro,
             |    CAST(round(ln(CAST(coalesce(m.n1s, 0) + v AS DOUBLE)) * 1000000)
             |        AS BIGINT)
             |      - CAST(round(ln(CAST(coalesce(m.n0s, 0) + v AS DOUBLE)) * 1000000)
             |        AS BIGINT) AS denom_micro
             |  FROM subsets s CROSS JOIN vsz
             |  LEFT JOIN (
             |    SELECT subset, sum(n1g) AS n1s, sum(n0g) AS n0s,
             |      sum(d1g) AS d1s, sum(d0g) AS d0s
             |    FROM member GROUP BY 1) m ON m.subset = s.subset),
             |stok AS (
             |  SELECT m.subset, g.tok,
             |    CAST(round(ln(CAST(sum(g.c1g) + 1 AS DOUBLE)) * 1000000) AS BIGINT)
             |      - CAST(round(ln(CAST(sum(g.c0g) + 1 AS DOUBLE)) * 1000000) AS BIGINT)
             |      AS term_micro
             |  FROM gcounts g JOIN (SELECT subset, grp FROM member) m USING (grp)
             |  GROUP BY 1, 2),
             |vocab AS (SELECT DISTINCT tok FROM gcounts),
             |ptok AS (
             |  SELECT id, tok FROM (SELECT id, unnest(l) AS tok FROM panel)
             |  WHERE tok IN (SELECT tok FROM vocab)),
             |plen AS (SELECT id, CAST(count(*) AS BIGINT) AS t_len FROM ptok GROUP BY 1),
             |pdocs AS (
             |  SELECT p.id, p.gold, coalesce(plen.t_len, 0) AS t_len
             |  FROM panel p LEFT JOIN plen ON plen.id = p.id),
             |nsums AS (
             |  SELECT pt.id, st.subset,
             |    CAST(sum(st.term_micro) AS BIGINT) AS num_micro
             |  FROM ptok pt JOIN stok st USING (tok) GROUP BY 1, 2),
             |scored AS (
             |  SELECT d.id, d.gold, s.subset,
             |    (c.prior_micro + coalesce(n.num_micro, 0)
             |      - d.t_len * c.denom_micro) >= 0 AS pred
             |  FROM pdocs d CROSS JOIN subsets s
             |  LEFT JOIN nsums n ON n.id = d.id AND n.subset = s.subset
             |  JOIN sconst c ON c.subset = s.subset),
             |sacc AS (
             |  SELECT subset,
             |    CAST(round(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) * 1000.0
             |      / count(*)) AS BIGINT) AS acc_milli
             |  FROM scored GROUP BY 1),
             |pairs AS (
             |  SELECT g.grp, a.subset AS s_lo, a.acc_milli AS v_lo,
             |    b.acc_milli AS v_hi,
             |    CAST(factorial(CAST(bit_count(a.subset) AS INT))
             |      * factorial(CAST(nn.n - 1 - bit_count(a.subset) AS INT))
             |      AS BIGINT) AS w
             |  FROM sacc a CROSS JOIN gidx g CROSS JOIN nn
             |  JOIN sacc b ON b.subset = a.subset + g.bit
             |  WHERE (a.subset & g.bit) = 0),
             |shap AS (
             |  SELECT grp, CAST(sum(w * (v_hi - v_lo)) AS BIGINT) AS shap_num
             |  FROM pairs GROUP BY 1),
             |vfull AS (
             |  SELECT acc_milli AS v_full_milli FROM sacc, nn
             |  WHERE subset = (CAST(1 AS BIGINT) << CAST(nn.n AS INT)) - 1),
             |vwo AS (
             |  SELECT g.grp, acc_milli AS v_without_milli
             |  FROM sacc JOIN gidx g
             |    ON sacc.subset = (SELECT (CAST(1 AS BIGINT) << CAST(n AS INT)) - 1
             |                      FROM nn) - g.bit)
             |SELECT shap.grp AS player, v_full_milli, v_without_milli, shap_num,
             |  CAST(round(CAST(shap_num AS DOUBLE) * 1000.0
             |    / CAST(factorial(CAST(nn.n AS INT)) AS DOUBLE)) AS BIGINT)
             |    AS shap_micro
             |FROM shap JOIN vwo USING (grp) CROSS JOIN vfull CROSS JOIN nn
             |ORDER BY player""".stripMargin)),

    // Isotonic (PAVA) calibration of the q161 forecast via the exact
    // minimax form over score deciles: fitted rate must be monotone in
    // the bin — the calibration map a screen-score goes through before
    // its threshold gates a corpus.
    Q("q297_isotonic_calibration",
      (s, d) => {
        import s.implicits._
        val scored = Tables.embeddings(s, d).select(
          least(greatest(
            round((col("embedding").getItem(0) + 1.0) / 2.0 * 1000000.0, 0).cast("long"),
            lit(0L)), lit(1000000L)).as("p_micro"),
          ($"label" % 2).cast("long").as("y"))
        graft.ext.Calibrate.isotonicBins(scored, "p_micro", "y", bins = 10)
          .orderBy($"bin")
      },
      Some("""WITH s AS (
             |  SELECT least(greatest(
             |      CAST(round((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0) AS BIGINT),
             |      0), 1000000) AS p,
             |    CAST(label % 2 AS BIGINT) AS y
             |  FROM embeddings),
             |b AS (SELECT least(p * 10 // 1000000, 9) AS bin,
             |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
             |  FROM s GROUP BY 1),
             |pre AS (SELECT bin, n, n_pos,
             |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
             |    CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cy
             |  FROM b),
             |segs AS (
             |  SELECT lo.bin AS i, hi.bin AS j,
             |    CAST(round(CAST(hi.cy - (lo.cy - lo.n_pos) AS DOUBLE) * 1000000.0
             |      / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE)) AS BIGINT) AS avg_micro
             |  FROM pre lo CROSS JOIN pre hi WHERE lo.bin <= hi.bin),
             |inner_min AS (
             |  SELECT k.bin AS k, s2.i, min(s2.avg_micro) AS m
             |  FROM b k JOIN segs s2 ON s2.i <= k.bin AND k.bin <= s2.j
             |  GROUP BY 1, 2),
             |iso AS (SELECT k, CAST(max(m) AS BIGINT) AS iso_rate_micro
             |  FROM inner_min GROUP BY 1)
             |SELECT bin, n, n_pos,
             |  CAST(round(CAST(n_pos AS DOUBLE) * 1000000.0 / CAST(n AS DOUBLE))
             |    AS BIGINT) AS emp_rate_micro,
             |  iso_rate_micro
             |FROM b JOIN iso ON iso.k = b.bin
             |ORDER BY bin""".stripMargin)),

    // Murphy decomposition of the Brier score for the same forecast
    // snapped to bin centers: reliability − resolution + uncertainty,
    // per-bin micro terms integer-summed.
    Q("q298_brier_decomposition",
      (s, d) => {
        import s.implicits._
        val scored = Tables.embeddings(s, d).select(
          least(greatest(
            round((col("embedding").getItem(0) + 1.0) / 2.0 * 1000000.0, 0).cast("long"),
            lit(0L)), lit(1000000L)).as("p_micro"),
          ($"label" % 2).cast("long").as("y"))
        graft.ext.Calibrate.brierDecomposition(scored, "p_micro", "y", bins = 10)
      },
      Some("""WITH s AS (
             |  SELECT least(greatest(
             |      CAST(round((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0) AS BIGINT),
             |      0), 1000000) AS p,
             |    CAST(label % 2 AS BIGINT) AS y
             |  FROM embeddings),
             |b AS (SELECT least(p * 10 // 1000000, 9) AS bin,
             |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS yb
             |  FROM s GROUP BY 1),
             |bc AS (SELECT bin, n, yb,
             |    CAST(2 * bin + 1 AS DOUBLE) / CAST(20 AS DOUBLE) AS c FROM b),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |    CAST(sum(yb) AS BIGINT) AS yy FROM b),
             |terms AS (
             |  SELECT
             |    CAST(round((CAST(n AS BIGINT) * c * c
             |      - CAST(yb AS BIGINT) * c * CAST(2.0 AS DOUBLE)
             |      + CAST(yb AS DOUBLE) * CAST(yb AS DOUBLE) / CAST(n AS DOUBLE))
             |      * 1000000.0) AS BIGINT) AS t_rel,
             |    CAST(round(CAST(n AS DOUBLE)
             |      * (CAST(yb AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(yy AS DOUBLE) / CAST(nn AS DOUBLE))
             |      * (CAST(yb AS DOUBLE) / CAST(n AS DOUBLE)
             |        - CAST(yy AS DOUBLE) / CAST(nn AS DOUBLE))
             |      * 1000000.0) AS BIGINT) AS t_res,
             |    CAST(round((CAST(yb AS BIGINT) * (CAST(1.0 AS DOUBLE) - c)
             |        * (CAST(1.0 AS DOUBLE) - c)
             |      + CAST(n - yb AS BIGINT) * c * c) * 1000000.0) AS BIGINT)
             |      AS t_brier
             |  FROM bc CROSS JOIN tot)
             |SELECT nn AS n, yy AS n_pos,
             |  CAST(round(CAST(sum(t_brier) AS DOUBLE) / CAST(nn AS DOUBLE))
             |    AS BIGINT) AS brier_micro,
             |  CAST(round(CAST(sum(t_rel) AS DOUBLE) / CAST(nn AS DOUBLE))
             |    AS BIGINT) AS rel_micro,
             |  CAST(round(CAST(sum(t_res) AS DOUBLE) / CAST(nn AS DOUBLE))
             |    AS BIGINT) AS res_micro,
             |  CAST(round(CAST(yy AS DOUBLE) / CAST(nn AS DOUBLE)
             |    * (CAST(1.0 AS DOUBLE) - CAST(yy AS DOUBLE) / CAST(nn AS DOUBLE))
             |    * 1000000.0) AS BIGINT) AS unc_micro
             |FROM terms CROSS JOIN tot
             |GROUP BY nn, yy""".stripMargin)),

    // Logistic regression trained IN the engine: three unrolled
    // full-batch GD epochs on micro-int length features, one
    // partial-aggregated scan per epoch, model = 3 broadcast scalars;
    // the oracle replays every sigmoid/gradient/update rounding.
    Q("q299_logreg_gd",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        graft.ext.LinearModel.logisticGd(docs,
          Seq(
            round(($"n_chars" - 300).cast("double") * 1000000.0 / 150.0, 0)
              .cast("long"),
            round((graft.ext.TextAnalysis.tokenCount($"text") - 50).cast("double")
              * 1000000.0 / 25.0, 0).cast("long")),
          $"lang" === "en", epochs = 3)
          .orderBy($"epoch")
      },
      Some(logregOracleSql(3)))
  ,

    // Model-based IPW (Hájek) ATE: propensity of "user clicked" from a
    // 2-feature fixed-point logistic model, scored back per user,
    // clipped, inverse-weighted — oracle replays training epochs AND
    // the scoring/weighting walk.
    Q("q370_ipw_ate",
      (s, d) => {
        import s.implicits._
        val per = Tables.events(s, d).groupBy($"user_id")
          .agg(count(lit(1)).as("ne"),
            countDistinct($"event_type").as("nt"),
            sum(when($"event_type" === "purchase", 1L).otherwise(0L))
              .as("yo"))
          .withColumn("t", when($"user_id" % 3 === 0L, 1L).otherwise(0L))
        graft.ops.Causal.ipwAteLogistic(per,
          Seq(least($"ne", lit(50L)) * 20000L,
            least($"nt", lit(5L)) * 200000L),
          $"t" === 1L, $"yo", epochs = 3, clipMicro = 50000L)
      },
      Some(StructureQueries.logregTrainCtes(
        """WITH per AS (
          |  SELECT user_id, CAST(count(*) AS BIGINT) AS ne,
          |    CAST(count(DISTINCT event_type) AS BIGINT) AS nt,
          |    CAST(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS t,
          |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS yo
          |  FROM events GROUP BY 1),
          |f AS (SELECT least(ne, 50) * 20000 AS x0,
          |    least(nt, 5) * 200000 AS x1, t AS y, yo
          |  FROM per)""".stripMargin, k = 2, epochs = 3) +
        s"""
          |,sc AS (SELECT y AS t, yo,
          |    least(greatest(CAST(round(CAST(1000000 AS DOUBLE)
          |        / (CAST(1.0 AS DOUBLE)
          |          + exp(-(CAST(${StructureQueries.logregScoreSql(2)}
          |            AS DOUBLE)) / CAST(1000000 AS DOUBLE)))) AS BIGINT),
          |      50000), 950000) AS pc
          |  FROM f CROSS JOIN e3)
          |,wt AS (SELECT t, yo,
          |    CASE WHEN t = 1
          |      THEN CAST(round(1000000000.0 / CAST(pc AS DOUBLE)) AS BIGINT)
          |      ELSE CAST(round(1000000000.0 / CAST(1000000 - pc AS DOUBLE))
          |        AS BIGINT) END AS w
          |  FROM sc)
          |,ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
          |    CAST(sum(CASE WHEN t = 1 THEN w ELSE 0 END) AS BIGINT) AS sw1,
          |    CAST(sum(CASE WHEN t = 0 THEN w ELSE 0 END) AS BIGINT) AS sw0,
          |    CAST(sum(CASE WHEN t = 1 THEN w * yo ELSE 0 END) AS BIGINT)
          |      AS swy1,
          |    CAST(sum(CASE WHEN t = 0 THEN w * yo ELSE 0 END) AS BIGINT)
          |      AS swy0
          |  FROM wt)
          |SELECT n, n1, n0,
          |  CAST(round(CAST(swy1 AS DOUBLE) * 1000000.0
          |    / CAST(sw1 AS DOUBLE)) AS BIGINT) AS mu1_micro,
          |  CAST(round(CAST(swy0 AS DOUBLE) * 1000000.0
          |    / CAST(sw0 AS DOUBLE)) AS BIGINT) AS mu0_micro,
          |  CAST(round(CAST(swy1 AS DOUBLE) * 1000000.0
          |    / CAST(sw1 AS DOUBLE)) AS BIGINT)
          |  - CAST(round(CAST(swy0 AS DOUBLE) * 1000000.0
          |    / CAST(sw0 AS DOUBLE)) AS BIGINT) AS ate_micro
          |FROM ag""".stripMargin))
  )
}
