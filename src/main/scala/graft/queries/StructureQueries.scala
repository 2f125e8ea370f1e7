package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Wave 34 — structure and dynamics: the stationary distribution of the
  * event-type Markov chain (integer power iteration, every floor
  * replayed), partition conductance, and density clustering. Same
  * fixed-point discipline as the graph wave (q251/q256): truncating
  * divs on non-negative integers only, so DuckDB replays rounds
  * bit-for-bit.
  */
object StructureQueries extends QueryPack {

  /** DuckDB replica of [[graft.ops.Behavior.markovStationary]]: the
    * q204 one-step matrix, then one CTE per power-iteration round.
    */
  private def stationaryOracleSql(rounds: Int): String = {
    val head =
      """WITH seq AS (
        |  SELECT event_type AS b,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS a
        |  FROM events),
        |n1 AS (SELECT a, b, count(*) AS n FROM seq
        |       WHERE a IS NOT NULL GROUP BY 1, 2),
        |p1 AS (SELECT a, b,
        |         (n * 1000000) // sum(n) OVER (PARTITION BY a) AS p
        |       FROM n1),
        |st AS (SELECT a AS state FROM p1 UNION SELECT b FROM p1),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
        |r0 AS (SELECT state, 1000000 // k AS pi FROM st CROSS JOIN kk)"""
        .stripMargin
    val rounds_ = (1 to rounds).map { i =>
      s"""
         |,r$i AS (
         |  SELECT st.state, coalesce(m.v // 1000000, 0) AS pi
         |  FROM st LEFT JOIN (
         |    SELECT b AS state2, sum(pi * p) AS v
         |    FROM r${i - 1} r JOIN p1 ON r.state = p1.a GROUP BY 1) m
         |  ON m.state2 = st.state)""".stripMargin
    }.mkString
    head + rounds_ +
      s"\nSELECT state, CAST(pi AS BIGINT) AS pi_micro FROM r$rounds ORDER BY state"
  }

  /** Generalized [[ValuationQueries.logregOracleSql]]: k features named
    * x0..x{k−1} provided by `featsCte` (which must end with the CTE
    * `f(x0.., y)`), same per-epoch sigmoid/gradient/update roundings.
    */
  /** Integer score expression under weights w0..wk over features
    * x0..x{k−1} — the shape scoreMicro uses on the Spark side.
    */
  private[queries] def logregScoreSql(k: Int): String = {
    val dot = (1 to k).map(i =>
      s"CAST(w$i AS DOUBLE) * CAST(x${i - 1} AS DOUBLE)").mkString(" + ")
    s"w0 + CAST(round(($dot) / CAST(1000000 AS DOUBLE)) AS BIGINT)"
  }

  private[queries] def logregKOracleSql(featsCte: String, k: Int,
      epochs: Int): String = {
    val score = logregScoreSql(k)
    val w0 = (0 to k).map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ")
    val xs = (0 until k).map(i => s"x$i").mkString(", ")
    val head = s"$featsCte,\ne0 AS (SELECT $w0)"
    val rounds = (1 to epochs).map { i =>
      val gsel = (1 to k).map(j =>
        s"CAST(sum((y * 1000000 - p) * x${j - 1}) AS BIGINT) AS g$j").mkString(",\n    ")
      val wsel = (1 to k).map(j =>
        s"w$j + CAST(round(CAST(g$j AS DOUBLE) / (CAST(n AS DOUBLE) " +
          s"* CAST(1000000 AS DOUBLE))) AS BIGINT) AS w$j").mkString(",\n    ")
      s"""
         |,p$i AS (SELECT y, $xs,
         |    CAST(round(CAST(1000000 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
         |      + exp(-(CAST($score AS DOUBLE)) / CAST(1000000 AS DOUBLE))))
         |      AS BIGINT) AS p
         |  FROM f CROSS JOIN e${i - 1})
         |,g$i AS (SELECT CAST(sum(y * 1000000 - p) AS BIGINT) AS g0,
         |    $gsel,
         |    CAST(count(*) AS BIGINT) AS n FROM p$i)
         |,e$i AS (SELECT
         |    w0 + CAST(round(CAST(g0 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
         |      AS w0,
         |    $wsel
         |  FROM e${i - 1} CROSS JOIN g$i)
         |,a$i AS (SELECT CAST($i AS BIGINT) AS epoch,
         |    ${(0 to k).map(j => s"w$j").mkString(", ")},
         |    CAST(round(CAST(sum(CASE WHEN ($score >= 0) = (y = 1)
         |        THEN 1 ELSE 0 END) AS DOUBLE) * CAST(1000 AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_milli
         |  FROM f CROSS JOIN e$i
         |  GROUP BY ${(0 to k).map(j => s"w$j").mkString(", ")})""".stripMargin
    }.mkString
    val tail = (1 to epochs).map(i => s"SELECT * FROM a$i")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY epoch")
    head + rounds + tail
  }

  /** Training CTEs only (f, e0..e{epochs} — the a$i accuracy CTEs are
    * present but unreferenced, so DuckDB never evaluates them): for
    * oracles that SCORE under the trained weights instead of reporting
    * the epoch table (q370's propensity model).
    */
  private[queries] def logregTrainCtes(featsCte: String, k: Int,
      epochs: Int): String = {
    val full = logregKOracleSql(featsCte, k, epochs)
    full.substring(0, full.lastIndexOf("\nSELECT * FROM a1"))
  }

  val all: Seq[Q] = Seq(

    // Stationary distribution of the event-type chain: 6 integer power
    // rounds over the q204 transition matrix — "where does a user
    // session spend its time in the limit".
    Q("q300_markov_stationary",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.markovStationary(Tables.events(s, d), rounds = 6)
          .orderBy($"state")
      },
      Some(stationaryOracleSql(6)))
  ,
    // Conductance of the brand partition over the q128 copurchase
    // graph: does the catalog taxonomy respect the actual co-buy
    // communities. Exact integer cut/volume; one micro ratio.
    Q("q301_brand_conductance",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        val edges = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"id_a", $"id_b")
        val assign = Tables.part(s, d)
          .select($"p_partkey".as("id"), $"p_brand".as("grp"))
        graft.ext.LinkGraph.partitionConductance(edges, assign)
          .orderBy($"grp")
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (
             |  SELECT x.pk AS id_a, y.pk AS id_b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |asg AS (SELECT p_partkey AS id, p_brand AS grp FROM part),
             |tg AS (
             |  SELECT e.id_a, e.id_b, a1.grp AS ga, a2.grp AS gb
             |  FROM e JOIN asg a1 ON a1.id = e.id_a
             |         JOIN asg a2 ON a2.id = e.id_b),
             |cut AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS cut_edges
             |  FROM (SELECT unnest([ga, gb]) AS grp FROM tg WHERE ga != gb)
             |  GROUP BY 1),
             |deg AS (
             |  SELECT id, CAST(count(*) AS BIGINT) AS deg
             |  FROM (SELECT unnest([id_a, id_b]) AS id FROM tg) GROUP BY 1),
             |vol AS (
             |  SELECT grp, CAST(count(*) AS BIGINT) AS n_nodes,
             |    CAST(sum(deg) AS BIGINT) AS vol
             |  FROM deg JOIN asg USING (id) GROUP BY 1),
             |tot AS (SELECT CAST(count(*) * 2 AS BIGINT) AS tot_vol FROM tg)
             |SELECT vol.grp, n_nodes, vol,
             |  coalesce(cut.cut_edges, 0) AS cut_edges,
             |  CASE WHEN least(vol, tot_vol - vol) > 0 THEN
             |    CAST(round(CAST(coalesce(cut.cut_edges, 0) AS DOUBLE) * 1000000.0
             |      / CAST(least(vol, tot_vol - vol) AS DOUBLE)) AS BIGINT)
             |  ELSE NULL END AS conductance_micro
             |FROM vol LEFT JOIN cut ON cut.grp = vol.grp CROSS JOIN tot
             |ORDER BY vol.grp""".stripMargin)),

    // Grid-blocked DBSCAN over the embeddings' first two coordinates:
    // core/border/noise roles and min-id cluster labels, candidate
    // pairs from the 3×3 cell join, components via iterative min-label.
    Q("q302_dbscan_grid",
      (s, d) => {
        import s.implicits._
        val pts = Tables.embeddings(s, d).select($"vec_id".as("id"),
          round(col("embedding").getItem(0).cast("double") * 1000000.0, 0)
            .cast("long").as("lat"),
          round(col("embedding").getItem(1).cast("double") * 1000000.0, 0)
            .cast("long").as("lon"))
        graft.ops.Spatial.dbscanGrid(pts, rMicro = 30000L, minPts = 5)
          .orderBy($"id")
      },
      Some("""WITH RECURSIVE p AS (
             |  SELECT vec_id AS id,
             |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x,
             |    CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS y
             |  FROM embeddings),
             |nb AS (SELECT a.id AS ia, b.id AS ib FROM p a JOIN p b
             |  ON a.id != b.id AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)
             |     <= CAST(30000 AS BIGINT)*30000),
             |cnt AS (SELECT ia AS id, CAST(count(*) AS BIGINT) AS n
             |        FROM nb GROUP BY 1),
             |core AS (SELECT id FROM cnt WHERE n + 1 >= 5),
             |ce AS (SELECT nb.ia AS src, nb.ib AS dst FROM nb
             |       JOIN core c1 ON c1.id = nb.ia JOIN core c2 ON c2.id = nb.ib),
             |reach AS (SELECT id, id AS lbl FROM core
             |  UNION SELECT e.dst AS id, r.lbl FROM reach r
             |        JOIN ce e ON e.src = r.id),
             |comp AS (SELECT id, CAST(min(lbl) AS BIGINT) AS c_label
             |         FROM reach GROUP BY 1),
             |border AS (SELECT nb.ia AS id, CAST(min(comp.c_label) AS BIGINT)
             |    AS b_label
             |  FROM nb JOIN comp ON comp.id = nb.ib
             |  WHERE nb.ia NOT IN (SELECT id FROM core) GROUP BY 1)
             |SELECT p.id, coalesce(cnt.n, 0) AS n_neighbors,
             |  CASE WHEN comp.id IS NOT NULL THEN 'core'
             |       WHEN border.id IS NOT NULL THEN 'border'
             |       ELSE 'noise' END AS role,
             |  coalesce(comp.c_label, border.b_label) AS cluster
             |FROM p LEFT JOIN cnt ON cnt.id = p.id
             |LEFT JOIN comp ON comp.id = p.id
             |LEFT JOIN border ON border.id = p.id
             |ORDER BY p.id""".stripMargin)),

    // Distinct + entropy l-diversity per (nation, segment) class over
    // banded balances: the homogeneity-attack audit on top of q246's
    // k-anonymity census.
    Q("q303_l_diversity",
      (s, d) => {
        import s.implicits._
        graft.ops.Privacy.lDiversityReport(Tables.customer(s, d),
            Seq($"c_nationkey", $"c_mktsegment"), Seq("nat", "seg"),
            floor($"c_acctbal" / 1000).cast("long"), l = 3L)
          .orderBy($"nat", $"seg")
      },
      Some("""WITH vc AS (
             |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
             |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS sv,
             |    CAST(count(*) AS BIGINT) AS n_cv
             |  FROM customer GROUP BY 1, 2, 3),
             |pc AS (SELECT nat, seg, n_cv,
             |    CAST(sum(n_cv) OVER (PARTITION BY nat, seg) AS BIGINT) AS n_c
             |  FROM vc),
             |t AS (SELECT nat, seg, n_c,
             |    CAST(round(-(CAST(n_cv AS DOUBLE) / CAST(n_c AS DOUBLE))
             |      * ln(CAST(n_cv AS DOUBLE) / CAST(n_c AS DOUBLE))
             |      * 1000000) AS BIGINT) AS term
             |  FROM pc)
             |SELECT nat, seg, CAST(max(n_c) AS BIGINT) AS class_size,
             |  CAST(count(*) AS BIGINT) AS n_sensitive,
             |  CAST(sum(term) AS BIGINT) AS entropy_micro,
             |  count(*) >= 3 AS distinct_ok,
             |  CAST(sum(term) AS BIGINT) >= 1098612 AS entropy_ok
             |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Readability per source from the vowel-group syllable proxy:
    // syllables/word, complex-word share, and a Gunning-Fog-style
    // grade — one exploded-token aggregation pass.
    Q("q304_readability",
      (s, d) => {
        import s.implicits._
        val tr = Tables.documents(s, d).select($"source".as("src"),
          $"doc_id".as("id"),
          explode(graft.ext.TextAnalysis.tokens($"text")).as("tok"))
        tr.withColumn("syl", graft.ext.TextAnalysis.syllableEstimate($"tok"))
          .groupBy($"src")
          .agg(countDistinct($"id").as("n_docs"),
            count(lit(1)).as("n_words"),
            sum($"syl").as("n_syll"),
            sum(when($"syl" >= 3, 1L).otherwise(0L)).as("n_complex"))
          .select($"src".as("source"), $"n_docs", $"n_words",
            round($"n_syll".cast("double") * 1000000.0
              / $"n_words".cast("double"), 0).cast("long")
              .as("syll_per_word_micro"),
            round($"n_complex".cast("double") * 1000000.0
              / $"n_words".cast("double"), 0).cast("long")
              .as("complex_share_micro"),
            round(lit(0.4) * ($"n_words".cast("double") / $"n_docs".cast("double")
              + lit(100.0) * $"n_complex".cast("double")
                / $"n_words".cast("double")) * 1000000.0, 0).cast("long")
              .as("fog_micro"))
          .orderBy($"source")
      },
      Some("""WITH tr AS (
             |  SELECT source AS src, doc_id AS id,
             |    unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |ts AS (SELECT src, id,
             |    CAST(len(regexp_extract_all(lower(tok), '[aeiou]+')) AS BIGINT)
             |      AS syl
             |  FROM tr),
             |ag AS (SELECT src,
             |    CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
             |    CAST(count(*) AS BIGINT) AS n_words,
             |    CAST(sum(syl) AS BIGINT) AS n_syll,
             |    CAST(sum(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_complex
             |  FROM ts GROUP BY 1)
             |SELECT src AS source, n_docs, n_words,
             |  CAST(round(CAST(n_syll AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |    / CAST(n_words AS DOUBLE)) AS BIGINT) AS syll_per_word_micro,
             |  CAST(round(CAST(n_complex AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |    / CAST(n_words AS DOUBLE)) AS BIGINT) AS complex_share_micro,
             |  CAST(round(CAST(0.4 AS DOUBLE)
             |    * (CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE)
             |      + CAST(100 AS DOUBLE) * CAST(n_complex AS DOUBLE)
             |        / CAST(n_words AS DOUBLE))
             |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS fog_micro
             |FROM ag ORDER BY source""".stripMargin)),

    // LSH banding design table: FP/FN areas of the (b, r) S-curves
    // around the 0.7 similarity target for 128 hashes — the planner a
    // 100-TB near-dup run consults before committing a banding.
    Q("q305_lsh_plan",
      (s, d) => {
        import s.implicits._
        graft.ext.Similarity.lshPlan(s, nHashes = 128, threshold = 0.7)
          .orderBy($"b")
      },
      Some("""WITH cand AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS bi),
             |c2 AS (SELECT CAST(bi AS BIGINT) AS b,
             |  CAST(128 // bi AS BIGINT) AS r FROM cand),
             |g AS (SELECT (CAST(2 * i + 1 AS DOUBLE) / CAST(200 AS DOUBLE)) AS s
             |      FROM range(0, 100) t(i)),
             |p AS (SELECT b, r, s,
             |    CAST(round((CAST(1 AS DOUBLE)
             |      - pow(CAST(1 AS DOUBLE) - pow(s, CAST(r AS DOUBLE)),
             |          CAST(b AS DOUBLE))) * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |      AS pm
             |  FROM c2 CROSS JOIN g),
             |ag AS (SELECT b, r,
             |    CAST(sum(CASE WHEN s < CAST(0.7 AS DOUBLE) THEN pm ELSE 0 END)
             |      AS BIGINT) AS fp_sum,
             |    CAST(sum(CASE WHEN s >= CAST(0.7 AS DOUBLE) THEN 1000000 - pm
             |      ELSE 0 END) AS BIGINT) AS fn_sum
             |  FROM p GROUP BY 1, 2)
             |SELECT b, r,
             |  CAST(round(CAST(fp_sum AS DOUBLE) / CAST(100 AS DOUBLE)) AS BIGINT)
             |    AS fp_micro,
             |  CAST(round(CAST(fn_sum AS DOUBLE) / CAST(100 AS DOUBLE)) AS BIGINT)
             |    AS fn_micro,
             |  CAST(round(CAST(fp_sum AS DOUBLE) / CAST(100 AS DOUBLE)) AS BIGINT)
             |    + CAST(round(CAST(fn_sum AS DOUBLE) / CAST(100 AS DOUBLE))
             |      AS BIGINT) AS total_micro
             |FROM ag ORDER BY b""".stripMargin)),

    // DoReMi-style mixing table: per-source unigram NLL against the
    // full-corpus model, then three exponentiated-gradient rounds tilt
    // the uniform mix toward hard domains — every exp micro-rounded,
    // normalization by floor div.
    Q("q306_doremi_mix",
      (s, d) => {
        import s.implicits._
        graft.ext.CorpusOps.doremiMixWeights(Tables.documents(s, d),
            "doc_id", "text", "source", rounds = 3)
          .orderBy($"source")
      },
      Some {
        val head =
          """WITH tok AS (
            |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
            |  FROM documents),
            |sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st
            |       FROM tok GROUP BY 1, 2),
            |gl AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM sc GROUP BY 1),
            |cn AS (SELECT CAST(sum(c_t) AS BIGINT) AS nn,
            |       CAST(count(*) AS BIGINT) AS v FROM gl),
            |tm AS (SELECT source, c_st,
            |    c_st * CAST(round(-ln(CAST(c_t + 1 AS DOUBLE)
            |      / CAST(nn + v AS DOUBLE)) * 1000000) AS BIGINT) AS t_micro
            |  FROM sc JOIN gl USING (tok) CROSS JOIN cn),
            |ls AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_tokens,
            |    CAST(round(CAST(sum(t_micro) AS DOUBLE)
            |      / CAST(sum(c_st) AS DOUBLE)) AS BIGINT) AS nll
            |  FROM tm GROUP BY 1),
            |lb AS (SELECT CAST(round(CAST(sum(nll) AS DOUBLE)
            |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS l_bar FROM ls),
            |w0 AS (SELECT source, n_tokens, nll, CAST(1000000 AS BIGINT) AS w
            |       FROM ls)""".stripMargin
        val rounds = (1 to 3).map { i =>
          s"""
             |,x$i AS (SELECT source, n_tokens, nll,
             |    CAST(round(CAST(w AS DOUBLE)
             |      * exp(CAST(nll - l_bar AS DOUBLE) / CAST(l_bar AS DOUBLE)))
             |      AS BIGINT) AS raw
             |  FROM w${i - 1} CROSS JOIN lb)
             |,w$i AS (SELECT source, n_tokens, nll,
             |    raw * 1000000 // sum(raw) OVER () AS w FROM x$i)""".stripMargin
        }.mkString
        head + rounds +
          "\nSELECT source, n_tokens, nll AS nll_micro, CAST(w AS BIGINT) AS w_micro" +
          "\nFROM w3 ORDER BY source"
      }),

    // Interpolated Kneser–Ney bigram NLL per source on the held-out
    // panel: discounted bigram mass + continuation-count smoothing —
    // the exact smoothed LM next to q131's backoff approximation.
    Q("q307_kneser_ney",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.knBigramNllBySource(Tables.documents(s, d),
            "doc_id", "text", "source")
          .orderBy($"source")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, source,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |tru AS (SELECT id, source,
             |    unnest(list_transform(l[1:len(l)-1],
             |      (x, i) -> {'v': x, 'w': l[i+1]})) AS u
             |  FROM base WHERE id % 7 != 0),
             |trp AS (SELECT source, (u).v AS v, (u).w AS w FROM tru),
             |cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c_vw
             |        FROM trp GROUP BY 1, 2),
             |cv AS (SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v,
             |       CAST(count(*) AS BIGINT) AS n1_v FROM cvw GROUP BY 1),
             |cw AS (SELECT w, CAST(count(*) AS BIGINT) AS cont_w
             |       FROM cvw GROUP BY 1),
             |tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM cvw),
             |pnu AS (SELECT id, source,
             |    unnest(list_transform(l[1:len(l)-1],
             |      (x, i) -> {'v': x, 'w': l[i+1]})) AS u
             |  FROM base WHERE id % 7 = 0),
             |pp AS (SELECT source, (u).v AS v, (u).w AS w,
             |    CAST(count(*) AS BIGINT) AS b_c
             |  FROM pnu GROUP BY 1, 2, 3),
             |sc AS (SELECT source, b_c,
             |    cv.c_v IS NULL OR cw.cont_w IS NULL AS oov,
             |    (greatest(CAST(coalesce(cvw.c_vw, 0) AS DOUBLE)
             |        - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
             |      + CAST(0.75 AS DOUBLE) * CAST(cv.n1_v AS DOUBLE)
             |        * CAST(cw.cont_w AS DOUBLE) / CAST(tt.tt AS DOUBLE))
             |      / CAST(cv.c_v AS DOUBLE) AS p
             |  FROM pp LEFT JOIN cv USING (v) LEFT JOIN cw USING (w)
             |  LEFT JOIN cvw USING (v, w) CROSS JOIN tt),
             |t2 AS (SELECT source, b_c, oov,
             |    CASE WHEN oov THEN 0
             |      ELSE CAST(round(-ln(p) * 1000000) AS BIGINT) END AS t_micro
             |  FROM sc)
             |SELECT source,
             |  CAST(sum(CASE WHEN NOT oov THEN b_c ELSE 0 END) AS BIGINT)
             |    AS n_scored,
             |  CAST(sum(CASE WHEN oov THEN b_c ELSE 0 END) AS BIGINT) AS n_oov,
             |  CASE WHEN sum(CASE WHEN NOT oov THEN b_c ELSE 0 END) > 0 THEN
             |    CAST(round(CAST(sum(t_micro * b_c) AS DOUBLE)
             |      / CAST(sum(CASE WHEN NOT oov THEN b_c ELSE 0 END) AS DOUBLE))
             |      AS BIGINT)
             |  ELSE NULL END AS kn_nll_micro
             |FROM t2 GROUP BY source ORDER BY source""".stripMargin)),

    // TextTiling-lite: distinct-token Jaccard cohesion at every gap,
    // boundaries at sub-threshold local minima — topic-shift chunking
    // next to the fixed-stride (q84) and CDC (q277) chunkers.
    Q("q308_text_tiling",
      (s, d) => {
        import s.implicits._
        graft.ext.TextSegment.tilingGaps(Tables.documents(s, d),
            "doc_id", "text", w = 8, stride = 4, thresholdMicro = 200000L)
          .orderBy($"doc_id", $"pos")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |b2 AS (SELECT doc_id, l FROM base WHERE len(l) >= 16),
             |g AS (SELECT doc_id, l, unnest(generate_series(8, len(l) - 8, 4))
             |      AS p FROM b2),
             |s1 AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
             |    list_distinct(l[(p-7):p]) AS da,
             |    list_distinct(l[(p+1):(p+8)]) AS db
             |  FROM g),
             |s2 AS (SELECT doc_id, pos,
             |    CAST(len(list_intersect(da, db)) AS BIGINT) AS inter,
             |    CAST(len(da) AS BIGINT) AS sa, CAST(len(db) AS BIGINT) AS sb
             |  FROM s1),
             |s3 AS (SELECT doc_id, pos,
             |    CAST(round(CAST(inter AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |      / CAST(sa + sb - inter AS DOUBLE)) AS BIGINT) AS sim_micro
             |  FROM s2),
             |s4 AS (SELECT doc_id, pos, sim_micro,
             |    lag(sim_micro) OVER (PARTITION BY doc_id ORDER BY pos) AS prv,
             |    lead(sim_micro) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
             |  FROM s3)
             |SELECT doc_id, pos, sim_micro,
             |  sim_micro < 200000
             |    AND sim_micro <= coalesce(prv, 9223372036854775807)
             |    AND sim_micro < coalesce(nxt, 9223372036854775807) AS boundary
             |FROM s4 ORDER BY doc_id, pos""".stripMargin)),

    // 5-fold cross-validated NB accuracy in one pass: every fold's
    // model is the complement of the global counts, so k models train
    // and score without k corpus passes.
    Q("q309_crossval_nb",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.crossValNb(Tables.documents(s, d),
            "doc_id", "text", $"lang" === "en", k = 5)
          .orderBy($"fold")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, doc_id % 5 AS fold, lang = 'en' AS gold,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |tokrows AS (SELECT id, fold, gold, unnest(l) AS tok FROM base),
             |counts AS (SELECT tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM tokrows GROUP BY 1),
             |fc AS (SELECT tok, fold,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1f,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0f
             |  FROM tokrows GROUP BY 1, 2),
             |gl AS (SELECT CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0
             |  FROM counts),
             |dt AS (SELECT
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS d0
             |  FROM base),
             |lost AS (SELECT fold, CAST(count(*) AS BIGINT) AS v_lost
             |  FROM fc JOIN counts USING (tok)
             |  WHERE fc.c1f + fc.c0f = counts.c1 + counts.c0 GROUP BY 1),
             |ftot AS (SELECT fold, CAST(sum(c1f) AS BIGINT) AS n1f,
             |    CAST(sum(c0f) AS BIGINT) AS n0f FROM fc GROUP BY 1),
             |fdoc AS (SELECT fold,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS d1f,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS d0f
             |  FROM base GROUP BY 1),
             |fcst AS (
             |  SELECT ftot.fold, n1 - n1f AS n1c, n0 - n0f AS n0c,
             |    d1 - d1f AS d1c, d0 - d0f AS d0c,
             |    v - coalesce(v_lost, 0) AS vc
             |  FROM ftot JOIN fdoc ON fdoc.fold = ftot.fold
             |  LEFT JOIN lost ON lost.fold = ftot.fold
             |  CROSS JOIN gl CROSS JOIN dt),
             |sc AS (
             |  SELECT id, t.fold, gold,
             |    CAST(sum(CAST(round((ln(CAST(c1 - coalesce(c1f, 0) + 1 AS DOUBLE)
             |        / CAST(n1c + vc AS DOUBLE))
             |      - ln(CAST(c0 - coalesce(c0f, 0) + 1 AS DOUBLE)
             |        / CAST(n0c + vc AS DOUBLE))) * 1000000) AS BIGINT))
             |      AS BIGINT) AS s_cv
             |  FROM tokrows t JOIN counts USING (tok)
             |  LEFT JOIN fc ON fc.tok = t.tok AND fc.fold = t.fold
             |  JOIN fcst ON fcst.fold = t.fold
             |  GROUP BY 1, 2, 3),
             |pr AS (SELECT fold,
             |    CAST(round((ln(CAST(d1c + 1 AS DOUBLE))
             |      - ln(CAST(d0c + 1 AS DOUBLE))) * 1000000) AS BIGINT) AS p_cv
             |  FROM fcst)
             |SELECT sc.fold, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(round(CAST(sum(CASE WHEN (p_cv + s_cv >= 0) = gold
             |      THEN 1 ELSE 0 END) AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_milli
             |FROM sc JOIN pr USING (fold) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Dirichlet query-likelihood retrieval: matched-term decomposition
    // over the inverted index + per-doc length term on the bounded
    // (queries × docs) grid — the third classic ranker beside TF-IDF
    // (q183) and BM25 (q165).
    Q("q310_dirichlet_ql",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.dirichletQlTopK(Tables.documents(s, d),
            "doc_id", "text", qMod = 50, qLen = 4, mu = 100L, k = 3)
          .orderBy($"q_id", $"rnk")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |tf AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT id, unnest(l) AS tok FROM base) GROUP BY 1, 2),
             |dl AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
             |cw AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c_w FROM tf GROUP BY 1),
             |tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS nn FROM cw),
             |qr AS (SELECT id AS q_id, tok, CAST(count(*) AS BIGINT) AS qtf
             |  FROM (SELECT id, unnest(l[1:4]) AS tok FROM base WHERE id % 50 = 0)
             |  GROUP BY 1, 2),
             |ql AS (SELECT q_id, CAST(sum(qtf) AS BIGINT) AS q_len
             |       FROM qr GROUP BY 1),
             |mt AS (
             |  SELECT qr.q_id, tf.id AS doc_id,
             |    CAST(sum(qtf * CAST(round(ln(CAST(1.0 AS DOUBLE)
             |      + CAST(tf.tf AS DOUBLE) * CAST(nn AS DOUBLE)
             |        / (CAST(100 AS DOUBLE) * CAST(c_w AS DOUBLE)))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS m_sum
             |  FROM qr JOIN tf USING (tok) JOIN cw USING (tok) CROSS JOIN tot
             |  GROUP BY 1, 2),
             |grid AS (
             |  SELECT ql.q_id, dl.id AS doc_id, ql.q_len, dl.dl,
             |    coalesce(mt.m_sum, 0) AS m_sum
             |  FROM ql CROSS JOIN dl
             |  LEFT JOIN mt ON mt.q_id = ql.q_id AND mt.doc_id = dl.id),
             |sc AS (SELECT q_id, doc_id,
             |    m_sum + q_len * CAST(round(ln(CAST(100 AS DOUBLE)
             |      / (CAST(dl AS DOUBLE) + CAST(100 AS DOUBLE)))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS score_micro
             |  FROM grid)
             |SELECT q_id,
             |  CAST(row_number() OVER (PARTITION BY q_id
             |    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk,
             |  doc_id, score_micro
             |FROM sc QUALIFY rnk <= 3 ORDER BY q_id, rnk""".stripMargin)),

    // Merkle integrity manifest per source: poly-hash leaves in id
    // order, 12 pairing rounds to one root — the snapshot checksum
    // published next to the versioned parquet (q55/q132).
    Q("q311_merkle_manifest",
      (s, d) => {
        import s.implicits._
        graft.ext.Dedup.merkleRootBySlice(Tables.documents(s, d),
            "doc_id", "text", "source", rounds = 12)
          .orderBy($"source")
      },
      Some {
        val head =
          """WITH l0 AS (
            |  SELECT source AS src,
            |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
            |      AS BIGINT) AS idx,
            |    list_reduce(list_prepend(CAST(0 AS BIGINT),
            |      list_transform(generate_series(1, length(text)),
            |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
            |      (a, b) -> (a * 31 + b) % 1000000007) AS h
            |  FROM documents)""".stripMargin
        val rounds = (1 to 12).map { r =>
          s"""
             |,l$r AS (
             |  SELECT src, idx // 2 AS idx,
             |    CASE WHEN count(*) = 2
             |      THEN (arg_min(h, idx) * 8191 + arg_max(h, idx)) % 1000000007
             |      ELSE arg_min(h, idx) END AS h
             |  FROM l${r - 1} GROUP BY src, idx // 2)""".stripMargin
        }.mkString
        head + rounds +
          """
            |,roots AS (SELECT src, CAST(count(*) AS BIGINT) AS n_nodes,
            |    CAST(min(h) AS BIGINT) AS root_hash FROM l12 GROUP BY 1),
            |sizes AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS n_docs
            |          FROM documents GROUP BY 1)
            |SELECT src AS source, n_docs, root_hash, n_nodes
            |FROM sizes JOIN roots USING (src) ORDER BY source""".stripMargin
      }),

    // Hash-forest density outliers over the first four embedding
    // coordinates: 8 deterministic hash-built trees of depth 4, score
    // = mean leaf occupancy, bottom-20 — the rand()-free isolation-
    // forest reading, exact integers end to end.
    Q("q312_hash_forest_outliers",
      (s, d) => {
        import s.implicits._
        val pts = Tables.embeddings(s, d).select($"vec_id".as("id") +:
          (0 until 4).map(i =>
            round(col("embedding").getItem(i).cast("double") * 1000000.0, 0)
              .cast("long").as(s"e$i")): _*)
        graft.ext.HashForest.outliers(pts, "id",
            Seq("e0", "e1", "e2", "e3"), trees = 8, depth = 4, k = 20)
          .orderBy($"rnk")
      },
      Some {
        val head =
          """WITH p AS (
            |  SELECT vec_id AS id,
            |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x0,
            |    CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS x1,
            |    CAST(round(CAST(embedding[3] AS DOUBLE) * 1000000) AS BIGINT) AS x2,
            |    CAST(round(CAST(embedding[4] AS DOUBLE) * 1000000) AS BIGINT) AS x3
            |  FROM embeddings),
            |box AS (SELECT min(x0) AS lo0, max(x0) AS hi0, min(x1) AS lo1,
            |    max(x1) AS hi1, min(x2) AS lo2, max(x2) AS hi2,
            |    min(x3) AS lo3, max(x3) AS hi3 FROM p),
            |nodes AS (
            |  SELECT CAST(t AS BIGINT) AS tree, CAST(l AS BIGINT) AS lvl,
            |    CAST(i AS BIGINT) AS idx,
            |    CAST((t * 31 + l * 7 + i * 17) % 4 AS BIGINT) AS f,
            |    CAST((t * 1103515245 + l * 12345 + i * 7919 + 7) % 1000
            |      AS BIGINT) AS frac
            |  FROM range(0, 8) tt(t), range(0, 4) ll(l), range(0, 8) ii(i)
            |  WHERE i < (1 << l)),
            |w0 AS (SELECT p.id, n.tree, x0, x1, x2, x3, CAST(0 AS BIGINT) AS idx
            |  FROM p CROSS JOIN box CROSS JOIN
            |    (SELECT DISTINCT tree FROM nodes) n)""".stripMargin
        def xF = "CASE WHEN n.f = 0 THEN x0 WHEN n.f = 1 THEN x1 " +
          "WHEN n.f = 2 THEN x2 ELSE x3 END"
        def splitF = "CASE WHEN n.f = 0 THEN lo0 + n.frac * (hi0 - lo0) // 1000 " +
          "WHEN n.f = 1 THEN lo1 + n.frac * (hi1 - lo1) // 1000 " +
          "WHEN n.f = 2 THEN lo2 + n.frac * (hi2 - lo2) // 1000 " +
          "ELSE lo3 + n.frac * (hi3 - lo3) // 1000 END"
        val walks = (0 until 4).map { l =>
          s"""
             |,w${l + 1} AS (
             |  SELECT w$l.id, w$l.tree, x0, x1, x2, x3,
             |    w$l.idx * 2 + CASE WHEN ($xF) > ($splitF) THEN 1 ELSE 0 END AS idx
             |  FROM w$l CROSS JOIN box
             |  JOIN nodes n ON n.tree = w$l.tree AND n.lvl = $l
             |    AND n.idx = w$l.idx)""".stripMargin
        }.mkString
        head + walks +
          """
            |,occ AS (SELECT tree, idx AS leaf, CAST(count(*) AS BIGINT) AS n_leaf
            |  FROM w4 GROUP BY 1, 2),
            |dens AS (
            |  SELECT w4.id,
            |    CAST(round(CAST(sum(n_leaf) AS DOUBLE) * CAST(1000 AS DOUBLE)
            |      / CAST(8 AS DOUBLE)) AS BIGINT) AS density_milli
            |  FROM w4 JOIN occ ON occ.tree = w4.tree AND occ.leaf = w4.idx
            |  GROUP BY 1)
            |SELECT id, density_milli,
            |  CAST(row_number() OVER (ORDER BY density_milli, id) AS BIGINT) AS rnk
            |FROM dens ORDER BY density_milli, id LIMIT 20""".stripMargin
      }),

    // NB smoothing grid search in one dataflow: the vocab-sized LLR
    // table crosses the 5-point alpha grid, the corpus is scanned once
    // — hyperparameter sweep without per-configuration passes.
    Q("q313_alpha_sweep",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.alphaSweepNb(Tables.documents(s, d),
            "doc_id", "text", $"lang" === "en",
            Seq(100000L, 500000L, 1000000L, 2000000L, 5000000L))
          .orderBy($"alpha_micro")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, lang = 'en' AS gold,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |tr AS (SELECT * FROM base WHERE id % 7 != 0),
             |pn AS (SELECT * FROM base WHERE id % 7 = 0),
             |counts AS (SELECT tok,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0
             |  FROM (SELECT gold, unnest(l) AS tok FROM tr) GROUP BY 1),
             |gl AS (SELECT CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0
             |  FROM counts),
             |pr AS (SELECT CAST(round((ln(CAST(
             |      sum(CASE WHEN gold THEN 1 ELSE 0 END) + 1 AS DOUBLE))
             |    - ln(CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) + 1 AS DOUBLE)))
             |    * 1000000) AS BIGINT) AS p_micro FROM tr),
             |al AS (SELECT CAST(unnest([100000, 500000, 1000000, 2000000,
             |    5000000]) AS BIGINT) AS alpha_micro),
             |terms AS (
             |  SELECT tok, alpha_micro,
             |    CAST(round((ln((CAST(c1 AS DOUBLE)
             |        + CAST(alpha_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |      / (CAST(n1 AS DOUBLE)
             |        + CAST(alpha_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
             |          * CAST(v AS DOUBLE)))
             |      - ln((CAST(c0 AS DOUBLE)
             |        + CAST(alpha_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |      / (CAST(n0 AS DOUBLE)
             |        + CAST(alpha_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
             |          * CAST(v AS DOUBLE)))) * 1000000) AS BIGINT) AS t_micro
             |  FROM counts CROSS JOIN al CROSS JOIN gl),
             |sc AS (
             |  SELECT p.id, p.gold, t.alpha_micro,
             |    CAST(sum(t.t_micro) AS BIGINT) AS s_sum
             |  FROM (SELECT id, gold, unnest(l) AS tok FROM pn) p
             |  JOIN terms t USING (tok)
             |  GROUP BY 1, 2, 3)
             |SELECT alpha_micro, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(round(CAST(sum(CASE WHEN (p_micro + s_sum >= 0) = gold
             |      THEN 1 ELSE 0 END) AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_milli
             |FROM sc CROSS JOIN pr GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Seasonal-naive MASE per event type over daily volumes: the
    // scale-free forecast baseline, gap-safe through value joins.
    Q("q314_mase_eval",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .select(expr("cast(ts as long) div 86400").as("day"), $"event_type")
          .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
        graft.ops.TimeSeries.seasonalNaiveEval(daily, "event_type", "day",
            "n", season = 7)
          .select($"key".as("event_type"), $"n_eval", $"mae_seasonal_milli",
            $"mae_naive_milli", $"mase_milli")
          .orderBy($"event_type")
      },
      Some("""WITH e AS (
             |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
             |    // 86400 AS day
             |  FROM events),
             |ds AS (SELECT event_type AS key, day AS t,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM e GROUP BY 1, 2),
             |ev AS (
             |  SELECT c.key, c.t, c.y, s.y AS y_season, p.y AS y_prev
             |  FROM ds c JOIN ds s ON s.key = c.key AND s.t + 7 = c.t
             |  JOIN ds p ON p.key = c.key AND p.t + 1 = c.t),
             |ag AS (SELECT key, CAST(count(*) AS BIGINT) AS n_eval,
             |    CAST(sum(abs(y - y_season)) AS BIGINT) AS ae_s,
             |    CAST(sum(abs(y - y_prev)) AS BIGINT) AS ae_n
             |  FROM ev GROUP BY 1)
             |SELECT key AS event_type, n_eval,
             |  CAST(round(CAST(ae_s AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(n_eval AS DOUBLE)) AS BIGINT) AS mae_seasonal_milli,
             |  CAST(round(CAST(ae_n AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(n_eval AS DOUBLE)) AS BIGINT) AS mae_naive_milli,
             |  CASE WHEN ae_n > 0 THEN
             |    CAST(round(CAST(ae_s AS DOUBLE) * CAST(1000 AS DOUBLE)
             |      / CAST(ae_n AS DOUBLE)) AS BIGINT)
             |  ELSE NULL END AS mase_milli
             |FROM ag ORDER BY event_type""".stripMargin)),

    // Hill diversity profile per source: effective token counts at
    // orders 0/1/2 — richness, exp(Shannon), inverse Simpson.
    Q("q315_hill_diversity",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.hillDiversity(Tables.documents(s, d),
            "text", "source")
          .orderBy($"source")
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n_st
             |  FROM (SELECT source,
             |        unnest(string_split_regex(trim(text), '\s+')) AS tok
             |      FROM documents) GROUP BY 1, 2),
             |wt AS (SELECT source, n_st,
             |    CAST(sum(n_st) OVER (PARTITION BY source) AS BIGINT) AS n_s
             |  FROM tc),
             |ht AS (SELECT source, n_s, n_st,
             |    CAST(round(-(CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
             |      * ln(CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
             |      * 1000000) AS BIGINT) AS h_term
             |  FROM wt)
             |SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS hill0,
             |  CAST(round(exp(CAST(sum(h_term) AS DOUBLE)
             |    / CAST(1000000 AS DOUBLE)) * CAST(1000 AS DOUBLE)) AS BIGINT)
             |    AS hill1_milli,
             |  CAST(round(CAST(max(n_s) AS DOUBLE) * CAST(max(n_s) AS DOUBLE)
             |    / CAST(sum(n_st * n_st) AS DOUBLE) * CAST(1000 AS DOUBLE))
             |    AS BIGINT) AS hill2_milli
             |FROM ht GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Wang–Isola alignment (exact, per-label moments — no pair join)
    // and uniformity (deterministic systematic pair sample) of the
    // embedding table.
    Q("q316_alignment_uniformity",
      (s, d) => {
        import s.implicits._
        graft.ext.Ranking.alignmentUniformity(Tables.embeddings(s, d),
          "vec_id", "embedding", "label")
      },
      Some("""WITH m AS (
             |  SELECT vec_id AS id, CAST(label AS BIGINT) AS lab,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vm
             |  FROM embeddings),
             |nr AS (SELECT id, lab,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(vm, x -> x * x)), (a, b) -> a + b) AS sq
             |  FROM m),
             |dims AS (
             |  SELECT lab,
             |    unnest(list_transform(vm, (x, i) -> {'pos': CAST(i AS BIGINT),
             |      'xm': x}), recursive := true)
             |  FROM m),
             |ds AS (SELECT lab, pos, CAST(sum(xm) AS BIGINT) AS s_d
             |       FROM dims GROUP BY 1, 2),
             |vs AS (SELECT lab, CAST(sum(s_d * s_d) AS BIGINT) AS vsum_sq
             |       FROM ds GROUP BY 1),
             |bl AS (
             |  SELECT nr.lab, CAST(count(*) AS BIGINT) AS n_l,
             |    CAST(sum(sq) AS BIGINT) AS sum_sq
             |  FROM nr GROUP BY 1),
             |pl AS (
             |  SELECT bl.lab, n_l,
             |    CAST(round(CAST(n_l AS DOUBLE) * CAST(sum_sq AS DOUBLE)
             |      * CAST(2 AS DOUBLE)
             |      - CAST(vsum_sq AS DOUBLE) * CAST(2 AS DOUBLE)) AS BIGINT)
             |      AS pair_d2,
             |    n_l * (n_l - 1) AS n_pairs
             |  FROM bl JOIN vs ON vs.lab = bl.lab),
             |alg AS (SELECT CAST(sum(pair_d2) AS BIGINT) AS d2_tot,
             |    CAST(sum(n_pairs) AS BIGINT) AS np FROM pl),
             |prs AS (
             |  SELECT a.id, CAST(round(exp(CAST(
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(a.vm, (x, i) ->
             |          (x - b.vm[i]) * (x - b.vm[i]))), (p, v) -> p + v)
             |      AS DOUBLE) / CAST(-500000000000 AS DOUBLE))
             |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS e_micro
             |  FROM m a CROSS JOIN (SELECT unnest([1, 7, 31, 101]) AS step) st
             |  JOIN m b ON b.id = a.id + st.step),
             |un AS (SELECT CAST(count(*) AS BIGINT) AS nu,
             |    CAST(sum(e_micro) AS BIGINT) AS es FROM prs),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m)
             |SELECT n, np AS n_align_pairs,
             |  CAST(round(CAST(d2_tot AS DOUBLE) / CAST(np AS DOUBLE)
             |    / CAST(1000000 AS DOUBLE)) AS BIGINT) AS align_micro,
             |  nu AS n_unif_pairs,
             |  CAST(round(ln(CAST(es AS DOUBLE) / CAST(nu AS DOUBLE)
             |    / CAST(1000000 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |    AS uniform_micro
             |FROM nn CROSS JOIN alg CROSS JOIN un""".stripMargin)),

    // NB learning curve: five nested training prefixes built by ONE
    // bounded cumulative window over per-bucket counts — accuracy vs
    // data volume without re-scanning the corpus per point.
    Q("q317_learning_curve",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.learningCurveNb(Tables.documents(s, d),
            "doc_id", "text", $"lang" === "en", m = 5)
          .orderBy($"train_frac_pct")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, lang = 'en' AS gold,
             |    string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |tr AS (SELECT id, (id // 7) % 5 AS bkt, gold, l
             |       FROM base WHERE id % 7 != 0),
             |pn AS (SELECT id, gold, l FROM base WHERE id % 7 = 0),
             |bc AS (SELECT tok, bkt,
             |    CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1b,
             |    CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0b
             |  FROM (SELECT bkt, gold, unnest(l) AS tok FROM tr) GROUP BY 1, 2),
             |cum AS (SELECT tok, bkt,
             |    CAST(sum(c1b) OVER (PARTITION BY tok ORDER BY bkt) AS BIGINT)
             |      AS c1c,
             |    CAST(sum(c0b) OVER (PARTITION BY tok ORDER BY bkt) AS BIGINT)
             |      AS c0c
             |  FROM bc),
             |tokj AS (
             |  SELECT tok, j, c1c, c0c FROM (
             |    SELECT c.tok, g.j, c.c1c, c.c0c,
             |      row_number() OVER (PARTITION BY c.tok, g.j
             |        ORDER BY c.bkt DESC) AS rn
             |    FROM cum c JOIN (SELECT CAST(unnest(generate_series(0, 4))
             |      AS BIGINT) AS j) g ON g.j >= c.bkt)
             |  WHERE rn = 1),
             |cns AS (
             |  SELECT j, CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c1c) AS BIGINT) AS n1, CAST(sum(c0c) AS BIGINT) AS n0
             |  FROM tokj GROUP BY 1),
             |dcum AS (
             |  SELECT bkt AS j,
             |    CAST(sum(count(*)) OVER (ORDER BY bkt) AS BIGINT) AS n_train,
             |    CAST(sum(sum(CASE WHEN gold THEN 1 ELSE 0 END))
             |      OVER (ORDER BY bkt) AS BIGINT) AS d1,
             |    CAST(sum(sum(CASE WHEN gold THEN 0 ELSE 1 END))
             |      OVER (ORDER BY bkt) AS BIGINT) AS d0
             |  FROM tr GROUP BY bkt),
             |cns2 AS (
             |  SELECT cns.j, v, n1, n0, n_train,
             |    CAST(round((ln(CAST(d1 + 1 AS DOUBLE))
             |      - ln(CAST(d0 + 1 AS DOUBLE))) * 1000000) AS BIGINT) AS p_micro
             |  FROM cns JOIN dcum ON dcum.j = cns.j),
             |terms AS (
             |  SELECT tok, tokj.j,
             |    CAST(round((ln(CAST(c1c + 1 AS DOUBLE)
             |        / CAST(n1 + v AS DOUBLE))
             |      - ln(CAST(c0c + 1 AS DOUBLE)
             |        / CAST(n0 + v AS DOUBLE))) * 1000000) AS BIGINT) AS t_micro
             |  FROM tokj JOIN cns2 ON cns2.j = tokj.j),
             |sc AS (
             |  SELECT p.id, p.gold, t.j, CAST(sum(t.t_micro) AS BIGINT) AS s_sum
             |  FROM (SELECT id, gold, unnest(l) AS tok FROM pn) p
             |  JOIN terms t USING (tok) GROUP BY 1, 2, 3)
             |SELECT (sc.j + 1) * 100 // 5 AS train_frac_pct,
             |  n_train AS n_train_docs,
             |  CAST(round(CAST(sum(CASE WHEN (p_micro + s_sum >= 0) = gold
             |      THEN 1 ELSE 0 END) AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_milli
             |FROM sc JOIN cns2 ON cns2.j = sc.j
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // Padding-waste pricing for length-bucketed batching: power-of-two
    // ladder, padded slots vs real tokens per bucket.
    Q("q318_padding_waste",
      (s, d) => {
        import s.implicits._
        graft.ext.CorpusOps.paddingWasteReport(Tables.documents(s, d),
            "doc_id", graft.ext.TextAnalysis.tokenCount($"text"),
            Seq(8L, 16L, 32L, 64L, 128L))
          .orderBy($"bucket")
      },
      Some("""WITH t AS (
             |  SELECT doc_id AS id,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |      AS n_tok
             |  FROM documents),
             |b AS (SELECT id, n_tok,
             |    CASE WHEN n_tok <= 8 THEN 8 WHEN n_tok <= 16 THEN 16
             |      WHEN n_tok <= 32 THEN 32 WHEN n_tok <= 64 THEN 64
             |      ELSE 128 END AS bucket
             |  FROM t),
             |ag AS (SELECT CAST(bucket AS BIGINT) AS bucket,
             |    CAST(count(*) AS BIGINT) AS n_seqs,
             |    CAST(sum(least(n_tok, bucket)) AS BIGINT) AS sum_tokens
             |  FROM b GROUP BY 1)
             |SELECT bucket, n_seqs, sum_tokens,
             |  n_seqs * bucket AS padded_tokens,
             |  CAST(round(CAST(n_seqs * bucket - sum_tokens AS DOUBLE)
             |    * CAST(1000000 AS DOUBLE)
             |    / CAST(n_seqs * bucket AS DOUBLE)) AS BIGINT) AS waste_micro
             |FROM ag ORDER BY bucket""".stripMargin)),

    // CUPED variance-reduced A/B readout: pre-period spend as the
    // covariate, pooled theta from exact integer moments, per-variant
    // raw vs adjusted means — all in moment form, no per-row doubles.
    Q("q319_cuped",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id",
          expr("cast(ts as long) div 86400").as("day"),
          round($"value" * 100, 0).cast("long").as("cents"))
        val users = ev.groupBy($"user_id").agg(
          sum(when($"day" < 19738, $"cents").otherwise(0L)).as("pre_c"),
          sum(when($"day" >= 19738, $"cents").otherwise(0L)).as("post_c"))
        graft.ops.Causal.cuped(users, pmod($"user_id", lit(2)),
            $"pre_c", $"post_c")
          .orderBy($"variant")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |us AS (SELECT user_id,
             |    CAST(sum(CASE WHEN day < 19738 THEN cents ELSE 0 END)
             |      AS BIGINT) AS x,
             |    CAST(sum(CASE WHEN day >= 19738 THEN cents ELSE 0 END)
             |      AS BIGINT) AS y
             |  FROM ev GROUP BY 1),
             |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(y * y) AS BIGINT) AS syy
             |  FROM us),
             |cns AS (SELECT n,
             |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |        / CAST(n AS DOUBLE))
             |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |        / CAST(n AS DOUBLE)) AS theta,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
             |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE)) AS var_y,
             |    ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             |      / CAST(n AS DOUBLE))
             |     - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |        / CAST(n AS DOUBLE))
             |       * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             |        / CAST(n AS DOUBLE))
             |       / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             |        / CAST(n AS DOUBLE))) AS var_adj
             |  FROM mom),
             |pv AS (SELECT user_id % 2 AS variant,
             |    CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(x) AS BIGINT) AS sxv, CAST(sum(y) AS BIGINT) AS syv
             |  FROM us GROUP BY 1)
             |SELECT variant, n_users,
             |  CAST(round(CAST(syv AS DOUBLE) / CAST(n_users AS DOUBLE)
             |    * CAST(10 AS DOUBLE)) AS BIGINT) AS mean_y_milli,
             |  CAST(round((CAST(syv AS DOUBLE) / CAST(n_users AS DOUBLE)
             |    - theta * (CAST(sxv AS DOUBLE) / CAST(n_users AS DOUBLE) - xbar))
             |    * CAST(10 AS DOUBLE)) AS BIGINT) AS mean_adj_milli,
             |  CAST(round(theta * CAST(1000000 AS DOUBLE)) AS BIGINT)
             |    AS theta_micro,
             |  CAST(round(var_adj / var_y * CAST(1000 AS DOUBLE)) AS BIGINT)
             |    AS var_ratio_milli
             |FROM pv CROSS JOIN cns ORDER BY variant""".stripMargin)),

    // Difference-in-differences on the 2×2 variant × period design:
    // exact cell sums, four means, one DiD estimate.
    Q("q320_diff_in_diff",
      (s, d) => {
        import s.implicits._
        val rows = Tables.events(s, d).select(
          pmod($"user_id", lit(2)).as("variant"),
          (expr("cast(ts as long) div 86400") >= 19738).as("is_post"),
          round($"value" * 100, 0).cast("long").as("cents"))
        graft.ops.Causal.diffInDiff(rows, $"variant", $"is_post", $"cents")
      },
      Some("""WITH ev AS (
             |  SELECT user_id % 2 AS v,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 >= 19738
             |      AS p,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |cells AS (SELECT v, p, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(c) AS BIGINT) AS s
             |  FROM ev GROUP BY 1, 2),
             |m AS (SELECT v, p,
             |    CAST(round(CAST(s AS DOUBLE) * CAST(1000 AS DOUBLE)
             |      / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE))) AS BIGINT)
             |      AS mean_milli
             |  FROM cells)
             |SELECT
             |  max(CASE WHEN v = 0 AND NOT p THEN mean_milli END)
             |    AS control_pre_milli,
             |  max(CASE WHEN v = 0 AND p THEN mean_milli END)
             |    AS control_post_milli,
             |  max(CASE WHEN v = 1 AND NOT p THEN mean_milli END)
             |    AS treat_pre_milli,
             |  max(CASE WHEN v = 1 AND p THEN mean_milli END)
             |    AS treat_post_milli,
             |  max(CASE WHEN v = 1 AND p THEN mean_milli END)
             |    - max(CASE WHEN v = 1 AND NOT p THEN mean_milli END)
             |    - (max(CASE WHEN v = 0 AND p THEN mean_milli END)
             |      - max(CASE WHEN v = 0 AND NOT p THEN mean_milli END))
             |    AS did_milli
             |FROM m""".stripMargin)),

    // Markov-1 predictor backtest on a temporal split: argmax next
    // type trained before day 19743, accuracy on later transitions.
    Q("q321_markov_backtest",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.markovBacktest(Tables.events(s, d),
            cutoffDay = 19743L)
          .orderBy($"prev_type")
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS b,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS a
             |  FROM events),
             |pr AS (SELECT a, b, day FROM seq WHERE a IS NOT NULL),
             |mdl AS (
             |  SELECT a, b AS predicted FROM (
             |    SELECT a, b, row_number() OVER (PARTITION BY a
             |      ORDER BY count(*) DESC, b) AS rn
             |    FROM pr WHERE day < 19743 GROUP BY a, b)
             |  WHERE rn = 1),
             |ts2 AS (SELECT a, b FROM pr WHERE day >= 19743)
             |SELECT a AS prev_type, predicted,
             |  CAST(count(*) AS BIGINT) AS n_test,
             |  CAST(sum(CASE WHEN b = predicted THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_correct,
             |  CAST(round(CAST(sum(CASE WHEN b = predicted THEN 1 ELSE 0 END)
             |      AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS acc_milli
             |FROM ts2 JOIN mdl USING (a)
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // Churn training-set construction: cutoff-bounded features, a
    // future-window label the features never see.
    Q("q322_churn_labels",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.churnLabels(Tables.events(s, d),
            cutoffDay = 19740L, horizonDays = 8L)
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
             |    event_type AS et, CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |f AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_purchases,
             |    CAST(count(DISTINCT day) AS BIGINT) AS n_days_active,
             |    CAST(19740 - max(day) AS BIGINT) AS recency_days,
             |    CAST(sum(cents) AS BIGINT) AS spend_cents
             |  FROM ev WHERE day <= 19740 GROUP BY 1),
             |fut AS (SELECT DISTINCT user_id FROM ev
             |        WHERE day > 19740 AND day <= 19748)
             |SELECT f.user_id, n_events, n_purchases, n_days_active,
             |  recency_days, spend_cents,
             |  fut.user_id IS NULL AS churned
             |FROM f LEFT JOIN fut ON fut.user_id = f.user_id
             |ORDER BY f.user_id""".stripMargin)),

    // Incremental MinHash screen: a new batch (id % 17 = 0) against the
    // standing corpus — banded candidates batch→corpus only, exact
    // Jaccard verify; the MinHash twin of the q86 SimHash increment.
    Q("q323_minhash_incremental",
      (s, d) => {
        import s.implicits._
        graft.ext.Dedup.minHashPairsAgainst(Tables.documents(s, d),
            $"doc_id" % 17 === 0, "doc_id", "text",
            n = 2, threshold = 0.2, bands = 21, rowsPerBand = 3)
          .select($"batch_id", $"corpus_id",
            graft.core.Exact.r4($"jaccard").as("jaccard"))
          .orderBy($"batch_id", $"corpus_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, doc_id % 17 = 0 AS is_batch,
             |    string_split_regex(trim(text), '\s+') AS l FROM documents),
             |shg AS (
             |  SELECT doc_id, is_batch,
             |    list_distinct(list_filter(
             |      list_transform(l, (x, i) ->
             |        CASE WHEN i <= len(l) - 1 THEN x || ' ' || l[i+1] END),
             |      v -> v IS NOT NULL)) AS sh
             |  FROM toks),
             |base AS (
             |  SELECT doc_id, is_batch, sh,
             |    list_transform(sh, s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(s)),
             |        i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM shg),
             |sig AS (
             |  SELECT doc_id, is_batch, sh,
             |    list_transform(generate_series(1, 63), j ->
             |      coalesce(list_min(list_transform(hs, h ->
             |        (h * ((1103515245 * j) % 2038074743)
             |          + ((12345 * j + 7) % 2038074743)) % 2038074743)),
             |      CAST(-1 AS BIGINT))) AS sig
             |  FROM base),
             |bandrows AS (
             |  SELECT doc_id, is_batch, b,
             |    sig[CAST(b*3+1 AS INT) : CAST(b*3+3 AS INT)] AS bucket
             |  FROM sig CROSS JOIN range(0, 21) t(b)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
             |  FROM bandrows a JOIN bandrows b
             |    ON a.b = b.b AND a.bucket = b.bucket
             |  WHERE a.is_batch AND NOT b.is_batch),
             |ver AS (
             |  SELECT batch_id, corpus_id,
             |    len(list_intersect(x.sh, y.sh)) * 1.0
             |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
             |  FROM cand JOIN shg x ON x.doc_id = batch_id
             |  JOIN shg y ON y.doc_id = corpus_id)
             |SELECT batch_id, corpus_id, round(jac, 4) + 0.0 AS jaccard
             |FROM ver WHERE jac >= 0.2 ORDER BY 1, 2""".stripMargin)),

    // Sliced Wasserstein between even/odd label groups: 8 hash-sign
    // directions, exact discrete W1 per slice — high-dimensional
    // distribution shift, one number per direction.
    Q("q324_sliced_wasserstein",
      (s, d) => {
        import s.implicits._
        graft.ops.Drift.slicedWasserstein(Tables.embeddings(s, d),
            "vec_id", "embedding", $"label" % 2 === 0, nProj = 8)
          .orderBy($"proj")
      },
      Some("""WITH m AS (
             |  SELECT vec_id AS id, label % 2 = 0 AS ga,
             |    unnest(list_transform(embedding,
             |      (x, i) -> {'d': CAST(i - 1 AS BIGINT),
             |        'xm': CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM embeddings),
             |dirs AS (SELECT CAST(p AS BIGINT) AS p, CAST(d AS BIGINT) AS d,
             |    CASE WHEN ((p + 1) * 2654435761 + (d + 1) * (p + 7) * 40503)
             |        % 1000003 % 2 = 0 THEN 1 ELSE -1 END AS sgn
             |  FROM range(0, 8) pp(p), range(0, 512) dd(d)),
             |proj AS (SELECT id, ga, p, CAST(sum(sgn * xm) AS BIGINT) AS x
             |  FROM m JOIN dirs USING (d) GROUP BY 1, 2, 3),
             |cnts AS (SELECT p, ga, x, CAST(count(*) AS BIGINT) AS n
             |  FROM proj GROUP BY 1, 2, 3),
             |grid AS (SELECT p, x,
             |    coalesce(lead(x) OVER (PARTITION BY p ORDER BY x) - x, 0)
             |      AS gap
             |  FROM (SELECT DISTINCT p, x FROM proj)),
             |grps AS (SELECT p, ga, CAST(count(*) AS BIGINT) AS n_tot
             |  FROM proj GROUP BY 1, 2),
             |cdf AS (
             |  SELECT g.p, g.ga, gr.x, gr.gap, g.n_tot,
             |    CAST(sum(coalesce(c.n, 0)) OVER (PARTITION BY g.p, g.ga
             |      ORDER BY gr.x) AS BIGINT) AS cum
             |  FROM grps g JOIN grid gr ON gr.p = g.p
             |  LEFT JOIN cnts c ON c.p = g.p AND c.ga = g.ga AND c.x = gr.x),
             |aa AS (SELECT p, x, gap, n_tot AS n_a, cum AS cum_a
             |       FROM cdf WHERE ga),
             |bb AS (SELECT p, x, n_tot AS n_b, cum AS cum_b
             |       FROM cdf WHERE NOT ga)
             |SELECT aa.p AS proj, n_a, n_b,
             |  CAST(round(CAST(sum(abs(cum_a * n_b - cum_b * n_a) * gap)
             |      AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(n_a * n_b AS DOUBLE) / CAST(1000000 AS DOUBLE))
             |    AS BIGINT) AS w1_milli
             |FROM aa JOIN bb ON bb.p = aa.p AND bb.x = aa.x
             |GROUP BY 1, 2, 3 ORDER BY proj""".stripMargin)),

    // Count-based word vectors: ±2 co-occurrence → PPMI → 16-dim
    // hash-sign projection → exact-cosine neighbors of the five most
    // frequent words — the distributional baseline in one dataflow.
    Q("q325_ppmi_word_vectors",
      (s, d) => {
        import s.implicits._
        graft.ext.LangModel.ppmiWordNeighbors(Tables.documents(s, d),
            "text", dim = 16, window = 2, probes = 5, topK = 5)
          .orderBy($"probe", $"rnk")
      },
      Some("""WITH toks AS (
             |  SELECT string_split_regex(trim(text), '\s+') AS l FROM documents),
             |p1 AS (SELECT (u).w AS w, (u).c AS c FROM (
             |  SELECT unnest(list_transform(l[1:len(l)-1],
             |    (x, i) -> {'w': x, 'c': l[i+1]})) AS u FROM toks)),
             |p2 AS (SELECT (u).w AS w, (u).c AS c FROM (
             |  SELECT unnest(list_transform(l[1:len(l)-2],
             |    (x, i) -> {'w': x, 'c': l[i+2]})) AS u FROM toks)),
             |dirp AS (SELECT w, c FROM p1 UNION ALL SELECT w, c FROM p2),
             |pairs AS (SELECT w, c FROM dirp
             |          UNION ALL SELECT c AS w, w AS c FROM dirp),
             |nwc AS (SELECT w, c, CAST(count(*) AS BIGINT) AS n_wc
             |        FROM pairs GROUP BY 1, 2),
             |nw AS (SELECT w, CAST(sum(n_wc) AS BIGINT) AS n_w
             |       FROM nwc GROUP BY 1),
             |tt AS (SELECT CAST(sum(n_w) AS BIGINT) AS nn FROM nw),
             |ppmi AS (
             |  SELECT * FROM (
             |    SELECT nwc.w, nwc.c,
             |      greatest(CAST(0 AS BIGINT),
             |        CAST(round(ln(CAST(n_wc AS DOUBLE) * CAST(nn AS DOUBLE)
             |          / (CAST(a.n_w AS DOUBLE) * CAST(b.n_w AS DOUBLE)))
             |          * CAST(1000 AS DOUBLE)) AS BIGINT)) AS pm
             |    FROM nwc JOIN nw a ON a.w = nwc.w JOIN nw b ON b.w = nwc.c
             |    CROSS JOIN tt)
             |  WHERE pm > 0),
             |hashed AS (
             |  SELECT w, pm,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(c)),
             |        i -> CAST(ascii(substring(c, i, 1)) AS BIGINT))),
             |      (a, b) -> (a * 31 + b) % 1000000007) AS hc
             |  FROM ppmi),
             |comps AS (
             |  SELECT w, CAST(k AS BIGINT) AS k,
             |    CAST(sum(CASE WHEN (hc * (k + 3) + (k + 11) * 12345)
             |        % 1000003 % 2 = 0 THEN pm ELSE -pm END) AS BIGINT) AS v
             |  FROM hashed CROSS JOIN range(0, 16) kk(k) GROUP BY 1, 2),
             |pw AS (SELECT w AS probe FROM nw
             |       ORDER BY n_w DESC, w LIMIT 5),
             |pv AS (SELECT probe, k, v AS pvv FROM comps
             |       JOIN pw ON pw.probe = comps.w),
             |dots AS (
             |  SELECT pv.probe, c2.w AS neighbor,
             |    CAST(sum(pv.pvv * c2.v) AS BIGINT) AS dot
             |  FROM pv JOIN comps c2 USING (k) GROUP BY 1, 2),
             |nrm AS (SELECT w, CAST(sum(v * v) AS BIGINT) AS nsq
             |        FROM comps GROUP BY 1),
             |cosd AS (
             |  SELECT d2.probe, d2.neighbor,
             |    CAST(round(CAST(dot AS DOUBLE)
             |      / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS cos_micro
             |  FROM dots d2 JOIN nrm na ON na.w = d2.probe
             |  JOIN nrm nb ON nb.w = d2.neighbor
             |  WHERE d2.probe != d2.neighbor)
             |SELECT probe,
             |  CAST(row_number() OVER (PARTITION BY probe
             |    ORDER BY cos_micro DESC, neighbor) AS BIGINT) AS rnk,
             |  neighbor, cos_micro
             |FROM cosd QUALIFY rnk <= 5 ORDER BY probe, rnk""".stripMargin)),

    // Best single change-point per supplier: the split maximizing the
    // between-segment sum of squares over the q198 quantity series —
    // the location answer to CUSUM's drift alarm.
    Q("q326_changepoint",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select(
          $"l_suppkey".as("sk"),
          $"l_shipdate".cast("timestamp_ltz").cast("long").as("sec"),
          $"l_orderkey".as("ok"), $"l_linenumber".cast("long").as("ln"),
          $"l_quantity".cast("long").as("q"))
        graft.ops.TimeSeries.bestSplit(li, "sk",
            Seq("sec", "ok", "ln", "q"), "q")
          .select($"key".as("suppkey"), $"n", $"split_pos",
            $"mean_pre_milli", $"mean_post_milli")
          .orderBy($"suppkey")
      },
      Some("""WITH li AS (
             |  SELECT l_suppkey AS sk,
             |    epoch_us(l_shipdate) // 1000000 AS sec,
             |    l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln,
             |    CAST(l_quantity AS BIGINT) AS q
             |  FROM lineitem),
             |pre AS (SELECT sk,
             |    CAST(row_number() OVER (PARTITION BY sk
             |      ORDER BY sec, ok, ln, q) AS BIGINT) AS k,
             |    CAST(sum(q) OVER (PARTITION BY sk ORDER BY sec, ok, ln, q
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sk_sum,
             |    CAST(count(*) OVER (PARTITION BY sk) AS BIGINT) AS n,
             |    CAST(sum(q) OVER (PARTITION BY sk) AS BIGINT) AS sn
             |  FROM li),
             |sc AS (SELECT sk, k, sk_sum, n, sn,
             |    CAST(n * sk_sum - k * sn AS DOUBLE)
             |      * CAST(n * sk_sum - k * sn AS DOUBLE)
             |      / CAST(k * (n - k) AS DOUBLE) AS score
             |  FROM pre WHERE k < n),
             |best AS (SELECT sk, k, sk_sum, n, sn,
             |    row_number() OVER (PARTITION BY sk
             |      ORDER BY score DESC, k) AS rn
             |  FROM sc)
             |SELECT sk AS suppkey, n, k AS split_pos,
             |  CAST(round(CAST(sk_sum AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(k AS DOUBLE)) AS BIGINT) AS mean_pre_milli,
             |  CAST(round(CAST(sn - sk_sum AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(n - k AS DOUBLE)) AS BIGINT) AS mean_post_milli
             |FROM best WHERE rn = 1 ORDER BY suppkey""".stripMargin)),

    // RFM quartile segmentation of the user base: codes from the
    // two-phase global rank, money as exact cents.
    Q("q327_rfm_segments",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.rfmSegments(Tables.events(s, d), refDay = 19753L)
          .orderBy($"segment")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |per AS (SELECT user_id,
             |    CAST(19753 - max(day) AS BIGINT) AS recency,
             |    CAST(count(*) AS BIGINT) AS freq,
             |    CAST(sum(cents) AS BIGINT) AS monetary
             |  FROM ev GROUP BY 1),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
             |rb AS (SELECT user_id, 4 - ((rn - 1) * 4) // n AS r_code FROM (
             |  SELECT user_id, CAST(row_number() OVER (ORDER BY recency, user_id)
             |    AS BIGINT) AS rn FROM per) CROSS JOIN nn),
             |fb AS (SELECT user_id, ((rn - 1) * 4) // n + 1 AS f_code FROM (
             |  SELECT user_id, CAST(row_number() OVER (ORDER BY freq, user_id)
             |    AS BIGINT) AS rn FROM per) CROSS JOIN nn),
             |mb AS (SELECT user_id, ((rn - 1) * 4) // n + 1 AS m_code FROM (
             |  SELECT user_id, CAST(row_number() OVER (ORDER BY monetary, user_id)
             |    AS BIGINT) AS rn FROM per) CROSS JOIN nn)
             |SELECT CAST(r_code * 100 + f_code * 10 + m_code AS BIGINT)
             |    AS segment,
             |  CAST(r_code AS BIGINT) AS r_code, CAST(f_code AS BIGINT) AS f_code,
             |  CAST(m_code AS BIGINT) AS m_code,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(round(CAST(sum(monetary) AS DOUBLE) * CAST(10 AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_monetary_milli
             |FROM per JOIN rb USING (user_id) JOIN fb USING (user_id)
             |JOIN mb USING (user_id)
             |GROUP BY 1, 2, 3, 4 ORDER BY segment""".stripMargin)),

    // Hashing-trick text classifier trained IN the engine: 8 hashed
    // token-share features (poly-hash mod 8, micro-normalized by doc
    // length) through the q299 fixed-point GD — text to model with no
    // vocabulary table at all.
    Q("q328_hashed_logreg",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.ensureRegistered(s)
        val tok = Tables.documents(s, d).select($"doc_id", $"lang",
          explode(graft.ext.TextAnalysis.tokens($"text")).as("tok"))
        val hashed = tok.withColumn("h",
          pmod(graft.functions.PolyHash.polyHash($"tok"), lit(8)))
        val cAggs = (0 until 8).map(j =>
          sum(when($"h" === j, 1L).otherwise(0L)).as(s"c$j"))
        val feats = hashed.groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("ntok"), cAggs: _*)
        val withX = feats.select(($"doc_id" +: $"lang".as("lang") +:
          (0 until 8).map(j =>
            round(col(s"c$j").cast("double") * 1000000.0
              / col("ntok").cast("double"), 0).cast("long").as(s"x$j"))): _*)
        graft.ext.LinearModel.logisticGd(withX,
            (0 until 8).map(j => col(s"x$j")), $"lang" === "en", epochs = 3)
          .orderBy($"epoch")
      },
      Some(logregKOracleSql(
        """WITH tok AS (
          |  SELECT doc_id, lang,
          |    unnest(string_split_regex(trim(text), '\s+')) AS tok
          |  FROM documents),
          |hashed AS (
          |  SELECT doc_id, lang,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(generate_series(1, length(tok)),
          |        i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
          |      (a, b) -> (a * 31 + b) % 1000000007) % 8 AS h
          |  FROM tok),
          |cnts AS (
          |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS ntok,
          |""".stripMargin +
          (0 until 8).map(j =>
            s"    CAST(sum(CASE WHEN h = $j THEN 1 ELSE 0 END) AS BIGINT) AS c$j")
            .mkString(",\n") +
          "\n  FROM hashed GROUP BY 1, 2),\nf AS (\n  SELECT\n" +
          (0 until 8).map(j =>
            s"    CAST(round(CAST(c$j AS DOUBLE) * CAST(1000000 AS DOUBLE)" +
              s" / CAST(ntok AS DOUBLE)) AS BIGINT) AS x$j").mkString(",\n") +
          ",\n    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END AS y\n  FROM cnts)",
        k = 8, epochs = 3))),

    // WoE / information value of pre-cutoff spend against the churn
    // label: quantile bins via two-phase rank, Laplace-smoothed
    // evidence weights — does the feature separate the label at all.
    Q("q329_woe_iv",
      (s, d) => {
        import s.implicits._
        val labeled = graft.ops.Behavior.churnLabels(Tables.events(s, d),
          cutoffDay = 19740L, horizonDays = 8L)
        graft.ops.Causal.woeIvTable(labeled, "user_id", $"spend_cents",
            $"churned", bins = 4)
          .orderBy($"bucket")
      },
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 AS day,
             |    event_type AS et, CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |f AS (SELECT user_id,
             |    CAST(sum(cents) AS BIGINT) AS s
             |  FROM ev WHERE day <= 19740 GROUP BY 1),
             |fut AS (SELECT DISTINCT user_id FROM ev
             |        WHERE day > 19740 AND day <= 19748),
             |lb AS (SELECT f.user_id AS id, f.s,
             |    fut.user_id IS NULL AS bad
             |  FROM f LEFT JOIN fut ON fut.user_id = f.user_id),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lb),
             |bk AS (SELECT id, ((rn - 1) * 4) // n AS bucket FROM (
             |  SELECT id, CAST(row_number() OVER (ORDER BY s, id) AS BIGINT)
             |    AS rn FROM lb) CROSS JOIN nn),
             |cells AS (
             |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
             |  FROM bk JOIN lb USING (id) GROUP BY 1),
             |tot AS (SELECT CAST(sum(n - n_bad) AS BIGINT) AS gg,
             |    CAST(sum(n_bad) AS BIGINT) AS bb,
             |    CAST(count(*) AS BIGINT) AS k FROM cells)
             |SELECT CAST(bucket AS BIGINT) AS bucket, n, n_bad,
             |  CAST(round(ln((CAST(n - n_bad + 1 AS DOUBLE)
             |      / CAST(gg + k AS DOUBLE))
             |    / (CAST(n_bad + 1 AS DOUBLE) / CAST(bb + k AS DOUBLE)))
             |    * CAST(1000 AS DOUBLE)) AS BIGINT) AS woe_milli,
             |  CAST(round((CAST(n - n_bad + 1 AS DOUBLE) / CAST(gg + k AS DOUBLE)
             |      - CAST(n_bad + 1 AS DOUBLE) / CAST(bb + k AS DOUBLE))
             |    * ln((CAST(n - n_bad + 1 AS DOUBLE) / CAST(gg + k AS DOUBLE))
             |      / (CAST(n_bad + 1 AS DOUBLE) / CAST(bb + k AS DOUBLE)))
             |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS iv_term_micro
             |FROM cells CROSS JOIN tot ORDER BY bucket""".stripMargin)),

    // Blocking-quality audit: the first-2-token key's reduction ratio
    // and pairs completeness against the engine's own SimHash near-dup
    // truth — two operators composed into one ER design answer.
    Q("q330_blocking_quality",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val recs = docs.select($"doc_id".as("id"),
          concat_ws(" ",
            slice(graft.ext.TextAnalysis.tokens($"text"), 1, 2)).as("key"))
        val truth = graft.ext.Dedup.simHashPairsBanded(docs, "doc_id", "text",
          maxDist = 6).select($"id_a", $"id_b")
        graft.ops.FuzzyLink.blockingQuality(recs, truth)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |recs AS (SELECT doc_id AS id,
             |    array_to_string(l[1:2], ' ') AS key FROM toks),
             |th AS (
             |  SELECT doc_id,
             |    list_transform(l, s ->
             |      list_reduce(list_prepend(CAST(0 AS BIGINT),
             |        list_transform(generate_series(1, length(s)),
             |          i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
             |      (a, b) -> (a*31 + b) % 1000000007)) AS hs
             |  FROM toks),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
             |      CASE WHEN ((h * ((1103515245 * j) % 2038074743)
             |          + ((12345 * j + 7) % 2038074743)) % 2038074743) % 2 = 1
             |           THEN 1 ELSE -1 END)), 0) > 0
             |         THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END
             |      AS bit
             |  FROM th CROSS JOIN range(1, 64) t(j)),
             |sh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh
             |       FROM bits GROUP BY 1),
             |truth AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.sh, b.sh)) <= 6),
             |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM recs),
             |cnd AS (SELECT CAST(sum(nk * (nk - 1) // 2) AS BIGINT)
             |    AS n_cand_pairs
             |  FROM (SELECT key, CAST(count(*) AS BIGINT) AS nk
             |        FROM recs GROUP BY 1)),
             |ts AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
             |    CAST(sum(CASE WHEN ra.key = rb.key THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_true_blocked
             |  FROM truth JOIN recs ra ON ra.id = truth.id_a
             |  JOIN recs rb ON rb.id = truth.id_b)
             |SELECT n_records, n_cand_pairs, n_true_pairs, n_true_blocked,
             |  CAST(round((CAST(1.0 AS DOUBLE)
             |    - CAST(n_cand_pairs AS DOUBLE)
             |      / (CAST(n_records * (n_records - 1) AS DOUBLE)
             |        / CAST(2 AS DOUBLE)))
             |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS rr_micro,
             |  CASE WHEN n_true_pairs > 0 THEN
             |    CAST(round(CAST(n_true_blocked AS DOUBLE) * CAST(1000 AS DOUBLE)
             |      / CAST(n_true_pairs AS DOUBLE)) AS BIGINT)
             |  ELSE NULL END AS pc_milli
             |FROM nr CROSS JOIN cnd CROSS JOIN ts""".stripMargin)),

    // Local clustering coefficient per part over the q128 copurchase
    // graph: how tightly each node's neighborhood closes.
    Q("q331_clustering_coefficient",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        val und = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"id_a", $"id_b")
        graft.ext.LinkGraph.clusteringCoefficient(und)
          .orderBy($"node_id")
      },
      Some("""WITH und AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |deg AS (
             |  SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
             |    SELECT pa AS id FROM und UNION ALL SELECT pb FROM und)
             |  GROUP BY 1),
             |o AS (
             |  SELECT CASE WHEN da.degree <= db.degree THEN und.pa ELSE und.pb
             |      END AS src,
             |    CASE WHEN da.degree <= db.degree THEN und.pb ELSE und.pa
             |      END AS dst
             |  FROM und JOIN deg da ON da.id = und.pa
             |  JOIN deg db ON db.id = und.pb),
             |tri AS (
             |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
             |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
             |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
             |tc AS (SELECT id AS node_id, CAST(count(*) AS BIGINT)
             |    AS n_triangles
             |  FROM (SELECT u AS id FROM tri UNION ALL SELECT v FROM tri
             |        UNION ALL SELECT w FROM tri)
             |  GROUP BY 1)
             |SELECT deg.id AS node_id, degree,
             |  coalesce(tc.n_triangles, 0) AS n_triangles,
             |  CASE WHEN degree >= 2 THEN
             |    CAST(round(CAST(coalesce(tc.n_triangles, 0) AS DOUBLE)
             |      * CAST(2000000 AS DOUBLE)
             |      / CAST(degree * (degree - 1) AS DOUBLE)) AS BIGINT)
             |  ELSE NULL END AS coeff_micro
             |FROM deg LEFT JOIN tc ON tc.node_id = deg.id
             |ORDER BY node_id""".stripMargin)),

    // ECE / MCE headline calibration numbers over the q161 forecast.
    Q("q332_calibration_error",
      (s, d) => {
        import s.implicits._
        val scored = Tables.embeddings(s, d).select(
          least(greatest(
            round((col("embedding").getItem(0) + 1.0) / 2.0 * 1000000.0, 0)
              .cast("long"), lit(0L)), lit(1000000L)).as("p_micro"),
          ($"label" % 2).cast("long").as("y"))
        graft.ext.Calibrate.calibrationError(scored, "p_micro", "y", bins = 10)
      },
      Some("""WITH s AS (
             |  SELECT least(greatest(
             |      CAST(round((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0) AS BIGINT),
             |      0), 1000000) AS p,
             |    CAST(label % 2 AS BIGINT) AS y
             |  FROM embeddings),
             |b AS (SELECT least(p * 10 // 1000000, 9) AS bin,
             |    CAST(count(*) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS sp,
             |    CAST(sum(y) AS BIGINT) AS sy
             |  FROM s GROUP BY 1),
             |g AS (SELECT n,
             |    abs(CAST(round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
             |        AS BIGINT)
             |      - CAST(round(CAST(sy AS DOUBLE) * 1000000.0
             |        / CAST(n AS DOUBLE)) AS BIGINT)) AS gap
             |  FROM b)
             |SELECT CAST(sum(n) AS BIGINT) AS n,
             |  CAST(round(CAST(sum(n * gap) AS DOUBLE)
             |    / CAST(sum(n) AS DOUBLE)) AS BIGINT) AS ece_micro,
             |  CAST(max(gap) AS BIGINT) AS mce_micro
             |FROM g""".stripMargin)),

    // Nelson–Aalen cumulative hazard on the q201 cohort: hazard-scale
    // companion to the Kaplan–Meier survival steps.
    Q("q333_nelson_aalen",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(
          $"o_orderpriority".as("grp"),
          ($"o_orderkey" % 60).as("dur"),
          when($"o_orderkey" % 7 =!= 0, 1L).otherwise(0L).as("ev"))
        graft.ops.Survival.nelsonAalen(o, "grp", "dur", "ev")
          .orderBy($"grp", $"t")
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(o_orderkey % 60 AS BIGINT) AS t,
             |    CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END AS ev
             |  FROM orders),
             |cells AS (SELECT grp, t, CAST(count(*) AS BIGINT) AS c,
             |    CAST(sum(ev) AS BIGINT) AS d
             |  FROM base GROUP BY 1, 2),
             |r AS (SELECT grp, t, d,
             |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY t
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |      AS BIGINT) AS n_risk
             |  FROM cells),
             |h AS (SELECT grp, t, n_risk, d,
             |    CAST(round(CAST(d AS DOUBLE) * 1000000.0
             |      / CAST(n_risk AS DOUBLE)) AS BIGINT) AS h_micro
             |  FROM r),
             |ch AS (SELECT grp, t, n_risk, d, h_micro,
             |    CAST(sum(h_micro) OVER (PARTITION BY grp ORDER BY t
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_micro
             |  FROM h)
             |SELECT grp, t, n_risk, d, h_micro, cumhaz_micro
             |FROM ch WHERE d > 0 ORDER BY grp, t""".stripMargin)),

    // MATTR lexical diversity per source: moving-average type-token
    // ratio over 20-token windows at stride 10 — the length-robust
    // companion to raw TTR / Heaps (q281).
    Q("q334_mattr",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d).select($"source",
            graft.ext.TextAnalysis.tokens($"text").as("l"))
          .filter(size($"l") >= 20)
        val wins = base.select($"source",
          explode(sequence(lit(1), size($"l") - 19, lit(10))).as("p"), $"l")
        wins
          .select($"source",
            (size(array_distinct(slice($"l", $"p", lit(20)))).cast("long")
              * 50000L).as("ttr_micro"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_windows"),
            round(sum($"ttr_micro").cast("double")
              / count(lit(1)).cast("double"), 0).cast("long")
              .as("mattr_micro"))
          .orderBy($"source")
      },
      Some("""WITH base AS (
             |  SELECT source, string_split_regex(trim(text), '\s+') AS l
             |  FROM documents),
             |b2 AS (SELECT source, l FROM base WHERE len(l) >= 20),
             |wins AS (SELECT source, l,
             |    unnest(generate_series(1, len(l) - 19, 10)) AS p FROM b2),
             |t AS (SELECT source,
             |    CAST(len(list_distinct(l[p:p+19])) AS BIGINT) * 50000
             |      AS ttr_micro
             |  FROM wins)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_windows,
             |  CAST(round(CAST(sum(ttr_micro) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mattr_micro
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Linear CKA between the first and last 32 embedding dimensions:
    // exact integer centered gram blocks, giga-floored before the
    // Frobenius squares.
    Q("q335_cka_halves",
      (s, d) => {
        import s.implicits._
        graft.ext.Pca.linearCka(Tables.embeddings(s, d), "vec_id",
          "embedding", splitDim = 32)
      },
      Some("""WITH m AS (
             |  SELECT vec_id AS id,
             |    unnest(list_transform(embedding,
             |      (x, i) -> {'d': CAST(i - 1 AS BIGINT),
             |        'xm': CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)}),
             |      recursive := true)
             |  FROM embeddings),
             |nn AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n FROM m),
             |sums AS (SELECT d, CAST(sum(xm) AS BIGINT) AS sd FROM m GROUP BY 1),
             |gram AS (
             |  SELECT a.d AS da, b.d AS db, CAST(sum(a.xm * b.xm) AS BIGINT)
             |    AS sxy
             |  FROM m a JOIN m b ON a.id = b.id GROUP BY 1, 2),
             |blocks AS (
             |  SELECT da, db,
             |    CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |        - CAST(sa.sd AS DOUBLE) * CAST(sb.sd AS DOUBLE))
             |      / CAST(1000000000 AS DOUBLE)) AS BIGINT) AS mg,
             |    CASE WHEN da < 32 AND db < 32 THEN 'xx'
             |      WHEN da >= 32 AND db >= 32 THEN 'yy'
             |      WHEN da < 32 AND db >= 32 THEN 'xy' ELSE 'yx' END AS blk
             |  FROM gram JOIN sums sa ON sa.d = gram.da
             |  JOIN sums sb ON sb.d = gram.db CROSS JOIN nn),
             |fro AS (SELECT blk, CAST(sum(mg * mg) AS BIGINT) AS f2
             |  FROM blocks WHERE blk != 'yx' GROUP BY 1)
             |SELECT n, CAST(32 AS BIGINT) AS split_dim,
             |  CAST(round(
             |    (SELECT CAST(f2 AS DOUBLE) FROM fro WHERE blk = 'xy')
             |    / (sqrt((SELECT CAST(f2 AS DOUBLE) FROM fro WHERE blk = 'xx'))
             |      * sqrt((SELECT CAST(f2 AS DOUBLE) FROM fro WHERE blk = 'yy')))
             |    * CAST(1000 AS DOUBLE)) AS BIGINT) AS cka_milli
             |FROM nn""".stripMargin)),

    // Covariate-shift evaluation: raw panel accuracy vs the
    // importance-weighted accuracy under a uniform target source mix.
    Q("q336_importance_weighted_acc",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        graft.ops.Eval.importanceWeightedAccuracy(docs, "source",
          ($"n_chars" >= 250) === ($"lang" === "en"))
      },
      Some("""WITH per AS (
             |  SELECT source AS g, CAST(count(*) AS BIGINT) AS n_g,
             |    CAST(sum(CASE WHEN (n_chars >= 250) = (lang = 'en')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c_g
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
             |        CAST(count(*) AS BIGINT) AS k FROM per),
             |wt AS (SELECT n_g, c_g, nn, k,
             |    CAST(nn AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(n_g AS DOUBLE))
             |      AS w
             |  FROM per CROSS JOIN tot)
             |SELECT nn AS n, k AS n_groups,
             |  CAST(round(CAST(sum(c_g) AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(nn AS DOUBLE)) AS BIGINT) AS acc_raw_milli,
             |  CAST(round(CAST(sum(CAST(round(w * CAST(c_g AS DOUBLE)
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
             |    * CAST(1000 AS DOUBLE)
             |    / CAST(sum(CAST(round(w * CAST(n_g AS DOUBLE)
             |      * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE))
             |    AS BIGINT) AS acc_weighted_milli
             |FROM wt GROUP BY nn, k""".stripMargin)),

    // Harmonic centrality of the q178 seed panel over the bipartite
    // customer-supplier graph: per-seed labeled BFS, integer-floor
    // reciprocal distances.
    Q("q337_harmonic_centrality",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("p")).distinct()
        val edges = pairs.select($"c".as("src"), ($"p" + 1000000L).as("dst"))
          .union(pairs.select(($"p" + 1000000L).as("src"), $"c".as("dst")))
        val seeds = Tables.customer(s, d).filter($"c_custkey" < 10)
          .select($"c_custkey".as("id"))
        graft.ext.LinkGraph.harmonicCentrality(edges, seeds, maxHops = 3)
          .orderBy($"seed")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |edges AS (
             |  SELECT c AS src, p + 1000000 AS dst FROM pairs
             |  UNION ALL SELECT p + 1000000, c FROM pairs),
             |d0 AS (SELECT c_custkey AS seed, c_custkey AS id,
             |       CAST(0 AS BIGINT) AS dist
             |       FROM customer WHERE c_custkey < 10),
             |d1 AS (SELECT seed, id, min(dist) AS dist FROM (
             |         SELECT seed, id, dist FROM d0
             |         UNION ALL
             |         SELECT d0.seed, e.dst, d0.dist + 1 FROM d0
             |         JOIN edges e ON e.src = d0.id) GROUP BY 1, 2),
             |d2 AS (SELECT seed, id, min(dist) AS dist FROM (
             |         SELECT seed, id, dist FROM d1
             |         UNION ALL
             |         SELECT d1.seed, e.dst, d1.dist + 1 FROM d1
             |         JOIN edges e ON e.src = d1.id) GROUP BY 1, 2),
             |d3 AS (SELECT seed, id, min(dist) AS dist FROM (
             |         SELECT seed, id, dist FROM d2
             |         UNION ALL
             |         SELECT d2.seed, e.dst, d2.dist + 1 FROM d2
             |         JOIN edges e ON e.src = d2.id) GROUP BY 1, 2)
             |SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
             |  CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_micro
             |FROM d3 WHERE dist > 0 GROUP BY 1 ORDER BY seed""".stripMargin)),

    // Burstiness of the ten most frequent words: variance-to-mean
    // ratio of inter-occurrence gaps over the (doc, position) order —
    // uniform filler words sit near 1, clumped topical words above it.
    Q("q338_token_burstiness",
      (s, d) => {
        import s.implicits._
        val occ = Tables.documents(s, d)
          .select($"doc_id", posexplode(
            graft.ext.TextAnalysis.tokens($"text")).as(Seq("pos", "tok")))
          // scalar corpus position: docs are ≤ 512 tokens by generation
          .select($"tok", ($"doc_id" * 1024 + $"pos").as("gp"))
        // 10-row panel, materialized once: referenced by both the gap
        // input and the closing join
        val top = graft.ext.Exec.checkpointEager(
          occ.groupBy($"tok").agg(count(lit(1)).as("n_occ"))
            .orderBy($"n_occ".desc, $"tok".asc).limit(10))
        // two-phase gap moments: the hottest token's occurrence stream
        // never funnels through one task's sort (ops/Ranks)
        graft.ops.Ranks
          .twoPhaseGapMoments(occ.join(broadcast(top), "tok"), "tok", $"gp")
          .withColumnRenamed("sum_gap", "sg")
          .withColumnRenamed("sum_gap_sq", "sgg")
          .join(broadcast(top), "tok")
          .select($"tok", $"n_occ",
            round($"sg".cast("double") * 1000.0 / $"n_gaps".cast("double"), 0)
              .cast("long").as("mean_gap_milli"),
            round(($"sgg".cast("double") / $"n_gaps".cast("double")
              - ($"sg".cast("double") / $"n_gaps".cast("double"))
                * ($"sg".cast("double") / $"n_gaps".cast("double")))
              / ($"sg".cast("double") / $"n_gaps".cast("double"))
              * 1000.0, 0).cast("long").as("vmr_milli"))
          .orderBy($"tok")
      },
      Some("""WITH occ AS (
             |  SELECT (u).tok AS tok, (u).gp AS gp FROM (
             |    SELECT unnest(list_transform(
             |      string_split_regex(trim(text), '\s+'),
             |      (x, i) -> {'tok': x,
             |        'gp': CAST(doc_id * 1024 + i - 1 AS BIGINT)})) AS u
             |    FROM documents)),
             |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_occ
             |  FROM occ GROUP BY 1 ORDER BY n_occ DESC, tok LIMIT 10),
             |g AS (SELECT occ.tok, n_occ,
             |    gp - lag(gp) OVER (PARTITION BY occ.tok ORDER BY gp) AS g
             |  FROM occ JOIN top ON top.tok = occ.tok),
             |ag AS (SELECT tok, n_occ, CAST(count(*) AS BIGINT) AS n_gaps,
             |    CAST(sum(g) AS BIGINT) AS sg, CAST(sum(g * g) AS BIGINT) AS sgg
             |  FROM g WHERE g IS NOT NULL GROUP BY 1, 2)
             |SELECT tok, n_occ,
             |  CAST(round(CAST(sg AS DOUBLE) * CAST(1000 AS DOUBLE)
             |    / CAST(n_gaps AS DOUBLE)) AS BIGINT) AS mean_gap_milli,
             |  CAST(round((CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
             |    - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             |      * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
             |    / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             |    * CAST(1000 AS DOUBLE)) AS BIGINT) AS vmr_milli
             |FROM ag ORDER BY tok""".stripMargin)),

    // Hill power-law exponent of the copurchase degree distribution:
    // alpha = 1 + n / Σ ln(d_i/d_min) over the tail d ≥ d_min.
    Q("q339_degree_powerlaw",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        val und = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"id_a", $"id_b")
        val deg = und.select($"id_a".as("id"))
          .unionAll(und.select($"id_b".as("id")))
          .groupBy($"id").agg(count(lit(1)).as("deg"))
        val dMin = 4L
        deg.filter($"deg" >= dMin)
          .select(round(log($"deg".cast("double") / lit(dMin.toDouble))
            * 1000000.0, 0).cast("long").as("t_micro"))
          .agg(count(lit(1)).as("n_tail"), sum($"t_micro").as("t_sum"))
          .select($"n_tail",
            round((lit(1.0) + $"n_tail".cast("double") * 1000000.0
              / $"t_sum".cast("double")) * 1000.0, 0).cast("long")
              .as("alpha_milli"))
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |e AS (
             |  SELECT x.pk AS id_a, y.pk AS id_b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |deg AS (
             |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
             |    SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e)
             |  GROUP BY 1),
             |t AS (SELECT CAST(round(ln(CAST(deg AS DOUBLE)
             |      / CAST(4 AS DOUBLE)) * 1000000.0) AS BIGINT) AS t_micro
             |  FROM deg WHERE deg >= 4),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
             |       CAST(sum(t_micro) AS BIGINT) AS t_sum FROM t)
             |SELECT n_tail,
             |  CAST(round((CAST(1.0 AS DOUBLE)
             |    + CAST(n_tail AS DOUBLE) * CAST(1000000 AS DOUBLE)
             |      / CAST(t_sum AS DOUBLE)) * CAST(1000 AS DOUBLE))
             |    AS BIGINT) AS alpha_milli
             |FROM ag""".stripMargin)),

    // k-truss cohesive-subgraph mining on the copurchase graph:
    // per-round triangle support via the degree-ordered wedge join,
    // edges below support k-2 pruned, three unrolled rounds — the
    // oracle replays every round's orientation/triangle/prune walk.
    Q("q369_ktruss",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        val und = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"id_a", $"id_b")
        graft.ext.LinkGraph.kTruss(und, k = 3L, rounds = 3)
          .orderBy($"id_a", $"id_b")
      },
      Some(kTrussOracleSql(k = 3, rounds = 3)))
  )

  /** Unrolled k-truss oracle: each round recomputes degrees, orients
    * edges low-degree → high-degree (ties keep a → b), enumerates each
    * triangle once through the wedge join, and prunes edges whose
    * triangle support is below k−2 — the exact walk
    * [[graft.ext.LinkGraph.kTruss]] runs.
    */
  private def kTrussOracleSql(k: Int, rounds: Int): String = {
    val base = """e0 AS MATERIALIZED (
                 |  SELECT a.l_partkey AS a, b.l_partkey AS b
                 |  FROM lineitem a JOIN lineitem b
                 |    ON a.l_orderkey = b.l_orderkey
                 |      AND a.l_partkey < b.l_partkey
                 |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin
    val roundCtes = (1 to rounds).map { i =>
      val in = s"e${i - 1}"
      s"""deg$i AS MATERIALIZED (SELECT id, CAST(count(*) AS BIGINT) AS dg FROM (
         |    SELECT a AS id FROM $in UNION ALL SELECT b FROM $in)
         |  GROUP BY 1),
         |o$i AS MATERIALIZED (SELECT
         |    CASE WHEN da.dg <= db.dg THEN e.a ELSE e.b END AS src,
         |    CASE WHEN da.dg <= db.dg THEN e.b ELSE e.a END AS dst
         |  FROM $in e JOIN deg$i da ON da.id = e.a
         |  JOIN deg$i db ON db.id = e.b),
         |tri$i AS MATERIALIZED (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
         |  FROM o$i e1 JOIN o$i e2 ON e1.src = e2.src AND e1.dst <> e2.dst
         |  JOIN o$i e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         |sup$i AS MATERIALIZED (SELECT e.a, e.b, coalesce(h.s, 0) AS support
         |  FROM $in e LEFT JOIN (
         |    SELECT a, b, CAST(count(*) AS BIGINT) AS s FROM (
         |      SELECT least(u, v) AS a, greatest(u, v) AS b FROM tri$i
         |      UNION ALL SELECT least(u, w), greatest(u, w) FROM tri$i
         |      UNION ALL SELECT least(v, w), greatest(v, w) FROM tri$i)
         |    GROUP BY 1, 2) h ON h.a = e.a AND h.b = e.b),
         |e$i AS MATERIALIZED (SELECT a, b FROM sup$i WHERE support >= ${k - 2})""".stripMargin
    }
    (s"WITH $base,\n" + roundCtes.mkString(",\n") +
      s"\nSELECT a AS id_a, b AS id_b, support FROM sup$rounds" +
      s" WHERE support >= ${k - 2} ORDER BY id_a, id_b")
  }
}
