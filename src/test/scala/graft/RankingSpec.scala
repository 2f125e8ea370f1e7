package graft

import org.apache.spark.sql.functions._
import graft.ext.{LangModel, Ranking}
import graft.ops.Eval

/** Wave-28 operator semantics on hand-checkable inputs: nDCG reaches
  * exactly 1000 milli on a perfectly-ordered panel and drops below it
  * when a zero-relevance row ranks first; RBO is total-weight on
  * identical rankings and zero on disjoint ones; hard negatives never
  * leak the anchor's label; silhouette separates well-clustered labels;
  * Fleiss' kappa is exactly 1e6 under perfect agreement; the Zipf fit
  * recovers slope ≈ −1 on a synthetic 1/r corpus. Cross-engine
  * exactness lives in the q261–q266 oracles.
  */
class RankingSpec extends SparkTestBase {
  import spark.implicits._

  private def emb(id: Long, label: Int, v: Seq[Double]) =
    (id, v.map(_.toFloat), label)

  private def embDf(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("ndcgEval: perfect ordering scores exactly 1000 milli") {
    // neighbors sorted by similarity exactly in relevance order
    val df = embDf(
      emb(0L, 5, Seq(1.0, 0.0)),
      emb(1L, 5, Seq(1.0, 0.05)),   // rel 2, sim highest
      emb(2L, 6, Seq(0.8, 0.45)),   // rel 1
      emb(3L, 0, Seq(-1.0, 0.0)))   // rel 0
    val out = Ranking.ndcgEval(df.filter($"vec_id" === 0), df, "label", k = 10)
      .select($"q_id", $"n_rel", $"ndcg_milli").as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 2L, 1000L)))
  }

  test("ndcgEval: zero-relevance row ranked first costs nDCG") {
    val df = embDf(
      emb(0L, 5, Seq(1.0, 0.0)),
      emb(1L, 0, Seq(1.0, 0.01)),   // rel 0 but most similar
      emb(2L, 5, Seq(0.9, 0.4)),    // rel 2 ranked below it
      emb(3L, 6, Seq(0.5, 0.8)))    // rel 1 last
    val Array((dcg, idcg, ndcg)) =
      Ranking.ndcgEval(df.filter($"vec_id" === 0), df, "label", k = 10)
        .select($"dcg_micro", $"idcg_micro", $"ndcg_milli")
        .as[(Long, Long, Long)].collect()
    assert(dcg < idcg && ndcg < 1000L && ndcg > 0L)
  }

  test("rboByDepth: identical rankings accumulate the full weight mass") {
    val a = (1L to 20L).map(i => (i * 10, i)).toDF("id", "rnk")
    val out = Ranking.rboByDepth(a, a, depth = 20)
      .orderBy($"d").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.forall { case (d, ov, agree, _, _) => ov === d && agree === 1000L })
    val totalWeight = out.map(_._4).sum
    assert(out.last._5 === totalWeight) // contrib = weight when agreement=1000
  }

  test("rboByDepth: disjoint rankings stay at zero") {
    val a = (1L to 10L).map(i => (i, i)).toDF("id", "rnk")
    val b = (1L to 10L).map(i => (i + 100L, i)).toDF("id", "rnk")
    val out = Ranking.rboByDepth(a, b, depth = 10)
      .agg(sum($"overlap"), sum($"rbo_cum_nano")).as[(Long, Long)].collect()
    assert(out.head === ((0L, 0L)))
  }

  test("hardNegatives: only other-label rows, similarity-descending") {
    val df = embDf(
      emb(0L, 1, Seq(1.0, 0.0)),
      emb(1L, 1, Seq(1.0, 0.001)),  // same label — must never appear
      emb(2L, 2, Seq(0.95, 0.1)),
      emb(3L, 3, Seq(0.7, 0.5)),
      emb(4L, 2, Seq(-1.0, 0.0)))
    val out = Ranking.hardNegatives(df.filter($"vec_id" === 0), df, "label", k = 3)
      .orderBy($"rank").as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.map(_._4).toSeq === Seq(2L, 3L, 4L)) // by similarity desc
    assert(out.forall(_._5 != 1L))
  }

  test("silhouetteByLabel: well-separated clusters score positive") {
    val rows = (0 until 8).map { i =>
      if (i < 4) emb(i, 0, Seq(1.0, 0.02 * i)) else emb(i, 1, Seq(-1.0, 0.02 * i))
    }
    val out = Ranking.silhouetteByLabel(embDf(rows: _*), "label", "embedding")
      .orderBy($"label").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 2)
    assert(out.forall { case (_, n, mean, _, _) => n === 4L && mean > 800L })
  }

  test("fleissKappa: perfect agreement is exactly 1e6") {
    // 3 raters, every item unanimous, categories vary across items
    val ratings = for {
      item <- 1L to 9L; r <- 1 to 3
    } yield ("g", item, item % 3)
    val Array((items, raters, kappa)) =
      Eval.fleissKappa(ratings.toDF("grp", "item", "cat"), "grp", "item", "cat")
        .select($"n_items", $"n_raters", $"kappa_micro")
        .as[(Long, Long, Long)].collect()
    assert((items, raters, kappa) === ((9L, 3L, 1000000L)))
  }

  test("fleissKappa: textbook mixed panel lands between 0 and 1") {
    // 2 raters, half the items agree, marginals balanced
    val ratings = Seq(
      ("g", 1L, 0L), ("g", 1L, 0L), ("g", 2L, 1L), ("g", 2L, 1L),
      ("g", 3L, 0L), ("g", 3L, 1L), ("g", 4L, 1L), ("g", 4L, 0L))
    val Array(kappa) =
      Eval.fleissKappa(ratings.toDF("grp", "item", "cat"), "grp", "item", "cat")
        .select($"kappa_micro").as[Long].collect()
    assert(kappa > -1000000L && kappa < 1000000L)
  }

  test("zipfOls recovers slope ≈ −1 and high R² on a 1/r corpus") {
    // token t_r appears floor(2000/r) times: ln f = ln 2000 − ln r + ε
    val words = (1 to 60).flatMap(r => Seq.fill(2000 / r)(f"t$r%03d"))
    val docs = Seq(("x", words.mkString(" "))).toDF("grp", "text")
    val Array((n, slope, r2)) = LangModel.zipfOls(docs, "grp", "text", topR = 60)
      .select($"n_ranks", $"slope_micro", $"r2_milli")
      .as[(Long, Long, Long)].collect()
    assert(n === 60L)
    assert(slope > -1050000L && slope < -950000L, s"slope=$slope")
    assert(r2 > 990L, s"r2=$r2")
  }
}
