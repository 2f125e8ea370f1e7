package graft

import org.apache.spark.sql.functions._

/** Round-8 retrieval additions: score-aware fusion (q237), the IVF
  * persist/reload seam (q238), and the near-dup screen quality report
  * (q239).
  */
class RetrievalOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("scoreFuse: min-max normalization, weights, degenerate list") {
    // q1: exact list scores 0.9/0.5/0.1 -> norms 1e6/5e5/0; ann list
    // scores all 0.4 (degenerate) -> norm 1e6 each. weights 2 and 1.
    val exact = Seq((1L, 10L, 0.9), (1L, 11L, 0.5), (1L, 12L, 0.1))
      .toDF("q_id", "n_id", "sim")
    val ann = Seq((1L, 11L, 0.4), (1L, 13L, 0.4))
      .toDF("q_id", "n_id", "sim")
    val got = graft.ext.Similarity.scoreFuse(Seq((exact, 2L), (ann, 1L)), k = 4)
      .orderBy($"fuse_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // n10: 2*1e6 = 2e6; n11: 2*5e5 + 1*1e6 = 2e6 (tie -> lower id
    // first); n13: 1e6; n12: 0
    assert(got === Seq(
      (1L, 1L, 10L, 2000000L),
      (1L, 2L, 11L, 2000000L),
      (1L, 3L, 13L, 1000000L),
      (1L, 4L, 12L, 0L)))
  }

  test("mmrTopK: diversity overrides relevance ties against the pack") {
    // corpus: a=[.9,.436,0] (most relevant), b=[.85,.527,0] (clone of
    // a's direction), c=[.85,-.527,0] (same relevance as b, diverse).
    // Round 1 takes a; round 2 must take c over b — equal relevance,
    // but sim(b,a)≈0.99 vs sim(c,a)≈0.54 — then round 3 takes b.
    val corpus = Seq(
      (1L, Seq(0.9f, 0.436f, 0f)),
      (2L, Seq(0.85f, 0.527f, 0f)),
      (3L, Seq(0.85f, -0.527f, 0f)),
      (99L, Seq(1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 99L)
    val got = graft.ext.Similarity.mmrTopK(q, corpus, k = 3, m = 3, lamNum = 7)
      .orderBy($"sel_order")
      .select($"n_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L, 2L), s"MMR order wrong: $got")
    // sanity: pure relevance (lamNum = 10) keeps the rank order a,b,c
    val rel = graft.ext.Similarity.mmrTopK(q, corpus, k = 3, m = 3, lamNum = 10)
      .orderBy($"sel_order")
      .select($"n_id").as[Long].collect().toSeq
    assert(rel === Seq(1L, 2L, 3L), s"pure-relevance order wrong: $rel")
  }

  test("IVF persist + loadLatest answers exactly like a fresh build") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_spec").toFile.getAbsolutePath
    // stale decoy first; loadLatest must pick the newer full index
    graft.ext.IvfIndex.persistCentroids(spark, emb.filter($"vec_id" < 4),
      dir, "ix", tag = f"${1L}%020d_a", kCentroids = 2)
    graft.ext.IvfIndex.persistCentroids(spark, emb, dir, "ix",
      tag = f"${2L}%020d_b", kCentroids = 8)
    val loaded = graft.ext.IvfIndex.loadLatest(spark, dir, "ix")
    val q = emb.filter($"vec_id" < 3)
    val served = graft.ext.IvfIndex.ivfKnnWith(loaded, q, emb, k = 3, nProbe = 2)
    val fresh = graft.ext.IvfIndex.ivfKnn(spark, q, emb, k = 3,
      kCentroids = 8, nProbe = 2)
    assert(served.except(fresh).isEmpty && fresh.except(served).isEmpty)
    assert(served.count() === fresh.count())
    // and the decoy really is different: k=2 centroids from 4 vectors
    val decoy = graft.io.Versioned.readLatest(spark, dir, "ix")
    assert(decoy.count() === 8L, "latest must be the k=8 index")
  }

  test("screenQualityCurve: monotone counts, constant screen size") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog once more today"),
      (4L, "completely different text about spark query engines at scale"),
      (5L, "unrelated words concerning weighted quantile sketches only here")
    ).toDF("doc_id", "text")
    val rows = graft.ext.Dedup.screenQualityCurve(docs, "doc_id", "text",
        n = 2, tausMicro = Seq(100000L, 500000L, 999999L),
        bands = 21, rowsPerBand = 3)
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 3)
    val nScreen = rows.map(_.getLong(2)).distinct
    assert(nScreen.length === 1, "bands don't depend on tau")
    // tp and n_truth shrink (weakly) as tau rises; tp <= n_truth always
    val truths = rows.map(_.getLong(1)); val tps = rows.map(_.getLong(3))
    assert(truths.zip(truths.tail).forall { case (a, b) => a >= b })
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(1)))
    // the exact-duplicate pair (1,2) has jaccard 1.0 >= every tau and
    // the bands cannot miss an identical signature
    assert(tps.last >= 1L)
  }

  test("screenQualityReport: identities and planted-duplicate recall") {
    // 3 near-identical docs (one shared long sentence) + 2 unrelated:
    // truth pairs exist; screen must catch the identical pair
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog once more today"),
      (4L, "completely different text about spark query engines at scale"),
      (5L, "unrelated words concerning weighted quantile sketches only here")
    ).toDF("doc_id", "text")
    val r = graft.ext.Dedup.screenQualityReport(docs, "doc_id", "text",
        n = 2, threshold = 0.2, bands = 21, rowsPerBand = 3)
      .collect()(0)
    val Seq(nTruth, nScreen, tp, fp, fn) =
      (0 to 4).map(i => r.getLong(i))
    assert(tp + fp === nScreen, "screen partitions into tp+fp")
    assert(tp + fn === nTruth, "truth partitions into tp+fn")
    assert(nTruth >= 2, "pairs (1,2) and (1,3)/(2,3) are true dups")
    assert(tp >= 1, "the exact duplicate pair must survive the screen")
    // precision/recall are micro ratios of the counts above
    if (nScreen > 0)
      assert(r.getLong(5) === tp * 1000000L / nScreen)
    if (nTruth > 0)
      assert(r.getLong(6) === tp * 1000000L / nTruth)
  }

  test("dirichletQlTopK: self-retrieval wins and scores decrease with rank") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta unrelated filler words here"),
      (1L, "epsilon zeta eta theta other stuff"),
      (2L, "alpha beta something else entirely different thing"),
      (3L, "completely disjoint vocabulary tokens appear once")
    ).toDF("doc_id", "text")
    val got = graft.ext.LangModel.dirichletQlTopK(docs, "doc_id", "text",
        qMod = 4, qLen = 4, mu = 100L, k = 4)   // query = doc 0's head
      .orderBy(col("rnk")).collect()
    // the query IS doc 0's first four tokens: doc 0 must rank first,
    // doc 2 (shares alpha beta) second
    assert(got(0).getAs[Long]("doc_id") == 0L)
    assert(got(1).getAs[Long]("doc_id") == 2L)
    val scores = got.map(_.getAs[Long]("score_micro"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
