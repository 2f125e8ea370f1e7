package graft

import graft.core.Tables
import graft.ext.{IvfIndex, Similarity}

/** IVF-ANN: deterministic index, sane recall vs brute force, and the
  * typed Dataset model round-trip.
  */
class IvfSpec extends SparkTestBase {
  import spark.implicits._

  lazy val embs = Tables.embeddings(spark, sfDir).cache()

  test("centroid build is deterministic and covers the corpus") {
    val c1 = IvfIndex.buildCentroids(spark, embs, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val c2 = IvfIndex.buildCentroids(spark, embs, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(c1 === c2)
    assert(c1.size === 8 && c1.values.forall(_.length === 64))
  }

  test("assignAffinity reports the max centroid cosine per vector, every vector once") {
    import org.apache.spark.sql.functions._
    val centroids = IvfIndex.materializeLocal(spark,
      IvfIndex.buildCentroids(spark, embs, 8))
    val vecs = embs.select($"vec_id".as("id"), $"embedding".as("emb"))
    val got = IvfIndex.assignAffinity(vecs, centroids)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size === embs.count())
    // definitional check: per vector, aff is the MAX cosine over all
    // centroids and cid attains it (round to the operator's r6 grain)
    val best = vecs.crossJoin(broadcast(centroids))
      .withColumn("aff", graft.core.Exact.r6(
        graft.functions.CosineSim.cosineSim($"emb", $"cemb")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
      .groupBy(_._1)
    got.foreach { case (id, (cid, aff)) =>
      val affs = best(id)
      assert(math.abs(affs.map(_._3).max - aff) < 1e-9, s"vec $id: $aff not max")
      assert(affs.filter(t => math.abs(t._3 - aff) < 1e-9).map(_._2).min === cid)
      assert(aff >= -1.0 - 1e-9 && aff <= 1.0 + 1e-9)
    }
  }

  test("ivf recall vs brute-force top-5 is reasonable") {
    val q = embs.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceKnn(q, embs, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.ivfKnn(spark, q, embs, k = 5, kCentroids = 8, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(ivf.size === 15) // k filled for each query
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall too low")
  }

  test("multi-iteration Lloyd is deterministic and tightens the quantizer") {
    val c2a = IvfIndex.buildCentroids(spark, embs, 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val c2b = IvfIndex.buildCentroids(spark, embs, 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(c2a === c2b)
    // quantization distortion (mean best-centroid cosine affinity) must
    // not get WORSE with a second step ON THIS FIXTURE — a pinned
    // regression check, not a theorem: Lloyd monotonicity is proven for
    // squared-Euclidean with raw means, and this operator pairs raw
    // means with COSINE assignment (plus micro-int rounding), for which
    // adversarial norm-skewed corpora can regress a step
    import org.apache.spark.sql.functions._
    def meanBestAff(cent: Map[Long, Seq[Float]]): Double = {
      val cdf = cent.toSeq.toDF("cid", "cemb")
        .select(col("cid"), col("cemb").cast("array<float>").as("cemb"))
      embs.select(col("vec_id").as("id"), col("embedding").as("emb"))
        .crossJoin(broadcast(cdf))
        .withColumn("aff", graft.functions.CosineSim.cosineSim(col("emb"), col("cemb")))
        .groupBy(col("id")).agg(max(col("aff")).as("best"))
        .agg(avg(col("best"))).head().getDouble(0)
    }
    val one = IvfIndex.buildCentroids(spark, embs, 8, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(meanBestAff(c2a) >= meanBestAff(one) - 1e-6,
      "second Lloyd step degraded mean best-centroid affinity")
  }

  test("ivf with nProbe = kCentroids degenerates to exact brute-force KNN") {
    // probing every inverted list searches the whole corpus, so the
    // approximate operator must EQUAL the exact baseline row-for-row
    // (same rounded sims, same tie-breaks) — the boundary that pins the
    // rerank stage's exactness independent of the quantizer
    val q = embs.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceKnn(q, embs, 5)
      .select("q_id", "rank", "n_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val full = IvfIndex.ivfKnn(spark, q, embs, k = 5, kCentroids = 8, nProbe = 8)
      .select("q_id", "rank", "n_id", "sim")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(full === exact)
  }

  test("cellDrift empty sides: cold index forces rebuild, empty delta stays assign") {
    import graft.ext.Pq
    val coarse = Seq((0L, Seq(1000000L)), (1L, Seq(-1000000L)))
      .toDF("cid", "cent")
    val cells = Seq((10L, 0L), (11L, 0L), (12L, 1L)).toDF("vec_id", "cell")
    val empty = cells.filter($"vec_id" < 0L)
    // tp=0, td>0 — the quantizer was trained on nothing resembling the
    // delta: tv stays 0 (defined, no NULL/NPE) but rebuild must fire
    val cold = Pq.cellDrift(coarse, empty, cells, tvMilli = 250L)
      .select("tv_milli", "rebuild").distinct().collect()
    assert(cold.length == 1 && cold.head.getLong(0) == 0L
      && cold.head.getBoolean(1), s"cold index must flag rebuild: ${cold.toSeq}")
    // td=0 — an empty nightly delta is NOT evidence of drift
    val idle = Pq.cellDrift(coarse, cells, empty, tvMilli = 250L)
      .select("tv_milli", "rebuild").distinct().collect()
    assert(idle.length == 1 && idle.head.getLong(0) == 0L
      && !idle.head.getBoolean(1), s"empty delta must stay assign: ${idle.toSeq}")
  }
}
