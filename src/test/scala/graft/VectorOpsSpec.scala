package graft

import org.apache.spark.sql.functions._
import graft.ext.{CorpusOps, Dedup, LinkGraph, Pca, Pq}

/** Wave-29 operator semantics on hand-checkable inputs: PQ codes land
  * in the right cells and ADC is exact when vectors ARE their
  * codewords; the power iteration finds the dominant axis of an
  * anisotropic cloud; novelty is 1000 for the first doc and 0 for an
  * exact repeat; the curriculum interleaves sources within a tier;
  * Adamic–Adar weights rare shared neighbors above hubs. Cross-engine
  * exactness lives in the q267–q271 oracles.
  */
class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def embDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("Pq: codes are exact and ADC reproduces true distances on codeword vectors") {
    // 8 vectors = the 4 seed patterns duplicated: after one Lloyd step
    // each centroid is the exact pattern, every vector codes to its
    // pattern, and ADC distance == exact distance for every pair
    val patterns = Seq(
      Seq.fill(16)(1.0f), Seq.fill(16)(-1.0f),
      (0 until 16).map(i => if (i % 2 == 0) 1.0f else -1.0f),
      (0 until 16).map(i => if (i < 8) 1.0f else 0.0f))
    val df = embDf((0 until 8).map(i => (i.toLong, patterns(i % 4))): _*)
    val cb = Pq.trainCodebooks(spark, df, m = 2, subDim = 8, k = 4)
    val codes = Pq.encode(df, cb, m = 2, subDim = 8)
      .as[(Long, Long, Long)].collect()
    // duplicates of the same pattern share a cell in every subspace
    val byVec = codes.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
    (0 until 4).foreach { p =>
      assert(byVec(p.toLong) === byVec((p + 4).toLong), s"pattern $p split cells")
    }
    val adc = Pq.adcTopK(df.filter($"vec_id" === 0), df, cb, m = 2, subDim = 8, k = 3)
      .orderBy($"rank").as[(Long, Long, Long, Long, Boolean)].collect()
    // rank 1 must be the duplicate of vector 0 at ADC distance 0, in the exact set
    assert(adc.head._3 === 4L && adc.head._4 === 0L && adc.head._5)
  }

  test("Pca.powerTopDirection finds the dominant axis") {
    // cloud stretched along dim 2 (amplitude 10), noise ±1 on dim 5
    val rows = (0 until 40).map { i =>
      val v = Array.fill(8)(0.0f)
      v(2) = (if (i % 2 == 0) 10.0f else -10.0f)
      v(5) = (if (i % 3 == 0) 1.0f else -1.0f)
      (i.toLong, v.toSeq)
    }
    val out = Pca.powerTopDirection(embDf(rows: _*), "embedding", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(math.abs(out(2L)) === 1000000L, s"dominant axis got ${out(2L)}")
    assert(math.abs(out(5L)) < 200000L)
    assert((0 until 8).filter(p => p != 2 && p != 5)
      .forall(p => out(p.toLong) === 0L))
  }

  test("ngramNoveltyByOrder: first doc all-novel, exact repeat zero-novel") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),      // exact repeat — nothing new
      (3L, "x y z w v")       // all new
    ).toDF("doc_id", "text")
    val out = Dedup.ngramNoveltyByOrder(docs, "doc_id", "text", n = 3)
      .orderBy($"id").as[(Long, Long, Long, Long)].collect()
    assert(out.map(r => r._1 -> r._4).toSeq === Seq(1L -> 1000L, 2L -> 0L, 3L -> 1000L))
  }

  test("curriculumHead interleaves sources within the top tier") {
    val docs = (1L to 12L).map(i =>
      (i, if (i % 2 == 0) "sA" else "sB", 100L - i)).toDF("id", "src", "q")
    val head = CorpusOps.curriculumHead(docs, "id", "src", "q", tiers = 3, take = 6)
      .orderBy($"position").as[(Long, Long, Long, String, Long)].collect()
    // ntile(3) of 6 rows/source = 2 per tier: 4 tier-1 rows, then tier 2
    assert(head.map(_._2).toSeq === Seq(1L, 1L, 1L, 1L, 2L, 2L))
    // sources alternate at each rank (source asc within (tier, rank))
    assert(head.map(_._4).toSeq === Seq("sA", "sB", "sA", "sB", "sA", "sB"))
  }

  test("adamicAdarTopK: rare shared neighbor outweighs a hub") {
    // c1 (deg 2) links s1,s2; c2 (deg 4) links s3,s4 (and s5,s6):
    // AA(s1,s2) = 1/ln2 > AA(s3,s4) = 1/ln4
    val edges = Seq(
      (1L, 101L), (1L, 102L),
      (2L, 103L), (2L, 104L), (2L, 105L), (2L, 106L)).toDF("src", "dst")
    val out = LinkGraph.adamicAdarTopK(edges, k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.head._1 === 101L && out.head._2 === 102L)
    assert(out.head._4 === 1442695L) // round(1e6/ln 2)
    assert(out.length === 1 + 6)     // s1s2 + C(4,2) hub pairs
    assert(out.tail.forall(_._4 === 721348L)) // round(1e6/ln 4)
  }
}
