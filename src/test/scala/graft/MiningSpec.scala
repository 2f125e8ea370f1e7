package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, LangModel, LinkGraph, Similarity}
import graft.io.Versioned

/** Sixth-wave operator specs: triangle counting goldens, kNN-graph ≡
  * exhaustive within-cell scan, classifier/bigram golden values, and
  * snapshot-diff change classes. Cross-engine exactness lives in the
  * q128–q132 oracles; these pin semantics on hand-checkable inputs.
  */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    LinkGraph.triangleCounts(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("banded containment screen ≡ exact containment on the test corpus") {
    // the recall contract q225 relies on: the df-capped minwise screen
    // plus exact verify must reproduce the quadratic exact twin's rows
    // bit-for-bit (precision is structural — every emitted row is
    // exact-verified — so any difference is a recall miss)
    val docs = graft.core.Tables.documents(spark, sfDir)
    val exact = graft.ext.Dedup.ngramContainmentPairs(
        docs, "doc_id", "text", n = 2, threshold = 0.6, blockCols = Seq("lang"))
      .as[(Long, Long, Double)].collect().toSet
    val banded = graft.ext.Dedup.ngramContainmentPairsBanded(
        docs, "doc_id", "text", n = 2, threshold = 0.6, blockCols = Seq("lang"))
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture produced no containment pairs — spec is vacuous")
    assert(banded === exact,
      s"recall miss: exact-only=${(exact -- banded).take(5)} banded-only=${(banded -- exact).take(5)}")
  }

  test("banded containment df cap drops hot-shingle candidates (the scale lever)") {
    // six docs share one ubiquitous bigram; with maxDf below the corpus
    // size that shingle cannot generate candidates, and the pair whose
    // ONLY overlap is the hot shingle disappears while a pair with rare
    // overlap survives — the documented recall/cost trade
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta epsilon", "en"),
      (3L, "alpha beta zeta eta theta iota kappa", "en"),
      (4L, "alpha beta", "en"),
      (5L, "alpha beta lambda", "en"),
      (6L, "alpha beta mu nu", "en")).toDF("doc_id", "text", "lang")
    val loose = graft.ext.Dedup.ngramContainmentPairsBanded(
        docs, "doc_id", "text", n = 2, threshold = 0.9, blockCols = Seq("lang"),
        probes = 8, maxDf = 100)
      .as[(Long, Long, Double)].collect().toSet
    // "alpha beta" is in all 6 docs; doc 4's only shingle is the hot one
    assert(loose.exists(_._1 == 4L), "uncapped screen should contain doc 4")
    val capped = graft.ext.Dedup.ngramContainmentPairsBanded(
        docs, "doc_id", "text", n = 2, threshold = 0.9, blockCols = Seq("lang"),
        probes = 8, maxDf = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(!capped.exists(_._1 == 4L),
      "df cap must drop candidates whose only overlap is the hot shingle")
    // doc 1 ⊂ doc 2 via rare shingles — must survive the cap
    assert(capped.exists(p => p._1 == 1L && p._2 == 2L),
      s"rare-shingle containment lost under the cap: $capped")
  }

  test("dsirImportanceMicro: target-exclusive grams score above raw-exclusive; short docs absent") {
    val docs = Seq(
      (1L, "x y x y", true),   // grams {x y, y x, x y} — target side
      (2L, "x y z", true),     // target
      (3L, "p q p q", false),  // raw-only grams
      (4L, "x y p q", false),  // mixed: shares "x y" with target
      (5L, "solo", false)      // < 2 tokens: no grams, absent
    ).toDF("doc_id", "text", "is_t")
    val out = graft.ext.LangModel.dsirImportanceMicro(
        docs, "doc_id", "text", col("is_t"), buckets = 1024)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(5L), "gram-less doc must be absent")
    assert(out(1L)._1 === 3L && out(3L)._1 === 3L, "gram instance counts")
    // doc 1's grams occur only in target docs, doc 3's only in raw:
    // the log-ratio weights must separate them, mixed doc in between
    assert(out(1L)._2 > out(4L)._2,
      s"target-exclusive must outscore mixed: ${out(1L)} vs ${out(4L)}")
    assert(out(4L)._2 > out(3L)._2,
      s"mixed must outscore raw-exclusive: ${out(4L)} vs ${out(3L)}")
  }

  test("splitLeakageReport: nearest by jaccard, tie to larger id, disjoint eval absent") {
    val docs = Seq(
      (10L, "a b c d e", "train", "en"),
      (11L, "a b c x y", "train", "en"),
      (20L, "a b c d e f", "eval", "en"), // closer to 10 than 11
      (21L, "zz ww", "eval", "en"),       // no shared bigram: absent
      (30L, "a b", "train", "en"),
      (31L, "a b", "train", "en"),
      (40L, "a b", "eval", "en")          // ties 30/31 exactly: take 31
    ).toDF("doc_id", "text", "split", "lang")
    val out = graft.ext.Dedup.splitLeakageReport(docs, "doc_id", "text",
        col("split"), "train", n = 2, threshold = 0.5, blockCols = Seq("lang"))
      .select("eval_id", "n_candidates", "max_jaccard", "nearest_train_id", "leaked")
      .as[(Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains(21L), "eval doc sharing no shingle must be absent")
    assert(out(20L)._4 === 10L, s"nearest for 20 should be 10: ${out(20L)}")
    // 10/11 share multi-gram overlap; 30/31 ("a b") also share the
    // "a b" bigram with 20 — all four train docs are candidates
    assert(out(20L)._2 === 4L, s"all four train docs share a shingle with 20: ${out(20L)}")
    assert(out(40L)._4 === 31L, s"exact tie must break to larger train id: ${out(40L)}")
    assert(out(40L)._3 === 1.0 && out(40L)._5, "identical doc: jaccard 1, leaked")
    assert(out(20L)._5 === (out(20L)._3 >= 0.5), "leaked flag consistent with threshold")
  }

  test("winnowing: window minima selected, short docs absent, shared-run guarantee") {
    // doc 60/61 share the 6-token run "m n o p q r": with k=2, w=4 the
    // run spans 5 gram hashes >= w+... >= one full window, so the paper's
    // guarantee applies — at least one common fingerprint MUST be
    // selected in both docs despite different surrounding context
    val docs = Seq(
      (60L, "a1 b2 m n o p q r c3 d4", "en"),
      (61L, "x9 m n o p q r y8 z7 w6", "en"),
      (62L, "totally unrelated words here now", "en"),
      (63L, "tiny doc", "en") // 1 bigram < w: absent
    ).toDF("doc_id", "text", "lang")
    val fps = graft.ext.Dedup.winnowingFingerprints(docs, "doc_id", "text", 2, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!fps.contains(63L), "doc with fewer than w gram hashes must be absent")
    assert((fps(60L) & fps(61L)).nonEmpty,
      "shared 6-token run must select a common fingerprint in both docs")
    // every fingerprint is an actual gram hash of its doc (window MIN,
    // not an arbitrary hash), and density is below 1 (selection happened)
    assert(fps(60L).size < 9, "winnowing must select fewer fingerprints than grams")
    val pairs = graft.ext.Dedup.winnowingSharedPairs(docs, "doc_id", "text",
        k = 2, w = 4, minShared = 1L, blockCols = Seq("lang"))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 60L && p._2 == 61L), s"pair 60-61 missing: $pairs")
    assert(!pairs.exists(p => p._1 == 62L || p._2 == 62L),
      "unrelated doc must share no fingerprint")
  }

  test("kCenterCoreset: farthest-point order on a line, tie to smaller id") {
    // points 0, 1, 10, 11, 20 (ids 1..5): seed = id 1 (min id), then
    // 20 (d²=400), then 10 (min-dist 100), then the 1-vs-11 tie at
    // min-dist 1 breaks to the smaller id
    val pts = Seq(
      (1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(10f)), (4L, Seq(11f)), (5L, Seq(20f))
    ).toDF("vec_id", "embedding")
    val got = graft.ext.Similarity.kCenterCoreset(pts, "vec_id", "embedding", 4)
      .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 1L, None),
      (2L, 5L, Some(400000000L)),
      (3L, 3L, Some(100000000L)),
      (4L, 2L, Some(1000000L))), s"wrong traversal: $got")
  }

  test("kCenterCoreset: k larger than the table stops at the table size") {
    val pts = Seq((1L, Seq(0f)), (2L, Seq(3f))).toDF("vec_id", "embedding")
    val got = graft.ext.Similarity.kCenterCoreset(pts, "vec_id", "embedding", 5)
      .as[(Long, Long, Option[Long])].collect()
    assert(got.length === 2 && got.map(_._2).toSet === Set(1L, 2L))
  }

  test("kCenterCoreset: empty input and duplicate ids degrade gracefully") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.ext.Similarity.kCenterCoreset(
      empty, "vec_id", "embedding", 3).count() === 0L)
    // 3 rows but only 2 distinct ids: the id-exhaustion round returns
    // zero candidates — partial (2-center) coreset, not an exception
    val dup = Seq((1L, Seq(0f)), (1L, Seq(1f)), (2L, Seq(9f)))
      .toDF("vec_id", "embedding")
    val got = graft.ext.Similarity.kCenterCoreset(dup, "vec_id", "embedding", 3)
      .as[(Long, Long, Option[Long])].collect()
    assert(got.map(_._2).toSet === Set(1L, 2L), s"got ${got.toSeq}")
  }

  test("triangleCounts: K4 has 4 triangles, every node on 3") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: square without diagonal has none; one diagonal makes two") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tri(square) === Map.empty)
    assert(tri(square :+ ((1L, 3L))) ===
      Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("triangleCounts normalizes duplicates, reversals, self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(tri(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: barbell graph, hand-computed 2 rounds") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val got = LinkGraph.labelPropagation(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: 1->2 2->1 3->1 4->3 5->4 6->4; round 2 as asserted
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("knnGraph == exhaustive top-k within each quantizer cell") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val got = Similarity.knnGraph(spark, emb, k = 3, kCells = 8)
      .select($"vec_id", $"rank", $"n_id", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    // naive twin: same centroids/assignment, plain (unsalted) cell
    // self-join, window top-k
    val centroids = IvfIndex.materializeLocal(spark,
      IvfIndex.buildCentroids(spark, emb, 8))
    val vecs = emb.select($"vec_id".as("id"), $"embedding".as("emb"))
    val cells = IvfIndex.assign(vecs, centroids).join(vecs, "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"sim".desc, $"n_id".asc)
    val want = cells.select($"cid", $"id".as("vec_id"), $"emb".as("ea"))
      .join(cells.select($"cid", $"id".as("n_id"), $"emb".as("eb")), "cid")
      .filter($"vec_id" =!= $"n_id")
      .withColumn("sim", graft.core.Exact.r6(Similarity.cosineNative($"ea", $"eb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"vec_id", $"rank", $"n_id", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("hashedLinearScoreMicro: hand-computed buckets, scores, sigmoid") {
    // PolyHash("a")=97, "b"=98, "c"=99 → buckets mod 4: 1, 2, 3
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val weights = Seq((0L, 0L), (1L, 100000L), (2L, -400000L), (3L, 1000000L))
      .toDF("bucket", "w_micro")
    val got = LangModel.hashedLinearScoreMicro(docs, weights, "doc_id", "text", 4)
      .select($"id", $"n_tokens", $"score_micro", $"prob_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc1: (2·100000 − 400000)/3 = −66666.67 → −66667 (round half away)
    val p1 = math.round(1000000.0 / (1.0 + math.exp(66667.0 / 1000000.0)))
    // doc2: 1000000/1 → sigmoid(1)
    val p2 = math.round(1000000.0 / (1.0 + math.exp(-1.0)))
    assert(got === Set((1L, 3L, -66667L, p1), (2L, 1L, 1000000L, p2)))
  }

  test("bigramBackoffNll: seen, backoff, and OOV pair types; short docs absent") {
    val train = Seq((100L, "a b a")).toDF("doc_id", "text")
    // cu: a=2 b=1, N=3; cb: (a,b)=1, (b,a)=1
    val docs = Seq(
      (1L, "a b"),  // seen bigram: ln(2) − ln(1)
      (2L, "b b"),  // unseen bigram, seen w2: ln(5·3) − ln(2·1)
      (3L, "x y"),  // unseen bigram, OOV w2 floors at 1: same value
      (4L, "z")     // one token: no bigrams, absent
    ).toDF("doc_id", "text")
    val got = LangModel.bigramBackoffNll(train, docs, "doc_id", "text")
      .select($"id", $"n_pairs", $"sum_nll_micro", $"avg_nll_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    val seen = math.round(math.log(2.0) * 1000000)
    val backoff = math.round((math.log(15.0) - math.log(2.0)) * 1000000)
    assert(got === Set(
      (1L, 1L, seen, seen),
      (2L, 1L, backoff, backoff),
      (3L, 1L, backoff, backoff)))
  }

  test("blockedJaroWinkler compares only within blocks, verifies with JW") {
    val left = Seq("martha", "zorro").toDF("name")
    val right = Seq("marhta", "martha", "zebra", "marge").toDF("s_name")
    val got = graft.ops.FuzzyLink.blockedJaroWinkler(left, right, "name", "s_name",
        c => substring(c, 1, 1), threshold = 0.9)
      .as[(String, String, Double)].collect().toSet
    // "martha"/"marhta" is the textbook JW 0.961111 pair; "marge" (same
    // block) fails the threshold; "zebra" shares zorro's block but fails
    assert(got === Set(("martha", "marhta", 0.961111), ("martha", "martha", 1.0)))
  }

  test("fillInterpolate: interp between neighbors, locf/nocb edges, none when empty") {
    val rows = Seq(
      ("a", 0L, Option(100L)), ("a", 10L, None), ("a", 20L, Option(200L)),
      ("b", 0L, None), ("b", 5L, Option(50L)), ("b", 20L, None),
      ("c", 0L, Option.empty[Long]),
      // uneven spacing: (100·15 + 200·5) div 20 = 125
      ("d", 0L, Option(100L)), ("d", 5L, None), ("d", 20L, Option(200L))
    ).toDF("k", "t", "v")
    val got = graft.ops.TimeSeries.fillInterpolate(rows, Seq("k"), "t", "v")
      .select($"k", $"t", $"fill_method", $"filled")
      .as[(String, Long, String, Option[Long])].collect().toSet
    assert(got === Set(
      ("a", 0L, "observed", Some(100L)), ("a", 10L, "interp", Some(150L)),
      ("a", 20L, "observed", Some(200L)),
      ("b", 0L, "nocb", Some(50L)), ("b", 5L, "observed", Some(50L)),
      ("b", 20L, "locf", Some(50L)),
      ("c", 0L, "none", None),
      ("d", 0L, "observed", Some(100L)), ("d", 5L, "interp", Some(125L)),
      ("d", 20L, "observed", Some(200L))))
  }

  test("pairSampleSimHistogram bins exactly the within-bucket pairs") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val hist = Similarity.pairSampleSimHistogram(emb, "vec_id", "embedding", nBuckets = 8)
      .as[(Long, Long)].collect().toMap
    // twin recomputation of the sampled-pair count from the same mix
    val P = 1000000007L
    val h0 = graft.functions.PolyHash.polyHash($"vec_id".cast("string"))
    val byBkt = emb.select(
        pmod(pmod(h0 * h0, lit(P)) * 1103515245L + 12345L, lit(P)).mod(8L).as("bkt"))
      .groupBy($"bkt").count().as[(Long, Long)].collect()
    val wantPairs = byBkt.map { case (_, n) => n * (n - 1) / 2 }.sum
    assert(hist.values.sum === wantPairs)
    assert(hist.keys.forall(b => b >= 0L && b <= 20L))
    assert(wantPairs > 0)
  }

  test("weightedSample: rank order is (key, id), k bounds each stratum") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val all = graft.ext.CorpusOps.weightedSample(docs, "lang", "doc_id",
        col("n_chars"), k = Int.MaxValue)
      .select($"lang", $"doc_id", $"key_micro", $"draw_rank")
      .as[(String, Long, Long, Long)].collect()
    all.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4).map(r => (r._3, r._2))
      assert(byRank.sameElements(rows.sortBy(r => (r._3, r._2)).map(r => (r._3, r._2))))
    }
    val k2 = graft.ext.CorpusOps.weightedSample(docs, "lang", "doc_id",
        col("n_chars"), k = 2)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    val want = all.groupBy(_._1).toSeq.flatMap { case (l, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(2).map(r => (l, r._2)).toSeq
    }.toSet
    assert(k2 === want)
    assert(k2.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("applyPatch(old, snapshotPatch(old, new)) reproduces new exactly") {
    val old = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0)).toDF("id", "s", "v")
    val nw = Seq((2L, "y", 5.0), (3L, "z", 3.0), (4L, "w", 4.0)).toDF("id", "s", "v")
    val patch = Versioned.snapshotPatch(old, nw, Seq("id"))
    val pset = patch.as[(Long, String, Option[String], Option[Double])].collect().toSet
    assert(pset === Set(
      (1L, "removed", None, None),
      (2L, "changed", Some("y"), Some(5.0)),
      (4L, "added", Some("w"), Some(4.0))))
    val restored = Versioned.applyPatch(old, patch, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(restored === nw.as[(Long, String, Double)].collect().toSet)
  }

  test("debounce keeps burst heads; chained rows drop across dropped predecessors") {
    val ev = Seq(
      ("a", 0L), ("a", 50L), ("a", 100L), ("a", 200L),
      ("b", 0L)
    ).toDF("k", "t")
    val got = graft.ops.TimeSeries.debounce(ev, Seq("k"), "t", gap = 60L)
      .as[(String, Long)].collect().toSet
    // a@100 is 100 away from the kept head but only 50 from its dropped
    // predecessor → still inside the burst → dropped
    assert(got === Set(("a", 0L), ("a", 200L), ("b", 0L)))
  }

  test("multi-probe LSH candidates contain single-probe's; recall never drops") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceKnn(queries, emb, k = 5)
    val single = Similarity.recallAtK(exact,
        Similarity.lshKnn(queries, emb, dim = 64, k = 5, nBits = 6, tables = 2))
      .select($"q_id", $"recall_micro").as[(Long, Long)].collect().toMap
    val multi = Similarity.recallAtK(exact,
        Similarity.lshKnnMultiProbe(queries, emb, dim = 64, k = 5, nBits = 6, tables = 2))
      .select($"q_id", $"recall_micro").as[(Long, Long)].collect().toMap
    assert(single.keySet === multi.keySet)
    // flip=0 is among the probes, so multi-probe's candidate set is a
    // superset — per-query recall can only improve
    assert(single.keys.forall(q => multi(q) >= single(q)),
      s"single=$single multi=$multi")
    assert(multi.values.sum >= single.values.sum)
  }

  test("rrfFuse: hand-computed fusion, double-hit candidates outrank single-hit") {
    val l1 = Seq((1L, 1L, 10L), (1L, 2L, 11L)).toDF("q_id", "rank", "n_id")
    val l2 = Seq((1L, 1L, 11L), (1L, 2L, 12L)).toDF("q_id", "rank", "n_id")
    val got = Similarity.rrfFuse(Seq(l1, l2), k0 = 60, k = 3)
      .select($"q_id", $"rrf_rank", $"n_id", $"score_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    val t1 = math.round(1000000.0 / 61) // rank 1
    val t2 = math.round(1000000.0 / 62) // rank 2
    // 11 hits both lists (ranks 2 and 1) and must outrank both singles
    assert(got === Set(
      (1L, 1L, 11L, t1 + t2), (1L, 2L, 10L, t1), (1L, 3L, 12L, t2)))
  }

  test("recallAtK: semi-join overlap per query, absent queries score zero") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("q_id", "n_id")
    val approx = Seq((1L, 11L), (1L, 12L), (1L, 99L)).toDF("q_id", "n_id")
    val got = Similarity.recallAtK(exact, approx)
      .select($"q_id", $"n_exact", $"n_hit", $"recall_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 2L, 666666L), (2L, 2L, 0L, 0L)))
  }

  test("psiContributions: identical slices score zero, disjoint mass positive") {
    val a = Seq(10L, 20L, 110L, 120L).toDF("value")
    val same = graft.ops.Drift.psiContributions(a, a, "value", 100L)
      .select($"contrib_micro").as[Long].collect()
    assert(same.length === 2 && same.forall(_ === 0L))
    val a6 = Seq(10L, 20L, 30L, 110L, 120L, 130L).toDF("value")
    val b6 = Seq(210L, 220L, 230L, 240L, 250L, 260L).toDF("value")
    val drift = graft.ops.Drift.psiContributions(a6, b6, "value", 100L)
      .select($"bin_lo", $"n_ref", $"n_cur", $"contrib_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    // every bucket is one-sided → clamped counts, strictly positive PSI
    assert(drift.map(_._1) === Set(0L, 100L, 200L))
    assert(drift.forall(_._4 > 0L))
  }

  test("containment pairs: excerpt scores 1.0 toward its container, Jaccard-invisible") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "en", "omega psi chi")
    ).toDF("doc_id", "lang", "text")
    val got = graft.ext.Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.6, blockCols = Seq("lang"))
      .select($"contained_id", $"container_id", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    // doc 1's two bigrams are both in doc 2 → containment 1.0; the
    // reverse direction is 2/9; Jaccard would be 2/9 — below any dup bar
    assert(got === Set((1L, 2L, 1.0)))
    val jac = graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = 0.6, blockCols = Seq("lang"))
    assert(jac.count() === 0L)
  }

  test("subsequenceTopK: exact integer distances, hand-computed top-3") {
    val series = Seq(
      ("a", 1L, 10L, 1L), ("a", 2L, 20L, 2L), ("a", 3L, 30L, 3L), ("a", 4L, 40L, 4L),
      ("b", 5L, 10L, 1L), ("b", 6L, 20L, 2L), ("b", 7L, 30L, 9L)
    ).toDF("k", "id", "t", "c")
    val pattern = Seq(Tuple1(Array(1L, 2L))).toDF("pw")
    val got = graft.ops.TimeSeries.subsequenceTopK(series, Seq("k"), "t", "id", "c",
        pattern, w = 2, k = 3)
      .as[(String, Long, Long)].collect().toSet
    // windows: a@1 (1,2) d=0; a@2 (2,3) d=2; a@3 (3,4) d=8;
    //          b@5 (1,2) d=0; b@6 (2,9) d=50
    assert(got === Set(("a", 1L, 0L), ("b", 5L, 0L), ("a", 2L, 2L)))
  }

  test("znSubsequenceTopK: scale-invariant match at zero, flat windows excluded") {
    // key b is key a's pattern times 10 plus 5 — affine, so z-normed
    // distance 0; key c is flat (zero variance) and must be excluded
    val series = Seq(
      ("a", 1L, 10L, 1L), ("a", 2L, 20L, 2L), ("a", 3L, 30L, 4L),
      ("b", 4L, 10L, 15L), ("b", 5L, 20L, 25L), ("b", 6L, 30L, 45L),
      ("c", 7L, 10L, 7L), ("c", 8L, 20L, 7L), ("c", 9L, 30L, 7L)
    ).toDF("k", "id", "t", "c")
    val pattern = Seq(Tuple1(Array(1L, 2L, 4L))).toDF("pw")
    val got = graft.ops.TimeSeries.znSubsequenceTopK(series, Seq("k"), "t", "id", "c",
        pattern, w = 3, k = 10)
      .as[(String, Long, Long)].collect()
    val byKey = got.map(r => (r._1, r._3)).toSet
    assert(byKey.contains(("a", 0L)) && byKey.contains(("b", 0L)))
    assert(!got.exists(_._1 == "c"), s"flat window not excluded: ${got.mkString(",")}")
  }

  test("ksStatistic: hand-computed max CDF gap; identical samples give zero") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("value")
    val b = Seq(3L, 4L, 5L, 6L).toDF("value")
    val got = graft.ops.Drift.ksStatistic(a, b, "value")
      .as[(Long, Long, Long, Long)].collect().head
    // CDFs cross-multiplied by n1·n2=16: at v=2 cum1=2,cum2=0 → 8; that
    // is the max → D = 8/16 = 0.5
    assert(got === ((4L, 4L, 8L, 500000L)))
    val same = graft.ops.Drift.ksStatistic(a, a, "value")
      .as[(Long, Long, Long, Long)].collect().head
    assert(same === ((4L, 4L, 0L, 0L)))
  }

  test("snapshotDiff classifies added/removed/changed, null-safely, drops unchanged") {
    val old = Seq((1L, "x", Option(1L)), (2L, "y", Option.empty[Long]), (3L, "z", Option(1L)))
      .toDF("id", "s", "v")
    val nw = Seq((2L, "y", Option(5L)), (3L, "z", Option(1L)), (4L, "w", Option.empty[Long]))
      .toDF("id", "s", "v")
    val got = Versioned.snapshotDiff(old, nw, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "removed"), (2L, "changed"), (4L, "added")))
  }
}
