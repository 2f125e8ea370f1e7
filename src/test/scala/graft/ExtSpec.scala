package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, HashForest, Multimodal, Similarity, TextAnalysis}

/** LLM-data operators: MinHash-LSH recall vs exact Jaccard ground truth,
  * SimHash sanity, ANN recall vs brute-force KNN, multimodal featurize
  * vs direct computation. All on sf0.001 (deterministic data + hashes →
  * deterministic assertions).
  */
class ExtSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()
  lazy val embs = Tables.embeddings(spark, sfDir).cache()

  test("int8-rerank KNN recovers the exact top-5 at cands=50") {
    val queries = embs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceKnn(queries, embs, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val rerank = Similarity.int8RerankKnn(queries, embs, k = 5, cands = 50)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & rerank).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 rerank recall $recall < 0.9")
    // the exact-rerank stage reports true cosines: the surviving pairs'
    // sims must MATCH brute force exactly, not approximately
    val exactSims = Similarity.bruteForceKnn(queries, embs, k = 5)
      .select($"q_id", $"n_id", $"sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    Similarity.int8RerankKnn(queries, embs, k = 5, cands = 50)
      .select($"q_id", $"n_id", $"sim").as[(Long, Long, Double)].collect()
      .foreach { case (q, n, s) =>
        exactSims.get((q, n)).foreach(es => assert(es === s, s"sim drift for ($q,$n)"))
      }
  }

  test("minhash-LSH finds every exact bigram-Jaccard pair >= 0.2 (blocked)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2, Seq("lang"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 2, 0.2,
        bands = 21, rowsPerBand = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
    // and LSH never reports a below-threshold pair (exact verify stage)
    val verified = Dedup.minHashLshPairs(docs, "doc_id", "text", 2, 0.2)
      .select("jaccard").as[Double].collect()
    assert(verified.forall(_ >= 0.2))
  }

  test("simhash of identical text is identical; near-dup pair is close") {
    val h = docs.limit(5).select($"doc_id", Dedup.simHash($"text").as("h"))
    val twice = h.as("a").join(h.as("b"), $"a.doc_id" === $"b.doc_id")
      .select(Dedup.hamming($"a.h", $"b.h").as("d")).as[Long].collect()
    assert(twice.forall(_ === 0L))
  }

  test("banded simhash pairs equal the exhaustive cross-join scan") {
    // the pigeonhole banding is lossless: a pair within hamming maxDist
    // differs in at most maxDist of the maxDist+1 chunks, so at least
    // one chunk matches exactly and the pair becomes a candidate —
    // asserted here against the definitional all-pairs scan
    val h = docs.select($"doc_id", Dedup.simHash($"text").as("h"))
    for (d <- Seq(2, 6)) {
      val exhaustive = h.as("a").join(h.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          Dedup.hamming($"a.h", $"b.h").cast("long").as("dist"))
        .filter($"dist" <= d)
        .as[(Long, Long, Long)].collect().toSet
      val banded = Dedup.simHashPairsBanded(docs, "doc_id", "text", maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      assert(banded === exhaustive,
        s"maxDist=$d: banded ${banded.size} vs exhaustive ${exhaustive.size}; " +
          s"missing=${(exhaustive -- banded).take(3)} extra=${(banded -- exhaustive).take(3)}")
    }
  }

  test("asymmetric banded simhash equals the exhaustive batch-vs-corpus scan") {
    val batch = docs.filter($"doc_id" % 5 === 0)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val hb = batch.select($"doc_id", Dedup.simHash($"text").as("h"))
    val hc = corpus.select($"doc_id", Dedup.simHash($"text").as("h"))
    val d = 6
    val exhaustive = hb.as("b").join(hc.as("c"))
      .select($"b.doc_id".as("batch_id"), $"c.doc_id".as("corpus_id"),
        Dedup.hamming($"b.h", $"c.h").cast("long").as("dist"))
      .filter($"dist" <= d)
      .as[(Long, Long, Long)].collect().toSet
    val banded = Dedup.simHashPairsAgainst(corpus, batch, "doc_id", "text", d)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === exhaustive,
      s"banded ${banded.size} vs exhaustive ${exhaustive.size}; " +
        s"missing=${(exhaustive -- banded).take(3)} extra=${(banded -- exhaustive).take(3)}")
    assert(exhaustive.nonEmpty, "fixture yields zero cross pairs — checks nothing")
  }

  test("semantic dedup equals exhaustive same-cell cosine pairs") {
    // the IVF-cell blocking is the ONLY approximation: within a cell
    // the operator is exact, so its output must equal the definitional
    // scan restricted to same-cell pairs — and be a subset of the
    // unrestricted exhaustive pair set
    val tau = 0.25
    val centroids = graft.ext.IvfIndex.materializeLocal(spark,
      graft.ext.IvfIndex.buildCentroids(spark, embs, 16))
    val cells = graft.ext.IvfIndex.assign(
        embs.select($"vec_id".as("id"), $"embedding".as("emb")), centroids)
      .as[(Long, Long)].collect().toMap
    val exhaustive = embs.select($"vec_id".as("id_a"), $"embedding".as("emb_a"))
      .crossJoin(embs.select($"vec_id".as("id_b"), $"embedding".as("emb_b")))
      .filter($"id_a" < $"id_b")
      .withColumn("sim", graft.core.Exact.r6(
        graft.functions.CosineSim.cosineSim($"emb_a", $"emb_b")))
      .filter($"sim" >= tau)
      .select($"id_a", $"id_b", $"sim").as[(Long, Long, Double)].collect().toSet
    val expected = exhaustive.filter { case (a, b, _) => cells(a) == cells(b) }
    val got = Similarity.semanticDupPairs(spark, embs, tau, kCells = 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected,
      s"got ${got.size} vs expected ${expected.size}; " +
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.subsetOf(exhaustive))
  }

  test("banding-parameter relations: finer bands widen the candidate set") {
    // with the same 63-slot signature, a (b, r>1) band match means every
    // slot in the band matches, so any (21,3) candidate is a (63,1)
    // candidate — a deterministic containment that pins the banding
    // arithmetic across parameterizations (ROADMAP banding-params debt)
    val c21x3 = Dedup.minHashLshCandidates(docs, "doc_id", "text", 2, 21, 3)
      .as[(Long, Long)].collect().toSet
    val c63x1 = Dedup.minHashLshCandidates(docs, "doc_id", "text", 2, 63, 1)
      .as[(Long, Long)].collect().toSet
    assert(c21x3.subsetOf(c63x1),
      s"(21,3) candidates not contained in (63,1): ${(c21x3 -- c63x1).take(3)}")
    // and on this corpus the single-slot tables catch every exact pair
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2, Seq("lang"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(c63x1))
  }

  test("minhash-LSH physical plan reads the shingle cache, never re-derives it") {
    // the shingle projection feeds three consumers (candidate stage +
    // both verify-join sides); without the persist each would re-run
    // tokenize+shingle (~3×, measured 25% of the whole sf0.1 bench in
    // round 1). Guard: every consumer is an InMemoryTableScan and the
    // executed plan contains no trace of the split/shingle expressions.
    val sh = Dedup.shingleDf(docs, "doc_id", "text", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val plan = Dedup.minHashLshPairsPlan(sh, 0.2, 21, 3)
        .queryExecution.executedPlan.toString
      // scans print with the consumer's aliases (id / id_a / id_b)
      val scans = "InMemoryTableScan \\[id(_a|_b)?#\\d+L, sh(_a|_b)?#".r.findAllIn(plan).length
      assert(scans >= 3, s"expected >=3 shingle-cache scans, got $scans in:\n$plan")
      // the tokenize (`split`) may appear ONLY inside the printed bodies
      // of the cached relation (the cache definition, executed once) —
      // at most one per relation print; more means a consumer re-derives
      // the shingles instead of scanning the cache
      val splits = "split\\(trim\\(".r.findAllIn(plan).length
      val relationPrints = "InMemoryRelation \\[id(_a|_b)?#\\d+L, sh(_a|_b)?#".r.findAllIn(plan).length
      assert(splits <= relationPrints,
        s"shingle derivation leaked outside the cache ($splits splits, $relationPrints cached-plan prints):\n$plan")
    } finally sh.unpersist(true)
  }

  test("LSH-ANN candidates are a subset of the corpus and mostly agree with exact KNN") {
    val q = embs.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceKnn(q, embs, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshKnn(q, embs, dim = 64, k = 5, nBits = 4, tables = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }

  test("brute-force KNN returns k ranked rows per query with sims in [-1,1]") {
    val got = Similarity.bruteForceKnn(embs.filter($"vec_id" < 3), embs, 5)
      .collect()
    assert(got.length === 15)
    assert(got.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-9))
  }

  test("multimodal featurize matches direct computation") {
    val media = Multimodal.mediaFromDocuments(docs.limit(20))
    val feats = Multimodal.featurize(spark, media)
      .orderBy($"media_id").collect()
    val texts = docs.limit(20).orderBy($"doc_id").select($"text").as[String].collect()
    feats.zip(texts).foreach { case (r, text) =>
      val bytes = text.getBytes("UTF-8")
      val (frames, head, sum) = Multimodal.fakeDecode(bytes)
      assert(r.getAs[Long]("n_bytes") === bytes.length.toLong)
      assert(r.getAs[Long]("n_frames") === frames)
      assert(r.getAs[Int]("head_byte") === head)
      assert(r.getAs[Long]("checksum") === sum)
    }
  }

  test("staged langId tokenizes once and matches the inline form") {
    // the staged q43 dataflow projects tokens + profile scores as
    // columns; CollapseProject must NOT inline them back (the scores are
    // multiply-referenced by the pick fold, tokens by the four scores)
    val toks = docs.select($"lang", TextAnalysis.tokens($"text").as("toks"))
    val scored = toks.select(($"lang" +:
      TextAnalysis.profileScores($"toks").map { case (l, c) => c.as(s"s_$l") }): _*)
    val picked = scored.select($"lang", TextAnalysis.langIdFromScores(
      TextAnalysis.StopwordProfiles.map { case (l, _) => l -> col(s"s_$l") }).as("predicted"))
    val plan = picked.queryExecution.executedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    assert(splits === 1, s"expected exactly one tokenize, got $splits in:\n$plan")
    val inline = docs.select($"lang", TextAnalysis.langId($"text").as("predicted"))
    assert(picked.collect().toSeq === inline.collect().toSeq)
  }

  test("duplicate components: min-label propagation on chain, clique, singleton") {
    // graph: chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12,
    // pair 20-21, singleton 30
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val ids = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L)).toDF("id")
    val comp = Dedup.duplicateComponents(pairs, ids, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
    val groups = Dedup.duplicateGroups(pairs, ids, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // singleton 30 excluded; sizes ride along
    assert(groups === Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
  }

  test("keepBestByScore picks the highest-scoring member per component, min id on ties") {
    // same graph as above; scores make a non-minimal member win in each
    // component, and 11/12 tie so the smaller id must win
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val scored = Seq(1L -> 0.1, 2L -> 0.9, 3L -> 0.5, 4L -> 0.2,
      10L -> 0.3, 11L -> 0.8, 12L -> 0.8, 20L -> 0.4, 21L -> 0.6,
      30L -> 1.0).toDF("id", "score")
    val best = Dedup.keepBestByScore(pairs, scored, "id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // singleton 30 excluded even with the top score
    assert(best === Set(
      (1L, 2L, 4L, 0.9),
      (10L, 11L, 3L, 0.8),
      (20L, 21L, 2L, 0.6)))
  }

  test("sampleFrames skips frameless/undecoded items; string ids survive the salted Jaccard join") {
    val feats = Seq((1L, 10L), (2L, 0L), (3L, 3L)).toDF("media_id", "n_frames")
      .unionByName(Seq(4L).toDF("media_id")
        .withColumn("n_frames", lit(null).cast("long")))
    val sampled = Multimodal.sampleFrames(feats, k = 4)
      .select($"media_id", $"frame_idx").as[(Long, Long)].collect().toSet
    // item 2 (zero frames) and item 4 (null) emit nothing; item 3 emits
    // each of its 3 frames once
    assert(sampled === Set((1L, 0L), (1L, 2L), (1L, 5L), (1L, 7L),
      (3L, 0L), (3L, 1L), (3L, 2L)))

    // non-numeric ids: the salt is a hash, not pmod of the id itself —
    // a raw pmod would cast the string to NULL and silently join nothing
    val sdocs = Seq(("a", "x", "the cat sat on the mat"),
      ("b", "x", "the cat sat on the mat today")).toDF("doc_id", "lang", "text")
    val pairs = Dedup.ngramJaccardPairs(sdocs, "doc_id", "text", 2, 0.2, Seq("lang"))
      .select($"id_a", $"id_b").as[(String, String)].collect().toSeq
    assert(pairs === Seq(("a", "b")))
  }

  test("contamination counts: shared distinct shingles vs a benchmark set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),     // shares "the quick brown", "quick brown fox" with b1
      (2L, "totally different words here"),  // no overlap
      (3L, "the quick brown fox jumps the quick brown fox jumps")) // distinct shingles overlap same 2 + wrap grams
      .toDF("doc_id", "text")
    val bench = Seq((10L, "the quick brown fox")).toDF("doc_id", "text")
    val got = Dedup.contaminationCounts(corpus, bench, "doc_id", "text", n = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1: trigrams {the quick brown, quick brown fox, brown fox jumps}
    //        -> 2 hits; doc 2 absent (no hits); doc 3: distinct trigrams
    //        include the same 2 benchmark grams -> 2 hits
    assert(got === Seq((1L, 2L), (3L, 2L)))

    // the single-table split variant (one shingle pass + persist) must
    // agree exactly with the two-slice form it replaces in q72
    val union = corpus.withColumn("grp", lit("c"))
      .unionByName(bench.withColumn("grp", lit("b")))
    val split = Dedup.contaminationCountsSplit(union, $"grp" === "b", "doc_id", "text", n = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(split === got)
  }

  test("repeated spans: cross-document window sharing, unique docs at zero") {
    val d = Seq(
      (1L, "a b c d e f g h i j"),  // 8-token windows: a..h, b..i, c..j
      (2L, "a b c d e f g h x y"),  // shares exactly the a..h window with doc 1
      (3L, "p q r s t u v w"))      // one window, held by nobody else
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(d, "doc_id", "text", n = 8)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 0L)))
  }

  test("langId is deterministic and rolling fingerprint is stable") {
    val a = docs.select(TextAnalysis.langId($"text").as("l"),
      TextAnalysis.rollingFingerprint($"text").as("f")).collect()
    val b = docs.select(TextAnalysis.langId($"text").as("l"),
      TextAnalysis.rollingFingerprint($"text").as("f")).collect()
    assert(a.sameElements(b))
  }

  test("stripCommonSegments removes segments shared by >= maxDocs docs, keeps order") {
    val d = Seq(
      (1L, "foo bar a b"),          // shared seg + unique tail
      (2L, "foo bar c d"),
      (3L, "foo bar e f"),
      (4L, "x y"),                  // untouched
      (5L, "foo bar foo bar"))      // in-doc repeat counts its doc ONCE
      .toDF("doc_id", "text")
    val got = Dedup.stripCommonSegments(d, "doc_id", "text", segTokens = 2, maxDocs = 3)
      .select($"id", $"n_segs", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 2L, 1L, "a b"),
      (2L, 2L, 1L, "c d"),
      (3L, 2L, 1L, "e f"),
      (4L, 1L, 0L, "x y"),
      (5L, 2L, 2L, "")))            // fully-boilerplate doc -> empty, not null
  }

  test("stripCommonSegments below threshold is whitespace-normalizing identity") {
    val d = Seq((1L, "a b  c"), (2L, "d e")).toDF("doc_id", "text")
    val got = Dedup.stripCommonSegments(d, "doc_id", "text", segTokens = 2, maxDocs = 2)
      .select($"id", $"n_removed", $"clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, "a b c"), (2L, 0L, "d e")))
  }

  test("minhash calibration: identical docs at exactly 1e6 both ways; estimate sane on corpus") {
    val twins = Seq((1L, "x y z w v u t s"), (2L, "x y z w v u t s"),
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val cal = Dedup.minHashCalibration(twins, "doc_id", "text",
      n = 2, bands = 21, rowsPerBand = 3)
    val pair = cal.filter($"id_a" === 1L && $"id_b" === 2L)
      .select($"n_match", $"est_micro", $"exact_micro")
      .as[(Long, Long, Long)].collect()
    assert(pair.toSeq === Seq((63L, 1000000L, 1000000L)))
    // corpus-wide: estimates bounded and centered — mean |est - exact|
    // within the ~sqrt(J(1-J)/63) band (loose 3x cushion)
    val errs = Dedup.minHashCalibration(docs, "doc_id", "text",
        n = 2, bands = 21, rowsPerBand = 3)
      .select((abs($"est_micro" - $"exact_micro")).as("e"), $"n_match")
      .as[(Long, Long)].collect()
    assert(errs.nonEmpty)
    assert(errs.forall { case (_, m) => m >= 0L && m <= 63L })
    val mae = errs.map(_._1).sum.toDouble / errs.length
    assert(mae < 200000.0, s"calibration MAE $mae micro too large")
  }

  test("lshPlan: one wide band catches everything, one long row catches nothing") {
    val rows = Similarity.lshPlan(spark, nHashes = 128, threshold = 0.7)
      .orderBy(col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.length == 8)
    val byB = rows.map(r => r._1 -> r).toMap
    // b=1, r=128: P(s) = s^128 ~ 0 below 0.7 -> near-zero FP, huge FN
    assert(byB(1L)._3 < 50000L && byB(1L)._4 > 200000L)
    // b=128, r=1: P(s) = 1-(1-s)^128 ~ 1 everywhere -> huge FP, near-zero FN
    assert(byB(128L)._3 > 500000L && byB(128L)._4 < 50000L)
    // FP grows with b; FN shrinks with b (S-curve slides left)
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("syllableEstimate counts vowel groups") {
    import spark.implicits._
    val got = Seq("table", "strength", "query", "AEIOU", "zzz")
      .toDF("w").select(TextAnalysis.syllableEstimate(col("w")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 1L, 1L, 1L, 0L))
  }

  test("merkleRootBySlice: root is id-order sensitive and content sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x", "s"), (2L, "y", "s"), (3L, "z", "s"))
      .toDF("doc_id", "text", "source")
    val ra = Dedup.merkleRootBySlice(a, "doc_id", "text", "source", rounds = 4)
      .collect()(0)
    assert(ra.getAs[Long]("n_nodes") == 1L)
    assert(ra.getAs[Long]("n_docs") == 3L)
    // identical content, same order, different ids -> same root
    val b = Seq((10L, "x", "s"), (20L, "y", "s"), (30L, "z", "s"))
      .toDF("doc_id", "text", "source")
    val rb = Dedup.merkleRootBySlice(b, "doc_id", "text", "source", rounds = 4)
      .collect()(0)
    assert(rb.getAs[Long]("root_hash") == ra.getAs[Long]("root_hash"))
    // swapped order -> different root
    val c = Seq((1L, "y", "s"), (2L, "x", "s"), (3L, "z", "s"))
      .toDF("doc_id", "text", "source")
    val rc = Dedup.merkleRootBySlice(c, "doc_id", "text", "source", rounds = 4)
      .collect()(0)
    assert(rc.getAs[Long]("root_hash") != ra.getAs[Long]("root_hash"))
    // changed content -> different root
    val e = Seq((1L, "x", "s"), (2L, "y!", "s"), (3L, "z", "s"))
      .toDF("doc_id", "text", "source")
    val re = Dedup.merkleRootBySlice(e, "doc_id", "text", "source", rounds = 4)
      .collect()(0)
    assert(re.getAs[Long]("root_hash") != ra.getAs[Long]("root_hash"))
  }

  test("hashForest outliers: a far-away point lands in the sparsest leaves") {
    import spark.implicits._
    // dense blob near origin + one extreme point: the extreme point
    // must surface with the minimum density
    val pts = ((1L to 60L).map(k =>
      (k, (k * 37) % 1000L, (k * 91) % 1000L)) :+ ((999L, 900000L, 900000L)))
      .toDF("id", "a", "b")
    val got = HashForest.outliers(pts, "id", Seq("a", "b"),
      trees = 8, depth = 4, k = 5).orderBy(col("rnk")).collect()
    assert(got.head.getLong(0) == 999L,
      s"outlier not ranked first: ${got.map(_.getLong(0)).toSeq}")
    // occupancy of a leaf is at least 1 (the point itself)
    assert(got.forall(_.getLong(1) >= 1000L / 8))
  }

  test("minHashPairsAgainst equals the batch-corpus slice of the full pair set") {
    import spark.implicits._
    val d = graft.core.Tables.documents(spark, sfDir)
    val inc = Dedup.minHashPairsAgainst(d, col("doc_id") % 5 === 0,
        "doc_id", "text", n = 2, threshold = 0.2, bands = 21, rowsPerBand = 3)
      .select(col("batch_id"), col("corpus_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minHashLshPairs(d, "doc_id", "text",
        n = 2, threshold = 0.2, bands = 21, rowsPerBand = 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = full.flatMap { case (a, b) =>
      (if (a % 5 == 0 && b % 5 != 0) Seq((a, b)) else Nil) ++
        (if (b % 5 == 0 && a % 5 != 0) Seq((b, a)) else Nil)
    }.toSet
    assert(inc === expected)
  }
}
