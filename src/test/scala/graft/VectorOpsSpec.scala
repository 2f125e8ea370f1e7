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

  test("incremental IVFPQ maintenance: recall parity with a full rebuild") {
    import graft.core.Tables
    import graft.ext.IvfIndex
    val emb = Tables.embeddings(spark, sfDir)
    val prior = emb.filter($"vec_id" % 10 =!= 0)
    val delta = emb.filter($"vec_id" % 10 === 0)
    val queries = emb.filter($"vec_id" % 50 === 1)
    val k = 5
    // exact micro-L2 top-k ground truth over the FULL corpus
    def micro(df: org.apache.spark.sql.DataFrame, id: String, out: String) =
      df.select($"vec_id".as(id), transform($"embedding",
        x => round(x.cast("double") * 1000000, 0).cast("long")).as(out))
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"ed".asc, $"n_id".asc)
    val exact = broadcast(micro(queries, "q_id", "qv"))
      .join(micro(emb, "n_id", "nv"), $"q_id" =!= $"n_id")
      .withColumn("ed", Pq.d2($"qv", $"nv"))
      .withColumn("rn", row_number().over(wEx))
      .filter($"rn" <= k).select($"q_id", $"n_id")
      .cache()
    val nq = queries.count()
    def recall(top: org.apache.spark.sql.DataFrame): Double =
      top.join(exact, Seq("q_id", "n_id")).count().toDouble / (nq * k)
    // (a) incremental: quantizers FROZEN on the prior corpus, delta
    //     assigned to the existing cells, index = appended tables
    val coarseP = IvfIndex.materializeLocal(spark,
      Pq.trainCodebooks(spark, prior, m = 1, subDim = 64, k = 8))
    val fineP = IvfIndex.materializeLocal(spark,
      Pq.trainCodebooks(spark, prior, m = 8, subDim = 8, k = 4))
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      Pq.encode(df, coarseP, m = 1, subDim = 64)
        .select($"vec_id", $"cid".as("cell"))
    val incTop = Pq.ivfPqServe(queries,
      cellsOf(prior).unionByName(cellsOf(delta)),
      Pq.encode(prior, fineP, m = 8, subDim = 8)
        .unionByName(Pq.encode(delta, fineP, m = 8, subDim = 8)),
      coarseP, fineP, dim = 64, nProbe = 2, m = 8, subDim = 8, k = k)
    // (b) full rebuild: quantizers retrained on prior + delta
    val coarseF = IvfIndex.materializeLocal(spark,
      Pq.trainCodebooks(spark, emb, m = 1, subDim = 64, k = 8))
    val fineF = IvfIndex.materializeLocal(spark,
      Pq.trainCodebooks(spark, emb, m = 8, subDim = 8, k = 4))
    val rebuildTop = Pq.ivfPqTopK(queries, emb, coarseF, fineF,
      dim = 64, nProbe = 2, m = 8, subDim = 8, k = k)
      .select($"q_id", $"n_id")
    val (ri, rf) = (recall(incTop), recall(rebuildTop))
    exact.unpersist(false)
    // a 10% delta must not cost meaningful recall vs retraining from
    // scratch (both numbers are deterministic on the fixed fixture)
    assert(ri >= rf - 0.15, s"incremental recall $ri << rebuild $rf")
    assert(ri > 0.0 && rf > 0.0, s"degenerate recalls: $ri / $rf")
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

  test("quantileNormalize maps each group onto the pooled scale") {
    // group A values {1..4}, group B values {101..104}: after
    // normalization both groups cover the pooled distribution's span,
    // and ranks map monotonically
    val df = (Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (5L, "B", 101L), (6L, "B", 102L), (7L, "B", 103L), (8L, "B", 104L)))
      .toDF("id", "grp", "v")
    val out = CorpusOps.quantileNormalize(df, "id", "grp", "v")
      .orderBy($"id").as[(Long, String, Long, Long, Long, Long, Long)].collect()
    // midpoint mapping of r∈{1..4} into N=8: target ranks 1,3,5,7
    assert(out.filter(_._2 == "A").map(_._6).toSeq === Seq(1L, 3L, 5L, 7L))
    // identical within-group ranks get identical normalized values
    val a = out.filter(_._2 == "A").map(r => r._4 -> r._7).toMap
    val b = out.filter(_._2 == "B").map(r => r._4 -> r._7).toMap
    assert(a === b)
  }

  test("krippendorffAlphaNominal: perfect agreement is exactly 1e6") {
    val ratings = for { item <- 1L to 9L; _ <- 1 to 3 } yield ("g", item, item % 3)
    val Array(alpha) = graft.ops.Eval.krippendorffAlphaNominal(
        ratings.toDF("grp", "item", "cat"), "grp", "item", "cat")
      .select($"alpha_micro").as[Long].collect()
    assert(alpha === 1000000L)
  }

  test("Pca.anisotropy: a one-axis cloud carries ~all variance on the top direction") {
    val rows = (0 until 40).map { i =>
      val v = Array.fill(8)(0.0f)
      v(2) = (if (i % 2 == 0) 10.0f else -10.0f)
      (i.toLong, v.toSeq)
    }
    val Array((n, _, _, _, ratio)) =
      graft.ext.Pca.anisotropy(embDf(rows: _*), "embedding", iters = 2)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(n === 40L && ratio > 990L && ratio <= 1001L, s"ratio=$ratio")
  }

  test("sourceInfluenceNb: a lying source loses accuracy without itself") {
    // each source has its OWN vocabulary: the full model supports
    // srcBad's label claims with srcBad's own counts (perfect
    // accuracy), while the LOO model has never seen its tokens — all
    // its docs collapse onto one prior-driven prediction and half the
    // labels flip. srcGood's vocabulary is shared with srcAlly, so its
    // LOO accuracy holds.
    val docs = (
      (1L to 8L).map(i => (i, "srcGood", if (i % 2 == 0) "en" else "xx",
        if (i % 2 == 0) "alpha alpha alpha" else "beta beta beta")) ++
      (21L to 28L).map(i => (i, "srcAlly", if (i % 2 == 0) "en" else "xx",
        if (i % 2 == 0) "alpha alpha alpha" else "beta beta beta")) ++
      (9L to 12L).map(i => (i, "srcBad", if (i % 2 == 0) "xx" else "en",
        if (i % 2 == 0) "gamma gamma gamma" else "delta delta delta"))
    ).toDF("doc_id", "source", "lang", "text")
    val out = graft.ext.LangModel.sourceInfluenceNb(docs, "doc_id", "text",
        "source", col("lang") === "en")
      .orderBy($"source").as[(String, Long, Long, Long, Long)].collect()
    val bad = out.find(_._1 == "srcBad").get
    val good = out.find(_._1 == "srcGood").get
    assert(bad._5 < 0, s"srcBad delta should be negative: $bad")
    assert(good._4 === 1000L, s"srcGood LOO accuracy should stay perfect: $good")
  }

  test("cdcChunkStats: duplicated documents duplicate their chunks") {
    // two identical long docs + one unique: the repeated doc's chunks
    // collide corpus-wide within the source, the unique one's don't
    val body = (1 to 40).map(i => f"tok$i%02d").mkString(" ")
    val docs = Seq(
      (1L, "sA", body), (2L, "sA", body),
      (3L, "sB", (41 to 80).map(i => f"tok$i%02d").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = graft.ext.Dedup.cdcChunkStats(docs, "doc_id", "text", "source")
      .orderBy($"source").as[(String, Long, Long, Long, Long, Long)].collect()
    val sA = out(0); val sB = out(1)
    assert(sA._2 === 2L && sA._3 === 2 * sA._4,
      s"identical docs must produce identical chunk streams: $sA vs $sB")
    assert(sA._5 === 500L, s"half of sA's chunks are repeats: $sA")
    assert(sB._5 === 0L, s"unique doc has no dup chunks: $sB")
  }

  test("fellegiSunterEm separates all-agree from all-disagree patterns") {
    // 10 pairs agree on both fields (true matches), 90 disagree on
    // both: after 2 EM rounds the all-agree pattern's posterior must
    // sit near 1, the all-disagree near 0, and the learned m > u
    val pairs = ((1 to 10).map(_ => (true, true)) ++
      (1 to 90).map(_ => (false, false))).toDF("a_x", "a_y")
    val out = graft.ops.FuzzyLink.fellegiSunterEm(pairs, Seq("a_x", "a_y"), 2)
      .orderBy($"a_x").collect()
    val lo = out(0); val hi = out(1)
    assert(hi.getAs[Long]("r_micro") > 900000L, s"all-agree: $hi")
    assert(lo.getAs[Long]("r_micro") < 100000L, s"all-disagree: $lo")
    assert(hi.getAs[Long]("m_a_x_micro") > hi.getAs[Long]("u_a_x_micro"))
  }

  test("rocSweep: threshold 0 is all-positive, above-max is all-negative") {
    val df = Seq((10L, true), (20L, true), (5L, false), (1L, false))
      .toDF("score", "gold")
    val out = graft.ops.Eval.rocSweep(df, "score", "gold", Seq(0L, 8L, 100L))
      .orderBy($"t").as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(out(0) === ((0L, 2L, 2L, 2L, 2L, 1000L, 1000L, 0L)))
    assert(out(1) === ((8L, 2L, 2L, 2L, 0L, 1000L, 0L, 1000L)))  // best J
    assert(out(2) === ((100L, 2L, 2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("heapsOls: a fresh-vocab-per-doc corpus fits slope ≈ 1") {
    // every doc introduces only new tokens → vocab == tokens exactly,
    // so ln-ln slope is exactly 1 and the fit is perfect
    val docs = (1 to 10).map(i =>
      ("g", i.toLong, (1 to 20).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("src", "id", "text")
    val Array((n, tt, vt, slope, r2)) =
      graft.ext.LangModel.heapsOls(docs, "src", "id", "text")
        .select($"n_points", $"tokens_total", $"vocab_total",
          $"slope_micro", $"r2_milli").as[(Long, Long, Long, Long, Long)]
        .collect()
    assert(n === 10L && tt === 200L && vt === 200L)
    assert(slope === 1000000L && r2 === 1000L, s"slope=$slope r2=$r2")
  }

  test("tokenDropout is deterministic and bounded by the drop rate") {
    val docs = Seq((7L, (1 to 200).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val run = () => graft.ext.CorpusOps.tokenDropout(docs, "doc_id", "text", 10)
      .as[(Long, Long, Long, Long)].collect().head
    val r1 = run(); val r2 = run()
    assert(r1 === r2, "same seed inputs must reproduce bit-identically")
    assert(r1._2 === 200L && r1._3 < 200L && r1._3 > 150L, s"kept=${r1._3}")
    // dropPct=0 keeps everything and fingerprints the original text
    val all = graft.ext.CorpusOps.tokenDropout(docs, "doc_id", "text", 0)
      .as[(Long, Long, Long, Long)].collect().head
    assert(all._3 === 200L)
  }

  test("wasserstein1dByGroup: shifted distribution measures the shift") {
    // B is A shifted by +10 → W1 = 10 exactly; C == A → W1 = 0
    val rows = (1L to 100L).flatMap(i => Seq(("A", i), ("B", i + 10), ("C", i)))
    val out = graft.ops.Drift.wasserstein1dByGroup(
        rows.toDF("grp", "v"), "grp", "v")
      .orderBy($"grp_a", $"grp_b")
      .as[(String, String, Long, Long, Long)].collect()
    val m = out.map(r => (r._1, r._2) -> r._5).toMap
    assert(m(("A", "B")) === 10000L)
    assert(m(("A", "C")) === 0L)
    assert(m(("B", "C")) === 10000L)
  }

  test("rulesTopK: lift ranks the exclusive pair above the ubiquitous one") {
    // items u,v in every basket (lift 1); items p,q only together in 2
    // of 10 baskets (lift 5)
    val rows = (1L to 10L).flatMap { b =>
      Seq((b, "u"), (b, "v")) ++ (if (b <= 2) Seq((b, "p"), (b, "q")) else Nil)
    }
    val out = graft.ops.Assoc.rulesTopK(rows.toDF("bk", "it"), "bk", "it",
        k = 10, minItem = 2L, minPair = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(out.head._1 === "p" && out.head._7 === 5000000L, s"${out.head}")
    assert(out.exists(r => r._1 == "u" && r._2 == "v" && r._7 == 1000000L))
    assert(out.head._6 === 1000L) // p -> q confidence is 100%
  }

  test("mixupAugment: λ=0 copies the partner, endpoints bound the mix") {
    // with the LCG λ fixed by ids, just pin structural invariants:
    // partner is the rank successor (wrapping), checksum within the
    // endpoint checksums' envelope per component bounds
    val rows = (0 until 6).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
    val out = graft.ext.Similarity.mixupAugment(
        rows.toDF("vec_id", "embedding"), "embedding")
      .orderBy($"id").as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 0L)) // wrap
    out.foreach { case (id, pid, lam, nd, cs, mn, mx) =>
      assert(nd === 4L && lam >= 0 && lam < 1000)
      val lo = math.min(id, pid) * 1000000L * 4
      val hi = math.max(id, pid) * 1000000L * 4
      assert(cs >= lo && cs <= hi, s"checksum $cs outside [$lo,$hi]")
      assert(mn === mx) // constant components stay constant
    }
  }

  test("conformalCalibrate covers ≈ the target rate on a clean cluster") {
    // one tight cluster per label: nonconformity ~ 0 for all, so
    // coverage is total
    val rows = (0 until 60).map { i =>
      val lab = i % 2
      (i.toLong, Seq.fill(4)((lab + 1).toFloat), lab)
    }
    val out = graft.ext.Ranking.conformalCalibrate(
        rows.toDF("vec_id", "embedding", "label"), "label", "embedding", 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 2)
    out.foreach { case (_, nCal, k, _, nTest, nCov, cov) =>
      assert(k <= nCal && nCov === nTest && cov === 1000L)
    }
  }

  test("labelNoiseKnn flags the vector planted inside the wrong cluster") {
    // two tight clusters; vector 99 sits in cluster A's space but
    // carries label B → all its neighbors disagree
    val rows = (0 until 20).map { i =>
      val lab = if (i < 10) 0 else 1
      val base = if (i < 10) 1.0f else -1.0f
      (i.toLong, Seq(base, 0.001f * i), lab)
    } :+ ((99L, Seq(1.0f, 0.0005f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Ranking.labelNoiseKnn(
        df.filter($"vec_id" === 99), df, "label", k = 5, suspectMin = 3)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(out === ((99L, 1L, 5L, 1000L, true)))
  }

  test("infoNceEval: a clean pair scores lower loss than a hard one") {
    // anchors 0 and 25: 0's positive is nearly identical (easy), 25's
    // positive is distant while a negative is close (hard)
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(1.0f, 0.01f), 0),
      (25L, Seq(0.0f, 1.0f), 1), (26L, Seq(0.7f, 0.7f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Ranking.infoNceEval(
        df.filter($"vec_id" % 25 === 0), df, "label")
      .orderBy($"q_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._3).toSeq === Seq(1L, 26L)) // nearest same-label
    assert(out(0)._7 < out(1)._7,
      s"easy pair must lose less: ${out(0)._7} vs ${out(1)._7}")
  }

  test("maxSimTopK: part-level matches beat a single-vector average") {
    // doc 1 matches query part 0 exactly and part 1 exactly (in
    // swapped slots); doc 2 is a mediocre match everywhere. MaxSim
    // rewards doc 1's per-part alignment.
    def v(parts: Seq[Seq[Double]]): Seq[Float] =
      parts.flatten.map(_.toFloat)
    val q = v(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val rows = Seq(
      (0L, q),
      (1L, v(Seq(Seq(0.0, 1.0), Seq(1.0, 0.0)))),  // swapped slots
      (2L, v(Seq(Seq(0.5, 0.5), Seq(0.5, 0.5)))))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.ext.Ranking.maxSimTopK(df.filter($"vec_id" === 0), df,
        m = 2, subDim = 2, k = 2)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect()
    // each query part finds its perfect match inside doc 1
    assert(out.head._3 === 1L && out.head._4 === 2000000L, s"${out.head}")
  }

  test("hac mergeLog joins the closest pair first and re-weights the centroid") {
    val items = Seq(
      (0L, Seq(1000000L, 0L), 2L),
      (1L, Seq(990000L, 10000L), 2L),   // nearly identical to 0
      (2L, Seq(-1000000L, 0L), 4L))
    val df = items.toDF("id", "cent", "size")
    val log = graft.ext.Hac.mergeLog(spark, df, rounds = 2)
      .orderBy($"rnd").as[(Long, Long, Long, Long, Long)].collect()
    assert(log(0)._2 === 0L && log(0)._3 === 1L && log(0)._5 === 4L)
    assert(log(1)._2 === 0L && log(1)._3 === 2L && log(1)._5 === 8L)
    assert(log(0)._4 < log(1)._4) // first merge is the tighter one
  }

  test("shardManifest: snake deal balances a linear token gradient") {
    // token counts 100, 99, ..., 1 over 2 shards: snake pairing
    // (1st+4th, 2nd+3rd, ...) keeps the split within one token
    val docs = (1 to 100).map(i => (i.toLong, (1 to (101 - i))
      .map(j => s"t$j").mkString(" "))).toDF("id", "text")
    val out = graft.ext.CorpusOps.shardManifest(docs, "id", "text", shards = 2)
      .orderBy($"shard").as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(50L, 50L))
    assert(math.abs(out(0)._3 - out(1)._3) <= 50L,
      s"snake split off balance: ${out.toSeq}")
    assert(out.forall(r => math.abs(r._4) <= 10L), s"dev too large: ${out.toSeq}")
  }

  test("dedupFlowMatrix charges dropped rows to the keeper's source") {
    val docs = Seq(
      (1L, "sA", "x x"), (2L, "sB", "x x"), (3L, "sB", "x x"),
      (4L, "sC", "y y")).toDF("doc_id", "source", "text")
    val out = graft.ext.Dedup.dedupFlowMatrix(docs, "doc_id",
        col("text"), "source")
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("sA", "sB", 2L))) // sA's id 1 keeps, sB loses 2 rows
  }

  test("clusterHomogeneity: label-pure cells score 1000 milli") {
    // vectors cluster exactly at their label's seed → H(label|cell)=0
    val rows = (0 until 40).map { i =>
      val lab = i % 4
      (i.toLong, Seq.fill(4)(lab.toFloat * 2 - 3), lab)
    }
    val out = graft.ext.IvfIndex.clusterHomogeneity(
        rows.toDF("vec_id", "embedding", "label"), "label", "embedding", k = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out._1 === 40L && out._4 === 0L && out._6 === 1000L, s"$out")
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
