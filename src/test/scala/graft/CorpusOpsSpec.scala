package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.CorpusOps

/** Corpus-preparation operators: hash split stability, two-phase
  * sequence packing vs a naive driver-side cumsum, stratified-sample
  * invariants. All deterministic (hash-based, no rand()).
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("hashSplit covers every row, respects percentages, and is append-stable") {
    val split = CorpusOps.hashSplit(docs, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val n = docs.count()
    assert(split.count() === n)
    assert(split.filter($"split".isNull).count() === 0)
    val byName = split.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    // the dominant range actually dominates
    assert(byName("train") > byName.getOrElse("val", 0L) &&
      byName("train") > byName.getOrElse("test", 0L))
    // append stability: assignment on a half-corpus equals the full-corpus
    // assignment restricted to it (membership is a function of the id)
    val half = CorpusOps.hashSplit(docs.filter($"doc_id" % 2 === 0), "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select($"doc_id", $"split")
    val full = split.select($"doc_id", $"split".as("split_full"))
    assert(half.join(full, "doc_id").filter($"split" =!= $"split_full").count() === 0)
  }

  test("packSequences equals the naive global cumsum and respects chunk bounds") {
    val budget = 64
    val packed = CorpusOps.packSequences(docs, "doc_id",
        graft.ext.TextAnalysis.tokenCount($"text"), budget)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // naive ground truth: driver-side running total in id order
    val counts = docs.select($"doc_id",
        graft.ext.TextAnalysis.tokenCount($"text").as("n"))
      .orderBy($"doc_id").as[(Long, Long)].collect()
    var running = 0L
    counts.foreach { case (id, nTok) =>
      val (n, start, cs, ce) = packed(id)
      assert(n === nTok)
      assert(start === running, s"doc $id start $start != $running")
      assert(cs === start / budget)
      assert(ce === (start + n - 1) / budget)
      assert(cs <= ce)
      running += nTok
    }
    assert(packed.size === counts.length)
  }

  test("epochShuffle is a permutation matching the naive global rank; epochs differ") {
    val n = docs.count()
    val e1 = CorpusOps.epochShuffle(docs, "doc_id", epoch = 1)
    // a permutation: positions are exactly 0..n-1
    assert(e1.select($"pos").distinct().count() === n)
    assert(e1.agg(min($"pos"), max($"pos")).as[(Long, Long)].head() === ((0L, n - 1)))
    // equals the definitional single-window rank
    val naive = e1.select($"id", $"h")
      .withColumn("expected",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"h", $"id")).cast("long") - 1)
    assert(e1.join(naive, Seq("id")).filter($"pos" =!= $"expected").count() === 0)
    // a different epoch yields a different permutation
    val e2 = CorpusOps.epochShuffle(docs, "doc_id", epoch = 2)
    val moved = e1.select($"id", $"pos")
      .join(e2.select($"id", $"pos".as("pos2")), "id")
      .filter($"pos" =!= $"pos2").count()
    assert(moved > 0, "epoch 2 produced the identical permutation")
  }

  test("chunkWindows covers every token, respects overlap, clips the tail") {
    val (win, step) = (64, 48)
    val chunks = CorpusOps.chunkWindows(docs, "doc_id",
        graft.ext.TextAnalysis.tokenCount($"text"), win, step)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, cs) => (id, cs.sortBy(_._3)) }
    val counts = docs.select($"doc_id",
        graft.ext.TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.keySet === counts.keySet)
    chunks.foreach { case (id, cs) =>
      val n = counts(id)
      // indices are 0..k-1; starts advance by step; windows clip at n
      assert(cs.map(_._3) === cs.indices.map(_.toLong).toArray)
      cs.foreach { case (_, nt, idx, start, end) =>
        assert(nt === n)
        assert(start === idx * step)
        assert(end === math.min(start + win, n))
      }
      // full coverage, no gap: consecutive windows overlap by win-step
      assert(cs.head._4 === 0L)
      assert(cs.last._5 === n)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._4 < a._5, s"gap in doc $id")
        case _ =>
      }
      // minimality: dropping the last chunk must lose coverage
      if (cs.length > 1) assert(cs(cs.length - 2)._5 < n)
    }
  }

  test("tokenBudgetSelect equals the naive best-first prefix under the budget") {
    val budget = 20000L
    val scored = docs.select($"doc_id",
      graft.ext.TextAnalysis.tokenCount($"text").as("n_toks"),
      graft.ext.TextAnalysis.qualityScore($"text").as("quality"))
    val got = CorpusOps.tokenBudgetSelect(scored, "doc_id", $"n_toks",
        "quality", budget)
      .select($"id", $"cum_tokens").as[(Long, Long)].collect().toMap
    // naive ground truth: sort best-first on the driver, walk the prefix
    val all = scored.as[(Long, Long, Double)].collect()
      .sortBy { case (id, _, q) => (-q, id) }
    var running = 0L
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    all.foreach { case (id, n, _) =>
      running += n
      if (running <= budget) expected(id) = running
    }
    assert(got === expected.toMap)
    assert(got.nonEmpty && got.size < all.length,
      "budget admits everything or nothing — fixture checks no boundary")
  }

  test("rebalanceToMix fills each quota with the stratum's smallest hash draws") {
    val weights = Seq.tabulate(20)(i =>
      s"src$i" -> (if (i % 2 == 0) 0.08 else 0.02))
    val total = 100L
    val got = CorpusOps.rebalanceToMix(docs, "source", "doc_id", weights, total)
    val perSource = got.groupBy($"source").count().as[(String, Long)].collect().toMap
    weights.foreach { case (src, w) =>
      assert(perSource.getOrElse(src, 0L) === math.floor(w * total).toLong,
        s"$src quota mismatch")
    }
    // the chosen ids ARE the quota-many smallest (hash, id) draws:
    // a quota <= stratifiedSample's k must select a prefix of its ranks
    val viaK = CorpusOps.stratifiedSample(docs, "source", "doc_id", 8)
      .select($"source", $"doc_id", $"draw_rank").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    got.select($"source", $"doc_id", $"draw_rank").as[(String, Long, Long)]
      .collect().groupBy(_._1).foreach { case (src, rows) =>
        val expect = viaK(src).sortBy(_._3).take(rows.length).map(_._2).toSet
        assert(rows.map(_._2).toSet === expect, s"$src not a rank prefix")
      }
    // absent stratum contributes nothing
    val partial = CorpusOps.rebalanceToMix(docs, "source", "doc_id",
      Seq("src0" -> 0.05), total)
    assert(partial.select($"source").distinct().as[String].collect() === Array("src0"))
  }

  test("stratifiedSample takes exactly min(k, |stratum|) per stratum, deterministically") {
    val k = 7
    val sampled = CorpusOps.stratifiedSample(docs, "source", "doc_id", k)
    val perStratum = sampled.groupBy($"source").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, sz) =>
      assert(perStratum.getOrElse(src, 0L) === math.min(k.toLong, sz))
    }
    // rerun yields the identical id set
    val a = sampled.select($"doc_id").as[Long].collect().toSet
    val b = CorpusOps.stratifiedSample(docs, "source", "doc_id", k)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    // ranks within a stratum are 1..taken
    val ranks = sampled.filter($"source" === sizes.keys.head)
      .select($"draw_rank").as[Long].collect().sorted
    assert(ranks === (1L to ranks.length).toArray)
  }

  test("quantileBuckets matches the naive sorted-rank formula; sizes differ by ≤1") {
    val withV = docs.select($"doc_id", ($"doc_id" * 37 % 101).as("v"))
    val k = 7
    val got = CorpusOps.quantileBuckets(withV, "doc_id", $"v", k)
      .select($"id", $"rn", $"bucket")
      .as[(Long, Long, Long)].collect()
    val n = got.length.toLong
    // naive: sort by (v, id) on the driver, same bucket formula
    val naive = withV.as[(Long, Long)].collect()
      .sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> ((i.toLong * k) / n, i.toLong + 1) }
      .toMap
    got.foreach { case (id, rn, b) =>
      assert((b, rn) === ((naive(id)._1, naive(id)._2)), s"id $id")
    }
    // equal-frequency: bucket sizes differ by at most one
    val sizes = got.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1)
    assert(got.map(_._3).distinct.sorted.toSeq === (0L until k).toSeq)
  }

  test("percentileNormalize: extremes at 0/1e6, ties by id, singleton stratum at 0") {
    val d = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("a", 4L, 30.0),                   // tie with id 2 -> later rank
      ("b", 5L, 99.0))                   // singleton stratum
      .toDF("src", "id", "score")
    val got = CorpusOps.percentileNormalize(d, "src", "id", col("score"))
      .select($"id", $"rank", $"n_stratum", $"pct_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, 4L, 0L),         // min -> 0
      (2L, 3L, 4L, 666666L),    // tied 30.0, smaller id first
      (3L, 2L, 4L, 333333L),
      (4L, 4L, 4L, 1000000L),   // max -> exactly 1e6
      (5L, 1L, 1L, 0L)))        // singleton defined as 0, not div-by-zero
  }

  test("doremiMixWeights: weights stay normalized and tilt toward the hard domain") {
    import spark.implicits._
    // source "rare" uses tokens the corpus barely sees -> higher NLL
    // under the global model -> EG must upweight it above uniform
    val docs = (
      (1 to 20).map(i => (i.toLong, "the the the the the", "common")) ++
      (21 to 24).map(i => (i.toLong, "zq xv qj zz vx", "rare"))
    ).toDF("doc_id", "text", "source")
    val got = graft.ext.CorpusOps.doremiMixWeights(docs, "doc_id", "text",
        "source", rounds = 3)
      .orderBy(col("source")).collect()
    val byS = got.map(r => r.getString(0) ->
      (r.getAs[Long]("nll_micro"), r.getAs[Long]("w_micro"))).toMap
    assert(byS("rare")._1 > byS("common")._1)
    assert(byS("rare")._2 > 500000L && byS("common")._2 < 500000L)
    val total = got.map(_.getAs[Long]("w_micro")).sum
    assert(total <= 1000000L && total >= 1000000L - got.length)
  }

  test("unimax: caps bind small sources, budget exactly consumed") {
    import spark.implicits._
    // caps at 1 epoch: 100, 200, 1000, 1000; budget 900 → small two
    // capped (100+200), remaining 600 split 300/300
    val per = Seq(("tiny", 100L), ("small", 200L), ("big1", 1000L),
      ("big2", 1000L)).toDF("source", "tokens")
    val r = graft.ext.CorpusOps.unimaxAllocate(per, budget = 900L,
      maxEpochsMilli = 1000L).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("alloc")).toMap
    assert(r == Map("tiny" -> 100L, "small" -> 200L,
      "big1" -> 300L, "big2" -> 300L), r)
  }

  test("unimax: remainder goes to the smallest-cap uncapped sources") {
    import spark.implicits._
    // budget 10 over three uncapped sources → 4, 3, 3 in cap order
    val per = Seq(("a", 100L), ("b", 200L), ("c", 300L))
      .toDF("source", "tokens")
    val r = graft.ext.CorpusOps.unimaxAllocate(per, budget = 10L,
      maxEpochsMilli = 1000L).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("alloc")).toMap
    assert(r == Map("a" -> 4L, "b" -> 3L, "c" -> 3L), r)
  }

  test("unimax: budget above total caps everything") {
    import spark.implicits._
    val per = Seq(("a", 100L), ("b", 200L)).toDF("source", "tokens")
    val r = graft.ext.CorpusOps.unimaxAllocate(per, budget = 5000L,
      maxEpochsMilli = 2000L).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("alloc")).toMap
    assert(r == Map("a" -> 200L, "b" -> 400L), r)
  }

  test("consistent-hash ring: all docs assigned, movement near 1/(n+1)") {
    val r = CorpusOps.consistentHashRebalance(docs, "doc_id",
      nShards = 8, vnodes = 4).collect()
    val n = docs.count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === n)
    // every shard should own something at 8x4 vnodes over >=100 docs
    assert(r.length === 8, r.mkString(","))
    val moved = r.map(_.getAs[Long]("n_moved")).sum
    // expected 1/9 ~ 11%; mod-N sharding would move ~8/9. Accept a wide
    // band but reject both degenerate (0) and mod-N-like (>40%) shapes.
    assert(moved > 0 && moved.toDouble / n < 0.40, s"moved=$moved of $n")
  }

  test("hashReservoir ≡ naive whole-stratum sort; partition-placement-independent") {
    import org.apache.spark.sql.expressions.Window
    val k = 7
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("sample_hash"), r.getAs[Long]("rnk"))).toSet
    val fast = key(CorpusOps.hashReservoir(docs, Seq("source"), "doc_id",
      k, "sA").collect())
    val P = 1000000007L
    val h0 = graft.functions.PolyHash.polyHash(
      concat(lit("sA|"), $"doc_id".cast("string")))
    val naive = key(docs
      .withColumn("sample_hash",
        pmod(pmod(h0 * h0, lit(P)) * 1103515245L + 12345L, lit(P)))
      .withColumn("rnk", row_number().over(Window.partitionBy($"source")
        .orderBy($"sample_hash", $"doc_id")).cast("long"))
      .filter($"rnk" <= k)
      .select($"source", $"doc_id", $"sample_hash", $"rnk").collect())
    assert(fast == naive, s"${(fast diff naive).take(3)}")
    // the two-phase local top-k must not depend on where rows land
    val reparted = key(CorpusOps.hashReservoir(docs.repartition(7),
      Seq("source"), "doc_id", k, "sA").collect())
    assert(reparted == fast)
    // a different salt is a fresh independent draw: with k = 3 below
    // the 7-doc stratum size, the selected id sets must differ (at
    // k = 7 every stratum is swallowed whole and any salt agrees)
    def ids(salt: String) = CorpusOps.hashReservoir(docs, Seq("source"),
      "doc_id", 3, salt).select($"source", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids("sA") != ids("sB"))
  }
}
