package graft

import org.apache.spark.sql.functions._
import graft.ext.{CorpusOps, LangModel}

/** Golden-value checks for the corpus-trained scoring ops and the
  * profiling ops — hand-computed micro-nat values on a 2-doc corpus.
  */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a b"),
    (2L, "a b c")
  ).toDF("doc_id", "text")

  test("bpeApplyToVocab + fertility: hand-computed merge application") {
    // corpus "aa aa ab": round-1 merge = (a,a) (count 2 beats (a,b)'s 1)
    // apply: "aa" -> [aa] (1 subword), "ab" -> [a, b] (2)
    // fertility: 3 words, 1+1+2 = 4 subwords -> 4e6 div 3
    val d = Seq((1L, "aa aa ab", "g")).toDF("doc_id", "text", "lang")
    val merges = graft.ext.LangModel.bpeMerges(d, "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges === Seq((1L, "a", "a", 2L)), s"wrong merge: $merges")
    val sub = graft.ext.LangModel.bpeApplyToVocab(d, "text",
        merges.map(m => (m._2, m._3)))
      .as[(String, Long)].collect().toMap
    assert(sub === Map("aa" -> 1L, "ab" -> 2L), s"wrong segmentation: $sub")
    val fert = graft.ext.LangModel.bpeFertilityByGroup(d, "lang", "text", rounds = 1)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(fert === Seq(("g", 3L, 4L, 1333333L)), s"wrong fertility: $fert")
  }

  test("docNll matches hand-computed micro-nats") {
    // counts: a=3 b=2 c=1, N=6 → nll_micro a=693147 b=1098612 c=1791759
    val got = LangModel.docNll(docs, "doc_id", "text")
      .select($"id", $"n_tokens", $"sum_nll_micro", $"avg_nll_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 3L, 2L * 693147L + 1098612L, 828302L),
      (2L, 3L, 693147L + 1098612L + 1791759L, 1194506L)))
  }

  test("tfidfTopK ranks rare terms first, ties by token asc") {
    // n_docs=2: df(a)=df(b)=2 → idf 0; df(c)=1 → idf ln2 = 693147
    val got = LangModel.tfidfTopK(docs, "doc_id", "text", k = 3)
      .select($"id", $"rnk", $"tok", $"score_micro")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 0L),        // all-zero: token asc
      (2L, 1L, "c", 693147L), (2L, 2L, "a", 0L), (2L, 3L, "b", 0L)))
  }

  test("columnProfile counts nulls and distincts per column") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), None), (Some(2L), Some("y")), (None, Some("y"))
    ).toDF("id", "s")
    val got = CorpusOps.columnProfile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("id", 4L, 1L, 2L), ("s", 4L, 1L, 2L)))
  }

  test("histogram bins, counts, and ppm shares") {
    val df = Seq(0L, 49L, 50L, 149L).toDF("v")
    val got = CorpusOps.histogram(df, "v", width = 50L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 2L, 500000L), (50L, 1L, 250000L), (100L, 1L, 250000L)))
  }

  test("docEntropy: uniform -> ln(n_types) micro-nats, constant doc -> 0") {
    val d = Seq(
      (1L, "a b a b"),     // uniform over 2 types: ln 2 = 0.693147
      (2L, "x x x x"),     // single type: entropy 0
      (3L, "a a a b"))     // 3/4 ln(4/3) + 1/4 ln 4
      .toDF("doc_id", "text")
    val got = LangModel.docEntropy(d, "doc_id", "text")
      .select($"id", $"n_tokens", $"n_types", $"entropy_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 4L, 2L, 693147L)))
    assert(got(1) === ((2L, 4L, 1L, 0L)))
    // 0.75*287682 + 0.25*1386294 = 562335 (micro-nat rounding applied per type)
    val h3 = (3L * 287682L + 1L * 1386294L).toDouble / 4
    assert(got(2)._4 === math.round(h3))
  }

  test("meanPoolMicro: exact per-dimension integer-micro means") {
    val d = Seq(
      (1L, Array(1.0f, -2.0f)), (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.5f, 0.25f)))
      .toDF("grp", "emb")
    val got = graft.ext.Similarity.meanPoolMicro(d, "grp", "emb")
      .as[(Long, Long, Float)].collect().toSet
    assert(got === Set(
      (1L, 0L, 2.0f), (1L, 1L, 1.0f),
      (2L, 0L, 0.5f), (2L, 1L, 0.25f)))
  }

  test("knBigramNllBySource: KN probabilities sum to 1 over seen contexts") {
    import spark.implicits._
    // tiny corpus; check the model normalizes: for a context v with
    // c(v) mass, sum over the FULL cont-vocab of p(w|v) = 1 exactly
    // (discount mass redistributed by continuation weights)
    val docs = Seq(
      (1L, "a b a c a b", "s"), (2L, "b a b c", "s"), (3L, "c a", "s"),
      (7L, "a b c a", "s")).toDF("doc_id", "text", "source")
    val out = graft.ext.LangModel.knBigramNllBySource(docs, "doc_id", "text",
      "source", panelMod = 7)
    val row = out.collect()(0)
    assert(row.getAs[Long]("n_scored") > 0L)
    assert(row.getAs[Long]("kn_nll_micro") > 0L)
    // independent check of normalization in plain Scala
    val train = Seq("a b a c a b", "b a b c", "c a").flatMap { t =>
      val w = t.split(" "); w.zip(w.tail)
    }
    val cvw = train.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val cv = cvw.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val n1v = cvw.groupBy(_._1._1).map { case (k, m) => k -> m.size.toDouble }
    val contw = cvw.groupBy(_._1._2).map { case (k, m) => k -> m.size.toDouble }
    val tt = cvw.size.toDouble
    for (v <- cv.keys) {
      val mass = contw.keys.map { w =>
        (math.max(cvw.getOrElse((v, w), 0.0) - 0.75, 0.0)
          + 0.75 * n1v(v) * contw(w) / tt) / cv(v)
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"KN mass for '$v' = $mass")
    }
  }

  test("crossValNb: fold models never see their own fold (leakage canary)") {
    import spark.implicits._
    // the ONLY signal is a token whose label flips between folds:
    // a leaky model (trained on itself) would score 100%; the
    // leave-fold-out complement must score 0% on both folds
    val docs = ((0 until 10 by 2).map(i => (i.toLong, "aaa aaa aaa", true)) ++
      (1 until 10 by 2).map(i => (i.toLong, "aaa aaa aaa", false)))
      .toDF("doc_id", "text", "gold")
    val got = graft.ext.LangModel.crossValNb(docs, "doc_id", "text",
        col("gold"), k = 2)
      .orderBy(col("fold")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 5L, 0L), (1L, 5L, 0L)))
  }

  test("crossValNb: separable folds with shared signal reach full accuracy") {
    import spark.implicits._
    // signal token consistent across folds -> every complement model
    // learns it -> 100% everywhere
    val docs = (0 until 20).map { i =>
      (i.toLong, if (i % 3 == 0) "pos pos pos" else "neg neg neg", i % 3 == 0)
    }.toDF("doc_id", "text", "gold")
    val got = graft.ext.LangModel.crossValNb(docs, "doc_id", "text",
        col("gold"), k = 4)
      .collect().map(_.getLong(2)).toSeq
    assert(got.forall(_ == 1000L), s"got $got")
  }

  test("ppmiWordNeighbors: words with identical context profiles are mutual top neighbors") {
    import spark.implicits._
    // "cat" and "dog" appear in interchangeable contexts; "rock" never
    // shares them -> cat's top neighbor must be dog (cosine ~1)
    val docs = Seq(
      "the cat sat here", "the dog sat here", "the cat ran far",
      "the dog ran far", "a rock fell down", "a rock rolled down",
      "the cat sat here", "the dog sat here")
      .map(Tuple1(_)).toDF("text")
    val got = graft.ext.LangModel.ppmiWordNeighbors(docs, "text",
        dim = 16, window = 2, probes = 8, topK = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val catTop = got.filter(_._1 == "cat").minBy(_._2)
    assert(catTop._3 == "dog", s"cat's top neighbor: $catTop")
    assert(catTop._4 > 900000L, s"cat~dog cosine too low: $catTop")
  }
}
