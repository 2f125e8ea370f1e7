package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, LangModel}
import graft.ops.{Eval, Privacy}

/** Wave-25 operator specs: duplicated-span extraction semantics on
  * hand-checkable corpora (cross-doc runs, within-doc repeats, island
  * breaks), scrub remnants, the Naive Bayes seed classifier's sign /
  * OOV / split behavior, per-group NLL ≡ single-group NLL, Cohen's
  * kappa goldens, and the k-anonymity ladder census. Cross-engine
  * exactness lives in the q242–q247 oracles.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicatedSpans merges cross-document runs into maximal extents") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x x a b c d e f z z")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // shared run "a b c d e f": windows at doc1 pos 0..3, doc2 pos 2..5
    assert(spans === Set((1L, 0L, 5L, 6L), (2L, 2L, 7L, 6L)))
  }

  test("duplicatedSpans flags within-doc repeats and breaks islands at gaps") {
    val docs = Seq((3L, "p q r s p q r t")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // "p q r" occurs at pos 0 and 4; gap 4 > n=3 → two separate spans
    assert(spans === Set((3L, 0L, 2L, 3L), (3L, 4L, 6L, 3L)))
  }

  test("duplicatedSpanCoverage reports zero for clean docs and exact fractions") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x x a b c d e f z z"),
      (9L, "totally unique words here nine")).toDF("doc_id", "text")
    val cov = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(cov(1L) === ((1L, 8L, 1L, 6L, 750000L)))
    assert(cov(9L) === ((9L, 5L, 0L, 0L, 0L)))
  }

  test("scrubDuplicatedSpans emits remnants in order and drops short ones") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x x a b c d e f z z")).toDF("doc_id", "text")
    val segs = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 3, minTokens = 2)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    // doc1 span [0,5] leaves tail [6,7] "g h"; doc2 span [2,7] leaves
    // head [0,1] "x x" and tail [8,9] "z z"
    assert(segs === Set(
      (1L, 1L, 6L, 2L, "g h"),
      (2L, 1L, 0L, 2L, "x x"),
      (2L, 2L, 8L, 2L, "z z")))
    // minTokens = 3 drops every remnant
    assert(Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", 3, 3).count() === 0L)
  }

  test("scrubDuplicatedSpans keeps clean docs whole") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),
      (9L, "totally unique words here")).toDF("doc_id", "text")
    val segs = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 3, minTokens = 2)
      .filter($"id" === 9L).as[(Long, Long, Long, Long, String)].collect()
    assert(segs.toSeq === Seq((9L, 1L, 0L, 4L, "totally unique words here")))
  }

  test("naiveBayesClassify learns the seed signal and handles OOV on held-out docs") {
    val docs = Seq(
      (1L, "good good stuff", true, true),
      (2L, "good fine work", true, true),
      (3L, "bad awful mess", false, true),
      (4L, "bad bad thing", false, true),
      (5L, "good fine novelword", true, false),
      (6L, "bad awful novelword", false, false)).toDF("doc_id", "text", "g", "t")
    val out = LangModel.naiveBayesClassify(docs, "doc_id", "text", $"g", $"t")
      .as[(Long, Boolean, Boolean, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // train rows score their own class
    assert(out(1L)._7 === true && out(3L)._7 === false)
    // held-out rows: one OOV token each, classified by the seen tokens
    assert(out(5L)._5 === 1L && out(5L)._7 === true)
    assert(out(6L)._5 === 1L && out(6L)._7 === false)
    // split flag survives the aggregate
    assert(out(5L)._3 === false && out(1L)._3 === true)
  }

  test("docNllByGroup ≡ docNll restricted to one group") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val en = docs.filter($"lang" === "en")
    val single = LangModel.docNll(en, "doc_id", "text")
      .select($"id", $"n_tokens", $"sum_nll_micro", $"avg_nll_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    val grouped = LangModel.docNllByGroup(docs, "lang", "doc_id", "text")
      .filter($"grp" === "en")
      .select($"id", $"n_tokens", $"sum_nll_micro", $"avg_nll_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(single.nonEmpty && grouped === single)
  }

  test("cohenKappa golden: po=0.8 pe=0.5 → kappa=0.6") {
    val rows = (Seq.fill(4)((false, false)) ++ Seq.fill(1)((false, true)) ++
        Seq.fill(1)((true, false)) ++ Seq.fill(4)((true, true)))
      .map { case (a, b) => ("g", a, b) }
    val out = Eval.cohenKappa(rows.toDF("grp", "a", "b"), "grp", $"a", $"b")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().head
    assert(out === (("g", 10L, 4L, 1L, 1L, 4L, 800000L, 500000L, Some(600000L))))
  }

  test("cohenKappa reports null when both annotators are constant") {
    val df = Seq(("g", true, true), ("g", true, true)).toDF("grp", "a", "b")
    val out = Eval.cohenKappa(df, "grp", $"a", $"b")
      .select($"kappa_micro").as[Option[Long]].collect().head
    assert(out.isEmpty)
  }

  test("kAnonymityLadder census: violations shrink as the ladder coarsens") {
    val df = (Seq.fill(5)(("n1", "A")) ++ Seq.fill(2)(("n1", "B")) ++
      Seq.fill(1)(("n2", "A"))).toDF("nat", "seg")
    val out = Privacy.kAnonymityLadder(df, Seq(
        "full" -> Seq($"nat", $"seg"),
        "nat_only" -> Seq($"nat")), k = 3L)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, "full", 3L, 2L, 3L, 1L),
      (1L, "nat_only", 2L, 1L, 1L, 1L)))
  }

  test("lDiversityClasses flags homogeneous equivalence classes") {
    val df = Seq(
      ("n1", "x"), ("n1", "x"), ("n1", "x"),
      ("n2", "x"), ("n2", "y")).toDF("nat", "diag")
    val out = Privacy.lDiversityClasses(df, Seq($"nat"), $"diag", l = 2L)
      .select($"nat", $"class_size", $"n_sensitive", $"diverse")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(out === Set(("n1", 3L, 1L, false), ("n2", 2L, 2L, true)))
  }

  test("lDiversityReport: uniform class passes entropy, skewed 3-distinct class fails it") {
    import spark.implicits._
    // class A: 3 values x4 each (H = ln 3) -> both criteria pass;
    // class B: values 10,1,1 of 12 (3 distinct but H = 0.566 < ln 3)
    val rows =
      (1 to 4).flatMap(_ => Seq(("A", 1L), ("A", 2L), ("A", 3L))) ++
      (Seq.fill(10)(("B", 1L)) ++ Seq(("B", 2L), ("B", 3L)))
    val got = graft.ops.Privacy.lDiversityReport(rows.toDF("g", "sv"),
        Seq(col("g")), Seq("grp"), col("sv"), l = 3L)
      .orderBy(col("grp")).collect()
    val a = got(0); val b = got(1)
    assert(a.getAs[Long]("class_size") == 12L)
    assert(a.getAs[Boolean]("distinct_ok") && a.getAs[Boolean]("entropy_ok"))
    // ln 3 in micro = 1098612; uniform-thirds entropy sums to the same
    assert(math.abs(a.getAs[Long]("entropy_micro") - 1098612L) <= 2L)
    assert(b.getAs[Boolean]("distinct_ok") && !b.getAs[Boolean]("entropy_ok"))
  }

  test("dawidSkene recovers rater reliability ranking and the latent labels") {
    // truth = even item; raters 1-2 always agree with truth, rater 3
    // flips every third item — DS must (a) harden every posterior back
    // to the truth (n_pos = the 6 even items), (b) give the clean
    // raters a near-perfect profile, (c) rank rater 3 less informative
    val rows = for {
      item <- 1L to 12L
      (rater, flip) <- Seq((1L, false), (2L, false), (3L, item % 3 == 0))
    } yield (item, rater, (item % 2 == 0) != flip)
    val df = rows.toDF("item", "rater", "y")
    val r = Eval.dawidSkene(df, "item", "rater", "y", iters = 2)
      .orderBy(col("rater")).collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("n_items") == 12L))
    assert(r.forall(_.getAs[Long]("n_pos") == 6L), r.toSeq)
    def sep(i: Int) =
      r(i).getAs[Long]("pi1_micro") - r(i).getAs[Long]("pi0_micro")
    // clean raters converge toward (1, 0) — two EM rounds get within
    // ~2% (the flip items' posteriors are still hardening from the 2/3
    // majority-vote init; more rounds push further toward the clamp)
    assert(r(0).getAs[Long]("pi1_micro") > 950000L &&
      r(0).getAs[Long]("pi0_micro") < 50000L, r.toSeq)
    assert(sep(0) == sep(1), r.toSeq)
    assert(sep(0) > sep(2) && sep(2) > 0, r.toSeq)
  }
}
