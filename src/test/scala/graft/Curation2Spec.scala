package graft

import org.apache.spark.sql.functions._
import graft.ext.{CorpusOps, LinkGraph, Similarity}

/** Wave-26 operator specs: HITS golden values on a hand-walked bipartite
  * graph, temperature-mix weights/allocation, filter-funnel charging
  * semantics, and centroid-cosine geometry goldens.
  */
class Curation2Spec extends SparkTestBase {
  import spark.implicits._

  test("hitsMicro golden: two rounds on a 4-node bipartite graph") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val out = LinkGraph.hitsMicro(edges, iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    // round 1: a(10)=2e6, a(11)=1e6 → norm (1e6, 5e5); h(1)=1e6,
    // h(2)=1.5e6 → norm (666666, 1e6). round 2: a(10)=1666666,
    // a(11)=1e6 → norm (1e6, 600000); h(1)=1e6, h(2)=1.6e6 →
    // norm (625000, 1e6). Sources hold no authority, sinks no hub.
    assert(out === Set(
      (1L, 625000L, 0L), (2L, 1000000L, 0L),
      (10L, 0L, 1000000L), (11L, 0L, 600000L)))
  }

  test("temperatureMix: sqrt weights, exact-budget largest-remainder allocation") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(4)("b")).toDF("src")
    val out = CorpusOps.temperatureMix(df, "src", budget = 9L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("a") === ((1L, 1000000L, 333333L, 3L)))
    assert(out("b") === ((4L, 2000000L, 666666L, 6L)))
  }

  test("temperatureMix ties break by stratum name and the budget is exact") {
    val df = Seq("a", "b", "c", "d").toDF("src")
    val out = CorpusOps.temperatureMix(df, "src", budget = 10L)
      .select($"src", $"alloc").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 3L, "b" -> 3L, "c" -> 2L, "d" -> 2L))
  }

  test("filterFunnel charges each row to its FIRST failing rule; null = fail") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L),      // passes both
      (null, 1L),    // fails rule 0 (null)
      (0L, 0L),      // fails rule 0 (and would fail 1 — charged to 0)
      (1L, 0L)       // fails rule 1 only
    ).toDF("x", "y")
    val out = CorpusOps.filterFunnel(df, Seq(
        "x_pos" -> ($"x" > 0), "y_pos" -> ($"y" > 0)))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, "x_pos", 4L, 2L, 2L),
      (1L, "y_pos", 2L, 1L, 1L)))
  }

  test("jsDivergencePico: zero for identical distributions, hand-walked golden") {
    val docs = Seq(
      ("a", "x x y"), ("b", "x z z"), ("c", "x x y")).toDF("src", "text")
    val out = graft.ext.LangModel.jsDivergencePico(docs, "src", "text")
      .select($"grp_a", $"grp_b", $"jsd_pico")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // identical distributions → every term ln(2p/2p) = 0, no leftover
    assert(out(("a", "c")) === 0L)
    // hand-walk (a, b): shared token x (pa=2/3, pb=1/3), a-only mass
    // 1/3, b-only mass 2/3 — replay the op's exact double shape
    val pa = 2.0 / 3; val pb = 1.0 / 3
    val shared = math.round(
      (pa * math.log(2.0 * pa / (pa + pb))
        + pb * math.log(2.0 * pb / (pa + pb))) * 5e11)
    val aOnly = math.round(1.0 / 3 * math.log(2.0) * 5e11)
    val bOnly = math.round(2.0 / 3 * math.log(2.0) * 5e11)
    assert(out(("a", "b")) === shared + aOnly + bOnly)
    // sanity: the value is ~0.3749·1e12, inside the ln 2 bound
    assert(out(("a", "b")) > 370000000000L && out(("a", "b")) < 380000000000L)
  }

  test("groupTokenOverlap: exact Jaccard golden; sketch exact when k covers the union") {
    val docs = Seq(
      ("A", "a b c"), ("B", "b c d"), ("C", "x y")).toDF("src", "text")
    val out = graft.ext.Dedup.groupTokenOverlap(docs, "src", "text", k = 64)
      .select($"grp_a", $"grp_b", $"n_a", $"n_b", $"inter",
        $"jaccard_micro", $"est_micro", $"err_micro")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // |{a,b,c} ∩ {b,c,d}| = 2, union 4 → 0.5; k=64 ≥ union → est exact
    assert(out(("A", "B")) === (("A", "B", 3L, 3L, 2L, 500000L, 500000L, 0L)))
    assert(out(("A", "C")) === (("A", "C", 3L, 2L, 0L, 0L, 0L, 0L)))
    assert(out(("B", "C"))._5 === 0L)
  }

  test("groupDispersion: identical vectors cohere at 1e6; orthogonal pair at cos 45°") {
    val df = Seq(
      ("same", Array(1f, 0f)), ("same", Array(1f, 0f)),
      ("orth", Array(1f, 0f)), ("orth", Array(0f, 1f))).toDF("grp", "emb")
    val out = graft.ext.Similarity.groupDispersion(df, "grp", "emb")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("same") === ((2L, 1000000L, 1000000L, 1000000L)))
    // centroid (0.5, 0.5): each vector sits at cos 45° from it
    assert(out("orth") === ((2L, 707107L, 707107L, 707107L)))
  }

  test("pageRankPersonalizedMicro with seeds = all nodes ≡ global pageRankMicro") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val nodes = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    val global = LinkGraph.pageRankMicro(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    val pers = LinkGraph.pageRankPersonalizedMicro(edges, nodes, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(pers === global)
  }

  test("pageRankPersonalizedMicro concentrates mass near the seed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val out = LinkGraph.pageRankPersonalizedMicro(
        edges, Seq(1L).toDF("id"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // the disconnected {10, 11} cycle receives no seed mass at all
    assert(out(10L) === 0L && out(11L) === 0L)
    assert(out(1L) > 0L && out(2L) > 0L)
  }

  test("degreeAssortativity: star graph is perfectly disassortative, cycle undefined") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r = LinkGraph.degreeAssortativity(star)
      .select($"r_micro").as[Option[Long]].collect().head
    assert(r === Some(-1000000L))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (3L, 2L), (1L, 3L)).toDF("src", "dst")
    val rc = LinkGraph.degreeAssortativity(cycle)
      .select($"r_micro").as[Option[Long]].collect().head
    assert(rc.isEmpty) // constant degree → zero variance → null
  }

  test("kCorePeel: tail nodes peel off, the triangle is the 2-core; 3-core empty") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core2 = LinkGraph.kCorePeel(edges, k = 2L, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(LinkGraph.kCorePeel(edges, k = 3L, rounds = 3).count() === 0L)
  }

  test("groupCentroidCosines geometry goldens: orthogonal 0, identical 1e6") {
    val df = Seq(
      ("g1", Array(1f, 0f)), ("g1", Array(1f, 0f)),
      ("g2", Array(0f, 1f)),
      ("g3", Array(2f, 0f))).toDF("grp", "emb")
    val out = Similarity.groupCentroidCosines(df, "grp", "emb")
      .select($"grp_a", $"grp_b", $"cos_micro")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("g1", "g2")) === 0L)
    assert(out(("g1", "g3")) === 1000000L)
    assert(out(("g2", "g3")) === 0L)
  }
}
