package graft

import org.apache.spark.sql.functions._

/** Goldens for the round-9 late wave: k-truss pruning cascades and the
  * corpus BLEU/ROUGE closing arithmetic.
  */
class GraphTextSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("id_a", "id_b")

  test("ktruss: K4 survives k=4, pendant triangle is pruned") {
    // K4 on 1-4 (every edge support 2) + triangle {4,5,6} glued at 4:
    // its edges have support 1 → pruned at k=4; K4 intact with
    // support recomputed on the survivors
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val r = graft.ext.LinkGraph.kTruss(g, k = 4L, rounds = 2)
      .orderBy(col("id_a"), col("id_b")).collect()
    assert(r.length == 6, r.toSeq)
    assert(r.forall(_.getAs[Long]("support") == 2L))
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("ktruss: k=3 keeps any triangle edge, drops bridges") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L)) // bridge 3-9
    val r = graft.ext.LinkGraph.kTruss(g, k = 3L, rounds = 1)
      .collect()
    assert(r.length == 3)
    assert(r.forall(x => x.getLong(0) != 9L && x.getLong(1) != 9L))
    assert(r.forall(_.getAs[Long]("support") == 1L))
  }

  test("ktruss: cascade — losing a neighbor edge drops support next round") {
    // two triangles sharing edge (1,2): {1,2,3} and {1,2,4}, plus a
    // pendant edge 4-5. k=4: round 1 kills every edge with support < 2
    // — only (1,2) has support 2, but its triangles die with the other
    // edges, so round 2 kills (1,2) too: empty 4-truss
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (4L, 5L))
    val r = graft.ext.LinkGraph.kTruss(g, k = 4L, rounds = 2).collect()
    assert(r.isEmpty, r.toSeq)
  }

  test("bleu/rouge: identical pair scores 1e6 on both metrics") {
    val p = Seq(("s", 1L, "a b c d", "a b c d")).toDF("g", "pid", "c", "r")
    val out = graft.ext.LangModel.bleuRougeByGroup(p, "g", "pid", "c", "r")
      .collect().head
    assert(out.getAs[Long]("bleu_micro") == 1000000L, out)
    assert(out.getAs[Long]("rouge1_micro") == 1000000L)
  }

  test("bleu/rouge: hand-computed partial overlap") {
    // cand "a b c" vs ref "a b d": m1 = 2, m2 = 1 ("a b"),
    // p1 = 2/3, p2 = 1/2, BP = 1 (equal lengths),
    // BLEU = sqrt(1/3) ≈ 0.577350; ROUGE-1 recall = 2/3
    val p = Seq(("s", 1L, "a b c", "a b d")).toDF("g", "pid", "c", "r")
    val out = graft.ext.LangModel.bleuRougeByGroup(p, "g", "pid", "c", "r")
      .collect().head
    assert(out.getAs[Long]("m1") == 2L)
    assert(out.getAs[Long]("m2") == 1L)
    assert(out.getAs[Long]("bleu_micro") ==
      math.round(math.exp((math.log(2.0 / 3.0) + math.log(0.5)) / 2.0) * 1e6),
      out)
    assert(out.getAs[Long]("rouge1_micro") == 666667L)
  }

  test("bleu/rouge: clipping caps repeated candidate grams") {
    // cand "the the the the" vs ref "the cat": clipped m1 = 1 (ref has
    // ONE 'the'), m2 = 0 → bleu = 0; rouge = 1/2
    val p = Seq(("s", 1L, "the the the the", "the cat"))
      .toDF("g", "pid", "c", "r")
    val out = graft.ext.LangModel.bleuRougeByGroup(p, "g", "pid", "c", "r")
      .collect().head
    assert(out.getAs[Long]("m1") == 1L, out)
    assert(out.getAs[Long]("bleu_micro") == 0L)
    assert(out.getAs[Long]("rouge1_micro") == 500000L)
  }

  test("bleu/rouge: corpus pooling sums counts before ratios") {
    // two pairs in one group: (perfect 2-token) + (zero-overlap 2-token)
    // m1 = 2, c_len = 4 → p1 = 1/2 (NOT mean of 1 and 0 = pooled)
    val p = Seq(("s", 1L, "x y", "x y"), ("s", 2L, "a b", "c d"))
      .toDF("g", "pid", "c", "r")
    val out = graft.ext.LangModel.bleuRougeByGroup(p, "g", "pid", "c", "r")
      .collect().head
    assert(out.getAs[Long]("m1") == 2L)
    assert(out.getAs[Long]("m2") == 1L)
    assert(out.getAs[Long]("c_len") == 4L)
    // p1 = 2/4, p2 = 1/2, BLEU = 1/2
    assert(out.getAs[Long]("bleu_micro") == 500000L, out)
  }
}
