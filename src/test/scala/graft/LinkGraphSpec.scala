package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg
import graft.ext.LinkGraph

/** Integer PageRank invariants + incremental-rollup algebra (the exact
  * cross-engine equality lives in the q114/q115 oracles; these pin the
  * structural properties).
  */
class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pagerank: symmetric ring -> identical ranks; repeat run bit-identical") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = LinkGraph.pageRankMicro(ring, iters = 4)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    assert(r.values.toSet.size === 1, s"ring ranks must be equal: $r")
    val r2 = LinkGraph.pageRankMicro(ring, iters = 4)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    assert(r === r2)
  }

  test("pagerank: star center outranks leaves; floor arithmetic never exceeds total mass") {
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L),
      (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("src", "dst")
    val r = LinkGraph.pageRankMicro(star, iters = 3)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(l => r(9L) > r(l)), s"center must dominate: $r")
    // floors only ever LOSE mass relative to the 1e12 total
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.sum > 900000000000L) // but not pathologically much
  }

  test("weighted pagerank: w=1 degenerates to exactly the unweighted operator") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 9L),
      (9L, 1L), (9L, 4L)).toDF("src", "dst")
    val unweighted = LinkGraph.pageRankMicro(edges, iters = 4)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    val weighted = LinkGraph.pageRankWeightedMicro(
        edges.withColumn("w", lit(1L)), iters = 4)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    assert(weighted === unweighted)
  }

  test("weighted pagerank: heavy edge steers the ring's mass") {
    // symmetric 3-ring except one edge is 9x heavier: its target must
    // outrank the others, and scaling ALL weights equally must not
    // change anything (div normalizes per-source)
    val w1 = Seq((1L, 2L, 9L), (2L, 3L, 1L), (3L, 1L, 1L),
      (1L, 3L, 1L), (3L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val r = LinkGraph.pageRankWeightedMicro(w1, iters = 4)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    assert(r(2L) > r(3L) && r(2L) > r(1L), s"heavy edge target must dominate: $r")
    val scaled = LinkGraph.pageRankWeightedMicro(
        w1.withColumn("w", $"w" * 1000L), iters = 4)
      .select($"node_id", $"rank_micro").as[(Long, Long)].collect().toMap
    assert(scaled === r, "per-source weight scaling must cancel")
    // floors only ever lose mass
    assert(r.values.sum <= 1000000000000L)
  }

  test("incremental rollup merge == full recompute, any split, any merge order") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"value")
    val keys = Seq("user_id", "event_type")
    val full = IncrementalAgg.rollupState(ev, keys, $"value")
      .as[(Long, String, Long, Long)].collect().toSet
    // three-way split on a hash, merged pairwise in two different orders
    val parts = (0 until 3).map(i =>
      IncrementalAgg.rollupState(ev.filter(pmod($"user_id", lit(3)) === i), keys, $"value"))
    val mergedA = IncrementalAgg.mergeStates(keys, parts: _*)
      .as[(Long, String, Long, Long)].collect().toSet
    val mergedB = IncrementalAgg.mergeStates(keys,
        IncrementalAgg.mergeStates(keys, parts(2), parts(0)), parts(1))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(mergedA === full)
    assert(mergedB === full)
  }

  test("partitionConductance: two triangles with one bridge score 1/7 each") {
    // triangle {1,2,3} + triangle {4,5,6} + bridge 3-4; partition by
    // triangle: cut = 1, vol = 7 each side -> conductance = 1/7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val assign = Seq((1L, "t1"), (2L, "t1"), (3L, "t1"),
      (4L, "t2"), (5L, "t2"), (6L, "t2")).toDF("id", "grp")
    val got = LinkGraph.partitionConductance(edges, assign)
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val c = math.round(1000000.0 / 7.0)
    assert(got === Seq(("t1", 3L, 7L, 1L, c), ("t2", 3L, 7L, 1L, c)))
  }

  test("partitionConductance: internal-only group has zero cut; singleton group null") {
    val edges = Seq((1L, 2L), (3L, 3L)).toDF("id_a", "id_b")
      .filter($"id_a" =!= $"id_b") // just the 1-2 edge
    val assign = Seq((1L, "a"), (2L, "a"), (9L, "z")).toDF("id", "grp")
    val got = LinkGraph.partitionConductance(edges, assign)
      .orderBy($"grp").collect()
    // group a holds the whole graph: cut 0, min-vol side is 0 -> null
    assert(got.length == 1)
    assert(got(0).getString(0) == "a" && got(0).getLong(3) == 0L)
    assert(got(0).isNullAt(4))
  }

  test("clusteringCoefficient: triangle scores 1, star center scores 0, leaf null") {
    // triangle {1,2,3} plus star edges 1-4, 1-5 (no closures among 4,5)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("id_a", "id_b")
    val got = LinkGraph.clusteringCoefficient(edges)
      .orderBy($"node_id").collect()
    val byN = got.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(byN(2L) == (2L, 1000000L)) // degree 2, its one wedge closes
    assert(byN(3L) == (2L, 1000000L))
    // node 1: degree 4, one triangle of 6 possible wedges -> 1/6
    assert(byN(1L)._1 == 4L && math.abs(byN(1L)._2 - 166667L) <= 1L)
    assert(byN(4L) == (1L, -1L)) // degree-1 leaf: undefined -> null
  }
}
