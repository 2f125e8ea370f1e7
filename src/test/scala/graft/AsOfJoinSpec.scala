package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, ScaleJoins}

/** As-of join semantics on interleaved fixtures (the sf tables put all
  * orders before all events, so ties/interleave/no-match paths need
  * synthetic coverage), and the binned range join against an exhaustive
  * cross-join scan.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    // (k, t, event_id)
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 50L, 12L),
    (2L, 100L, 20L), // key with no right rows at all
    (3L, 99L, 30L)   // before every right row of its key
  ).toDF("k", "t", "event_id")

  private def right = Seq(
    // (k, t, rid, v)
    (1L, 100L, 1L, "a"),  // exactly at left t=100 → matches (at-or-before)
    (1L, 100L, 2L, "b"),  // same time, larger rid wins the tie
    (1L, 150L, 3L, "c"),
    (3L, 100L, 4L, "d")
  ).toDF("k", "t", "rid", "v")

  test("lastPrior: interleave, at-time tie → max unique, no-prior → null") {
    val got = AsOfJoin.lastPrior(left, right, "k", "t", "rid", Seq("v"))
      .select($"event_id", $"rid", $"v")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (e, r, v) => e -> ((r, v)) }.toMap
    assert(got(10L) === ((Some(2L), Some("b"))))  // tie at t=100: rid 2 > 1
    assert(got(11L) === ((Some(3L), Some("c"))))  // latest ≤ 200 is t=150
    assert(got(12L) === ((None, None)))           // t=50 precedes all
    assert(got(20L) === ((None, None)))           // key 2 has no right rows
    assert(got(30L) === ((None, None)))           // t=99 < first right at 100
  }

  test("lastPrior equals a naive per-row max_by scan on the sf tables") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select($"user_id".as("k"), $"ts".cast("long").as("t"), $"event_id")
    val osec = $"o_orderdate".cast("timestamp_ltz").cast("long")
    val ord = graft.core.Tables.orders(spark, sfDir)
      .select($"o_custkey".as("k"), osec.as("t"), $"o_orderkey")
    val got = AsOfJoin.lastPrior(ev, ord, "k", "t", "o_orderkey", Seq.empty)
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    // naive: join all prior orders, take (max t, then max key) per event
    val naive = ev.join(ord.withColumnRenamed("t", "rt"), Seq("k"))
      .filter($"rt" <= $"t")
      .groupBy($"event_id")
      .agg(max_by($"o_orderkey", struct($"rt", $"o_orderkey")).as("want"))
      .as[(Long, Long)].collect().toMap
    assert(naive.nonEmpty)
    naive.foreach { case (e, want) => assert(got(e) === Some(want), s"event $e") }
    // events absent from naive must have null matches
    (got.keySet -- naive.keySet).foreach(e => assert(got(e).isEmpty))
  }

  test("firstAfter mirrors lastPrior forward: at-time tie → max unique") {
    val got = AsOfJoin.firstAfter(left, right, "k", "t", "rid", Seq("v"))
      .select($"event_id", $"rid", $"v")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (e, r, v) => e -> ((r, v)) }.toMap
    assert(got(12L) === ((Some(2L), Some("b"))))  // t=50: first ≥ is t=100, tie → rid 2
    assert(got(10L) === ((Some(2L), Some("b"))))  // exactly at t=100 matches
    assert(got(11L) === ((None, None)))           // t=200: nothing after
    assert(got(30L) === ((Some(4L), Some("d"))))  // t=99 → right at 100
    assert(got(20L) === ((None, None)))
  }

  test("lastPriorWithin nulls out matches older than the horizon") {
    val got = AsOfJoin.lastPriorWithin(left, right, "k", "t", "rid", Seq("v"),
        maxAgeSec = 60L)
      .select($"event_id", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got(10L) === Some(2L))  // age 0 < 60
    assert(got(11L) === Some(3L))  // age 50 < 60
    assert(got(12L) === None)
    assert(got(20L) === None)
  }

  test("rangeCountByBins equals the exhaustive range scan") {
    // clustered + sparse times, including exact window boundaries
    val ts = Seq(0L, 1L, 59L, 60L, 61L, 100L, 119L, 120L, 121L, 500L,
      3600L, 3601L, 3659L, 3660L, 7200L)
    val points = ts.toDF("t")
    val anchors = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    for ((before, after, bin) <- Seq((60L, 60L, 60L), (0L, 120L, 60L), (30L, 30L, 7L))) {
      val got = ScaleJoins.rangeCountByBins(anchors, points, "id", "t",
          before, after, bin)
        .as[(Long, Long)].collect().toMap
      val naive = anchors.as[(Long, Long)].collect().map { case (id, at) =>
        id -> ts.count(pt => pt >= at - before && pt < at + after).toLong
      }.toMap
      assert(got === naive.filter(_._2 > 0L), s"window=($before,$after) bin=$bin")
    }
  }
}
