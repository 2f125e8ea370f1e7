package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order key: exact round-trip, bijectivity, and the block-locality
  * bound that makes the layout prune (an aligned 2^2b-key block spans
  * at most 2^b values in EACH dimension).
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zKey round-trips and is a bijection on the full 6-bit grid") {
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val keyed = grid.select($"x", $"y", Layout.zKey($"x", $"y", 6).as("z"),
      Layout.zDecode(Layout.zKey($"x", $"y", 6), 6, 0).as("xd"),
      Layout.zDecode(Layout.zKey($"x", $"y", 6), 6, 1).as("yd"))
    assert(keyed.filter($"x" =!= $"xd" || $"y" =!= $"yd").count() === 0)
    assert(keyed.select($"z").distinct().count() === 64L * 64L)
    // keys cover exactly [0, 4096)
    val mm = keyed.agg(min($"z"), max($"z")).head()
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 4095L)
  }

  test("an aligned 256-key block bounds both dimensions to a 16-value range") {
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val blocks = grid.select(Layout.zKey($"x", $"y", 7).as("z"), $"x", $"y")
      .groupBy(expr("z div 256").as("b"))
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
    assert(blocks.filter($"dx" > 15 || $"dy" > 15).count() === 0)
  }

  test("zOrderBy sorts by the interleave key within range partitions") {
    val df = (0 until 500).map(i => (i.toLong % 23, i.toLong % 17)).toDF("x", "y")
    val laid = Layout.zOrderBy(df, $"x", $"y", 5, partitions = 4)
    // per-partition z sequences are non-decreasing
    val ok = laid.select(col("__z"))
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator.single(zs == zs.sorted)
      }.collect()
    assert(ok.forall(identity))
  }
}
