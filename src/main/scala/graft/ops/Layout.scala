package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning at scale: a 2-D
  * Morton (Z-order) interleave key. Range-partitioning and sorting a
  * 100 TB table by `zKey(x, y)` clusters rows that are close in BOTH
  * dimensions into the same files, so min/max file statistics prune
  * scans for predicates on either dimension — the standard remedy for
  * "partitioned by date, but queries also filter on key" layouts
  * (linear sort orders prune only their leading column).
  *
  * The key is built from div/mod integer arithmetic only (no native
  * bit intrinsics), which keeps it engine-portable: an external SQL
  * engine reproduces the exact key with the same `(x div 2^i) % 2`
  * terms, making layouts verifiable end-to-end.
  */
object Layout {

  /** Morton interleave of two non-negative integer columns, `bits`
    * low bits each (values must fit: 0 ≤ v < 2^bits — guard upstream).
    * Bit i of x lands at position 2i, bit i of y at 2i+1.
    */
  def zKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    // shifts+mask on the Spark side (codegen-friendly); the SQL text
    // below uses div/mod — identical for the non-negative domain
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Inverse of [[zKey]]: extract the x (dim=0) or y (dim=1)
    * coordinate back out of a Morton key — the round-trip check.
    */
  def zDecode(z: Column, bits: Int, dim: Int): Column = {
    require(dim == 0 || dim == 1, "dim must be 0 (x) or 1 (y)")
    val zl = z.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.plus(shiftleft(shiftright(zl, 2 * i + dim).bitwiseAND(lit(1L)), i))
    }
  }

  /** The equivalent DuckDB/ANSI SQL expression text for [[zKey]] —
    * generated from the same term list so oracle SQL can never drift
    * from the Scala implementation.
    */
  def zKeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($x // $p) % 2) * ${1L << (2 * i)} + (($y // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Sort a frame into Z-order: range-partition + in-partition sort by
    * the interleave key (the write-side layout step; a writer then
    * emits one file per partition whose min/max stats are tight in
    * both dimensions).
    */
  def zOrderBy(df: DataFrame, x: Column, y: Column, bits: Int,
               partitions: Int): DataFrame = {
    val keyed = df.withColumn("__z", zKey(x, y, bits))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
  }
}
