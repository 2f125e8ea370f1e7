package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Runtime registration of the engine's native expressions into an
  * EXISTING session — the complement of
  * [[graft.plans.GraftExtensions]], which only applies to sessions built
  * with `withExtensions`. Query entry points call this so they work
  * under any caller-provided session (the driver contract hands us the
  * session; we cannot assume how it was built).
  */
object GraftFunctions {
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("cosine_sim"))) {
      reg.createOrReplaceTempFunction("cosine_sim",
        exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("poly_hash"))) {
      reg.createOrReplaceTempFunction("poly_hash",
        exprs => PolyHash(exprs.head), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("jaro_winkler"))) {
      reg.createOrReplaceTempFunction("jaro_winkler",
        exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("sorted_intersect_size"))) {
      reg.createOrReplaceTempFunction("sorted_intersect_size",
        exprs => SortedIntersectSize(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("winnowing_mins"))) {
      reg.createOrReplaceTempFunction("winnowing_mins",
        exprs => WinnowingMins(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("cdc_cutpoints"))) {
      reg.createOrReplaceTempFunction("cdc_cutpoints",
        exprs => CdcCutpoints(exprs.head, exprs(1), exprs(2)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("weighted_quantile_sketch"))) {
      // num/den/eps must be foldable literals (evaluated at resolution)
      reg.createOrReplaceTempFunction("weighted_quantile_sketch",
        exprs => {
          def asLong(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
            e.eval() match {
              case i: Int => i.toLong
              case l: Long => l
              case x => throw new IllegalArgumentException(
                s"expected integer literal, got $x")
            }
          def asDouble(e: org.apache.spark.sql.catalyst.expressions.Expression): Double =
            e.eval() match {
              case d: Double => d
              case d: org.apache.spark.sql.types.Decimal => d.toDouble
              case n: Number => n.doubleValue()
              case x => throw new IllegalArgumentException(
                s"expected numeric literal, got $x")
            }
          WeightedQuantileSketch(exprs.head, exprs(1),
            asLong(exprs(2)), asLong(exprs(3)),
            if (exprs.length > 4) asDouble(exprs(4)) else 0.005)
        }, "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg"))) {
      // Spark's own runtime-filter bloom aggregate
      // (catalyst.expressions.aggregate.BloomFilterAggregate), exposed
      // by name: the optimizer injects it for runtime join pruning but
      // never registered it as a callable function. The engine uses it
      // to build PER-FILE bloom sidecars ([[graft.io.FileStats]]) whose
      // serialized form round-trips through
      // org.apache.spark.util.sketch.BloomFilter.readFrom for
      // driver-side planning probes. Args: (xxhash64'd LONG column,
      // estimated items literal, num bits literal).
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1), exprs(2)),
        "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_might_contain"))) {
      // per-ROW bloom membership (the sidecar planning probe): Spark's
      // own might_contain insists on a foldable/scalar-subquery filter
      // side, this one probes a binary COLUMN of serialized filters so
      // the test runs on executors and only matches reach the driver
      reg.createOrReplaceTempFunction("graft_bloom_might_contain",
        exprs => BloomMightContain(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_might_contain_any"))) {
      // batched twin: one sidecar pass answers a whole key batch
      reg.createOrReplaceTempFunction("graft_bloom_might_contain_any",
        exprs => BloomMightContainAny(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("loc_scale_b_sketch"))) {
      // k must be a foldable literal (evaluated at resolution time)
      reg.createOrReplaceTempFunction("loc_scale_b_sketch",
        exprs => LocScaleBSketch(exprs.head,
          exprs(1).eval() match {
            case d: Double => d
            // SQL `3.0` parses as a DECIMAL literal — Spark's Decimal is
            // not a java.lang.Number
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case n: Number => n.doubleValue()
            case x => throw new IllegalArgumentException(s"k must be a numeric literal, got $x")
          }), "built-in")
    }
  }
}
