package graft

import org.apache.spark.sql.types._
import graft.core.Tables

/** Contract between the engine's loaders and the driver-generated
  * testdata. The testdata has been silently regenerated mid-project
  * before (round 6: `events.ts` flipped from parquet TIMESTAMP(NANOS)
  * stored as INT64 to plain `timestamp[us]`, which took out 43 oracle
  * queries at judging time). This spec pins the loader⇄data seam so any
  * future drift fails HERE, as one named local test, instead of as a
  * wall of red rows in the next round's correctness report.
  *
  * Two layers:
  *  1. every table loads and every column arrives as a type family the
  *     engine's query surface handles (no interval/struct surprises);
  *  2. the schema-adaptive normalizations hold: `Tables.events` always
  *     hands downstream code a TimestampType `ts` at micros precision,
  *     whatever the physical parquet encoding.
  */
class TestdataContractSpec extends SparkTestBase {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def supported(dt: DataType): Boolean = dt match {
    case _: IntegerType | _: LongType | _: DoubleType | _: FloatType |
         _: StringType | _: BooleanType | _: DateType | _: BinaryType |
         _: TimestampType | _: TimestampNTZType | _: DecimalType => true
    case ArrayType(et, _) => supported(et)
    case _ => false
  }

  test("every testdata table loads with only engine-supported column types") {
    tables.foreach { t =>
      val schema = Tables.table(spark, sfDir, t).schema
      assert(schema.nonEmpty, s"$t: empty schema")
      schema.foreach { f =>
        assert(supported(f.dataType),
          s"$t.${f.name}: unhandled physical type ${f.dataType} — " +
            "extend the loaders before the next verify run")
      }
    }
  }

  test("events.ts normalizes to TimestampType from the physical encoding") {
    val ts = Tables.events(spark, sfDir).schema("ts")
    assert(ts.dataType === TimestampType,
      s"Tables.events must hand queries a TimestampType ts, got ${ts.dataType}")
    // and it is actually populated + orderable (a zero-row or all-null
    // ts would green the type check while every temporal query degraded)
    val row = Tables.events(spark, sfDir)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.col("ts")),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("ts")))
      .head()
    assert(row.getLong(0) > 0, "events.ts has no non-null values")
  }

  test("normalizeEventTs handles all three physical encodings") {
    import spark.implicits._
    val micros = 1704067200000000L // 2024-01-01T00:00:00Z
    // raw INT64 nanos (the nanosAsLong legacy read)
    val nanos = Seq(micros * 1000L).toDF("ts")
    val fromNanos = Tables.normalizeEventTs(nanos).select($"ts").head.getTimestamp(0)
    // TIMESTAMP_NTZ (timestamp[us] with isAdjustedToUTC=false)
    val ntz = Seq(micros).toDF("us")
      .selectExpr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts")
    val fromNtz = Tables.normalizeEventTs(ntz).select($"ts").head.getTimestamp(0)
    // TIMESTAMP passes through
    val tz = Seq(micros).toDF("us").selectExpr("timestamp_micros(us) AS ts")
    val fromTz = Tables.normalizeEventTs(tz).select($"ts").head.getTimestamp(0)
    assert(fromNanos === fromTz, "nanos path disagrees with timestamp path")
    assert(fromNtz === fromTz, "NTZ path disagrees with timestamp path (session TZ must be UTC)")
    assert(Tables.normalizeEventTs(ntz).schema("ts").dataType === TimestampType)
    // unsupported encodings fail loudly, not silently
    val bad = Seq("x").toDF("ts")
    intercept[IllegalStateException](Tables.normalizeEventTs(bad))
  }
}
