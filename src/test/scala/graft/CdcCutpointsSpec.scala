package graft

import org.apache.spark.sql.functions._
import graft.functions.{CdcCutpoints, PolyHash}

/** The rolling-hash CDC kernel against the naive per-window
  * formulation it replaced (q277's 5.8 s → 0.7 s rewrite): bit-equal
  * cut points on real text, plus the edge cases (short string, w=1,
  * invalid args).
  */
class CdcCutpointsSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(w: Int, mask: Int) = {
    val ln = length($"text")
    concat(array(lit(1)),
      when(ln - (w - 1) >= 1,
        filter(
          transform(
            filter(sequence(lit(1), greatest(ln - (w - 1), lit(1))),
              b => pmod(PolyHash.polyHash($"text".substr(b, lit(w))),
                lit(mask.toLong)) === 0L),
            b => b + w),
          s => s <= ln))
        .otherwise(array().cast("array<int>")))
  }

  test("rolling kernel ≡ naive per-window fold on the documents corpus") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = graft.core.Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val diff = docs
      .withColumn("fast", CdcCutpoints.cdcCutpoints($"text", lit(8), lit(32)))
      .withColumn("slow", naive(8, 32))
      .filter($"fast" =!= $"slow")
      .count()
    assert(diff === 0L)
  }

  test("short strings yield the single whole-text chunk start") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val out = Seq("ab").toDF("text")
      .select(CdcCutpoints.cdcCutpoints($"text", lit(8), lit(32)))
      .as[Seq[Int]].collect().head
    assert(out === Seq(1))
  }

  test("w = 1 cuts at every masked codepoint hash") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"text").limit(50)
    val diff = docs
      .withColumn("fast", CdcCutpoints.cdcCutpoints($"text", lit(1), lit(4)))
      .withColumn("slow", naive(1, 4))
      .filter($"fast" =!= $"slow").count()
    assert(diff === 0L)
  }

  test("invalid window/mask throw at the SQL surface") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      Seq("abcdefgh").toDF("text")
        .select(CdcCutpoints.cdcCutpoints($"text", lit(0), lit(32)))
        .collect()
    }
    assert(e.getMessage.contains("cdc_cutpoints") ||
      e.getCause != null && e.getCause.getMessage.contains("cdc_cutpoints"))
  }
}
