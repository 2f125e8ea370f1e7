package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Sketches, TextAnalysis}

/** Sketch invariants that the per-cell/per-bit oracle equality cannot
  * express: Bloom's no-false-negative guarantee, Count-Min's one-sided
  * error, and HLL's estimate accuracy against exact countDistinct.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("bloom screen has NO false negatives; filter is the distinct-bit set") {
    val keyed = docs.withColumn("key",
      concat_ws(" ", slice(TextAnalysis.tokens($"text"), 1, 2)))
    // probe the corpus WITH ITSELF: every verdict must be true
    val self = Sketches.bloomScreen(keyed, keyed, "key", m = 1024, k = 3)
    assert(self.filter(!$"might_contain").count() === 0L)
    val nBits = Sketches.bloomBits(keyed, "key", m = 1024, k = 3).count()
    assert(nBits <= 1024L)
    // membership of a key NOT in the corpus is allowed to be a false
    // positive but the EXACT members must all pass after appending it
    val probe = Seq("zzz not in corpus").toDF("key")
    val verdicts = Sketches.bloomScreen(keyed, probe, "key", m = 1024, k = 3)
      .select($"might_contain").as[Boolean].collect()
    assert(verdicts.length === 1) // one distinct probe key, one verdict
  }

  test("count-min estimate >= exact count for EVERY key (one-sided error)") {
    val toks = docs.select(explode(TextAnalysis.tokens($"text")).as("tok"))
    val counters = Sketches.countMinCounters(toks, "tok", d = 3, w = 64)
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
    val bad = Sketches.countMinLookup(counters, exact, "tok", d = 3, w = 64)
      .filter($"cm_estimate" < $"exact_n")
    assert(bad.count() === 0L, "count-min under-counted — impossible by construction")
    // total mass in each sketch row equals the stream length
    val total = toks.count()
    val rowTotals = counters.groupBy($"row").agg(sum($"cnt").as("t"))
      .select($"t").as[Long].collect()
    assert(rowTotals.forall(_ === total))
  }

  test("hll estimate tracks exact distinct within 20% (p=6 on vocab, p=8 on ids)") {
    val toks = docs.select(explode(TextAnalysis.tokens($"text")).as("tok"))
    val exactVocab = toks.select($"tok").distinct().count().toDouble
    val estVocab = Sketches.hllEstimate(Sketches.hllRegisters(toks, "tok", p = 6), p = 6)
    assert(math.abs(estVocab - exactVocab) / exactVocab < 0.2,
      s"hll vocab estimate $estVocab vs exact $exactVocab")
    // wider id domain, more buckets
    val ids = spark.range(5000).select(concat(lit("id-"), $"id").as("k"))
    val estIds = Sketches.hllEstimate(Sketches.hllRegisters(ids, "k", p = 8), p = 8)
    assert(math.abs(estIds - 5000.0) / 5000.0 < 0.2,
      s"hll id estimate $estIds vs exact 5000")
  }

  test("grouped hll slices == ungrouped hll of each slice") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val grouped = Sketches.hllRegistersBy(ev, Seq("event_type"), "user_id", p = 4)
    val types = ev.select($"event_type").distinct().as[String].collect()
    types.foreach { t =>
      val slice = Sketches.hllRegisters(ev.filter($"event_type" === t), "user_id", p = 4)
        .as[(Long, Long)].collect().toSet
      val grp = grouped.filter($"event_type" === t)
        .select($"bucket", $"register").as[(Long, Long)].collect().toSet
      assert(grp === slice, s"registers differ for $t")
      // per-group estimate within the usual band of exact distinct
      val exact = ev.filter($"event_type" === t)
        .select($"user_id").distinct().count().toDouble
      val est = Sketches.hllEstimate(
        grouped.filter($"event_type" === t).select($"bucket", $"register"), p = 4)
      assert(math.abs(est - exact) / exact < 0.45, // p=4 is coarse: 1.04/sqrt(16)=26% stderr
        s"group $t estimate $est vs exact $exact")
    }
  }
}
