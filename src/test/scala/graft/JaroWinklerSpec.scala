package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, JaroWinkler}

/** Native Jaro-Winkler: reference values pinned against DuckDB's
  * jaro_winkler_similarity (probed directly — the q124 oracle then
  * re-verifies the whole cross product), plus codegen/interpreted
  * agreement and null propagation.
  */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private val refCases = Seq(
    // (a, b, duckdb jaro_winkler_similarity)
    ("martha", "marhta", 0.9611111111111111),     // boost, l=3
    ("dixon", "dicksonx", 0.8133333333333332),    // boost, l=2
    ("jellyfish", "smellyfish", 0.8962962962962964), // no shared prefix
    ("crate", "trace", 0.7333333333333334),       // jaro > .7 but l=0
    ("dwayne", "duane", 0.8400000000000001),
    ("abqqqqqq", "abzzzz", 0.5277777777777778),   // jaro <= .7: NO boost
    ("aeiouqqqqqqqq", "aeiouzzz", 0.6698717948717948), // prefix 5 but no boost
    ("abcdefghij", "abcdefzzzz", 0.8400000000000001), // prefix cap l=4
    ("ab", "ba", 0.0),                            // window 0 -> no matches
    ("x", "y", 0.0),
    ("abc", "abc", 1.0),
    ("", "", 0.0),                                // DuckDB: empty -> 0, not 1
    ("a", "", 0.0))

  test("matches the DuckDB reference values exactly") {
    refCases.foreach { case (a, b, want) =>
      val got = JaroWinkler.jw(a, b)
      assert(got === want, s"jw('$a','$b') = $got, want $want")
    }
  }

  test("codegen path equals the interpreted scalar on the part-name cross product") {
    GraftFunctions.ensureRegistered(spark)
    val names = graft.core.Tables.part(spark, sfDir).select($"p_name").distinct()
    val pairs = names.select($"p_name".as("a"))
      .crossJoin(names.select($"p_name".as("b")))
    val viaExpr = pairs
      .select($"a", $"b", JaroWinkler.jaroWinkler($"a", $"b").as("jw"))
      .as[(String, String, Double)].collect()
    viaExpr.foreach { case (a, b, got) =>
      assert(got === JaroWinkler.jw(a, b), s"codegen drift on ('$a','$b')")
    }
    assert(viaExpr.nonEmpty)
  }

  test("null propagates; symmetry holds") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler.jaroWinkler($"a", $"b").as("jw"))
      .collect()
    assert(r.head.isNullAt(0))
    refCases.foreach { case (a, b, _) =>
      assert(JaroWinkler.jw(a, b) === JaroWinkler.jw(b, a), s"asymmetric on ('$a','$b')")
    }
  }
}
