package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.CosineSim

/** Native CosineSim expression: SQL registration via GraftExtensions,
  * bit-parity with the HOF formulation, and input type checking.
  */
class CosineSimSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
    (2L, Array(1.0f, 2.0f, 3.0f), Array(-3.0f, 2.0f, -1.0f)),
    (3L, Array(0.5f, -0.5f, 0.25f), Array(0.1f, 0.9f, -0.4f))
  ).toDF("id", "a", "b")

  test("registered in SQL through GraftExtensions") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT id, cosine_sim(a, b) AS s FROM vecs WHERE id = 1").head()
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("matches the HOF formulation bit-for-bit") {
    val rows = df.select(
      CosineSim.cosineSim($"a", $"b").as("native"),
      Similarity.cosine($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("rejects non-float-array inputs at analysis time") {
    val bad = Seq((1, "x")).toDF("i", "s")
    val e = intercept[Exception] {
      bad.select(CosineSim.cosineSim($"s", $"s")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
