package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectSize.sortedIntersectSize

/** Two-pointer intersection kernel vs the builtin `array_intersect` on
  * random sorted-distinct inputs (interpreted AND codegen paths both run
  * under the default spark settings).
  */
class SortedIntersectSpec extends SparkTestBase {
  import spark.implicits._

  test("matches size(array_intersect) on random sorted-distinct arrays") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      def arr() = Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(40)}").distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      sortedIntersectSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("empty and disjoint edges") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "c"), Seq("b", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c"))).toDF("a", "b")
    val got = df.select(sortedIntersectSize($"a", $"b")).as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 0L, 3L))
  }
}
