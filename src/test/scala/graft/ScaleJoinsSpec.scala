package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.ScaleJoins

/** Bucketed joins must plan with zero shuffle exchanges; salted joins
  * must equal their unsalted twins row-for-row.
  */
class ScaleJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed co-located join has no shuffle Exchange") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val joined = ScaleJoins.bucketedJoin(spark, li, o, "l_orderkey", 8,
      "bkt_li", "bkt_o")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n${plan.take(2000)}")
    assert(joined.count() > 0)
  }

  test("salted join equals the plain join") {
    // skewed fixture: 90% of rows share one key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"v", $"name")
      .as[(Long, Int, String)].collect().toSet
    val salted = ScaleJoins.saltedJoin(big, small, "k", salts = 8)
      .select($"k", $"v", $"name").as[(Long, Int, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 7L) === 1800)
  }
}
