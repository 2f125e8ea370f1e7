package graft

import org.apache.spark.sql.functions._
import graft.io.{DocumentSink, MemDocStore}

/** S6/S7 connector-swap parity: the SAME DocumentSink calls drive two
  * different formats (the V2 in-memory connector and JSON-lines) and
  * round-trip identically — the "swap the format string for mongodb"
  * claim, exercised instead of asserted.
  */
class MemDocStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def flags = Seq(
    ("s1", "validation_status_approved", "ana"),
    ("s2", "validation_status_not_approved", "pipeline_bot"),
    ("s3", "validation_status_approved", "rui"))
    .toDF("submission_id", "validation_status", "validated_by")

  test("V2 connector round-trips documents through push/pull") {
    MemDocStore.drop("flags")
    DocumentSink.pushTo(flags, MemDocStore.Format, Map("collection" -> "flags"))
    val back = DocumentSink.pullFrom(spark, MemDocStore.Format, Map("collection" -> "flags"))
    assert(back.schema.fieldNames.toSeq ===
      Seq("submission_id", "validation_status", "validated_by"))
    assert(back.orderBy($"submission_id").collect().toSeq ===
      flags.orderBy($"submission_id").collect().toSeq)
  }

  test("overwrite truncates; collections are isolated") {
    MemDocStore.drop("a"); MemDocStore.drop("b")
    DocumentSink.pushTo(flags, MemDocStore.Format, Map("collection" -> "a"))
    DocumentSink.pushTo(flags.limit(1), MemDocStore.Format, Map("collection" -> "b"))
    // second overwrite of "a" replaces, never appends
    DocumentSink.pushTo(flags.filter($"submission_id" =!= "s2"),
      MemDocStore.Format, Map("collection" -> "a"))
    val a = DocumentSink.pullFrom(spark, MemDocStore.Format, Map("collection" -> "a"))
    val b = DocumentSink.pullFrom(spark, MemDocStore.Format, Map("collection" -> "b"))
    assert(a.count() === 2 && b.count() === 1)
    assert(a.filter($"submission_id" === "s2").count() === 0)
  }

  test("format swap: identical caller code, json vs V2 connector, same documents") {
    val dir = java.nio.file.Files.createTempDirectory("docstore").toString
    MemDocStore.drop("swap")
    DocumentSink.pushTo(flags, "json", Map("path" -> s"$dir/swap"))
    DocumentSink.pushTo(flags, MemDocStore.Format, Map("collection" -> "swap"))
    val viaJson = DocumentSink.pullFrom(spark, "json", Map("path" -> s"$dir/swap"))
      .select("submission_id", "validation_status", "validated_by")
    val viaMem = DocumentSink.pullFrom(spark, MemDocStore.Format, Map("collection" -> "swap"))
    assert(viaJson.orderBy($"submission_id").collect().toSeq ===
      viaMem.orderBy($"submission_id").collect().toSeq)
  }

  test("append with a different schema is rejected; matching append accumulates") {
    MemDocStore.drop("app")
    DocumentSink.pushTo(flags, MemDocStore.Format, Map("collection" -> "app"))
    flags.limit(1).write.format(MemDocStore.Format)
      .option("collection", "app").mode("append").save()
    assert(DocumentSink.pullFrom(spark, MemDocStore.Format,
      Map("collection" -> "app")).count() === 4)
    // ACCEPT_ANY_SCHEMA bypasses Spark's own check — the commit guard
    // must refuse rows encoded under a different schema
    val e = intercept[Exception] {
      Seq(("x", 1L)).toDF("other", "n").write.format(MemDocStore.Format)
        .option("collection", "app").mode("append").save()
    }
    assert(e.getMessage.contains("append to 'app'") ||
      Option(e.getCause).exists(_.getMessage.contains("append to 'app'")))
  }

  test("a filtered pull plans a V2 scan (the connector is a real source)") {
    MemDocStore.drop("scan")
    DocumentSink.pushTo(flags, MemDocStore.Format, Map("collection" -> "scan"))
    val q = DocumentSink.pullFrom(spark, MemDocStore.Format, Map("collection" -> "scan"))
      .filter($"validated_by" =!= "pipeline_bot")
    assert(q.count() === 2)
    assert(q.queryExecution.executedPlan.toString.contains("BatchScan memdoc.scan"))
  }
}
