package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.io.{HttpResponse, HttpTransport, RestSource}
import graft.pipeline.StatusSync

/** Mock-backed transport seam (S8/S12): Airtable offset pagination →
  * DataFrame, Kobo validation-status fan-out, rate-limited PATCH push —
  * request shapes (URL, method, headers, body) asserted against the
  * reference's (R/airtable.R:13-88, R/validation-functions.R:502-592).
  * Zero network: every spec drives a scripted [[HttpTransport]].
  */
class RestSourceSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side recording mock (pagination runs on the driver only). */
  private class PagedMock extends HttpTransport {
    val calls = ArrayBuffer.empty[(String, String, Map[String, String])]
    override def request(url: String, method: String,
                         headers: Map[String, String],
                         body: Option[String]): HttpResponse = {
      calls += ((url, method, headers))
      if (!url.contains("offset="))
        HttpResponse(200,
          """{"records": [
            |  {"id": "rec1", "fields": {"boat": "Nina", "gears": ["net", "line"], "n": 3}},
            |  {"id": "rec2", "fields": {"boat": "Pinta", "gears": ["trap"], "n": 1}}
            |], "offset": "itrP2"}""".stripMargin)
      else
        HttpResponse(200,
          """{"records": [
            |  {"id": "rec3", "fields": {"boat": "Santa Maria", "gears": ["net"], "n": 2}}
            |]}""".stripMargin)
    }
  }

  test("airtable source follows offset pagination and collapses list fields") {
    val mock = new PagedMock
    val df = RestSource.airtableToDf(spark, mock, "appBASE", "boat registry", "tok123")
    val got = df.orderBy($"airtable_id")
      .select($"airtable_id", $"boat", $"gears", $"n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("rec1", "Nina", "net, line", 3L),
      ("rec2", "Pinta", "trap", 1L),
      ("rec3", "Santa Maria", "net", 2L)))
    // two pages: first without offset, second echoing it back; table
    // name URL-encoded; bearer auth on every request
    assert(mock.calls.map(_._1) === Seq(
      "https://api.airtable.com/v0/appBASE/boat%20registry",
      "https://api.airtable.com/v0/appBASE/boat%20registry?offset=itrP2"))
    assert(mock.calls.forall(_._3("Authorization") == "Bearer tok123"))
  }

  test("airtable list_handler=count counts multi-valued fields") {
    val df = RestSource.airtableToDf(spark, new PagedMock, "appBASE", "t", "tok",
      listHandler = "count")
    val got = df.orderBy($"airtable_id").select($"gears").as[Long].collect().toSeq
    assert(got === Seq(2L, 1L, 1L))
  }

  test("collapse handles array-of-object fields (attachments) by stringifying elements") {
    val mock = new HttpTransport {
      override def request(url: String, method: String,
                           headers: Map[String, String],
                           body: Option[String]): HttpResponse =
        HttpResponse(200,
          """{"records": [{"id": "r1", "fields": {
            |  "boat": "Nina",
            |  "photos": [{"pid": "p1", "url": "u1"}, {"pid": "p2", "url": "u2"}]}}]}""".stripMargin)
    }
    val df = RestSource.airtableToDf(spark, mock, "appB", "t", "tok")
    val row = df.select($"boat", $"photos").head()
    assert(row.getString(0) === "Nina")
    assert(row.getString(1) === "{p1, u1}, {p2, u2}")
  }

  test("sketch aggregate accepts a SQL decimal literal for k") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x").createOrReplaceTempView("sk_t")
    val r = spark.sql(
      "SELECT b.lower_log, b.upper FROM (SELECT loc_scale_b_sketch(x, 3.0) AS b FROM sk_t)").head()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
  }

  test("kobo status fan-out mirrors the reference's response handling") {
    val ids = Seq("s1", "s2", "s3", "s4").toDF("submission_id")
    val got = RestSource.koboValidationStatuses(ids, KoboMock, "aFORM", "ktok",
        rateLimitMs = 0)
      .orderBy($"submission_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getTimestamp(2)).map(_.getTime),
        Option(r.getString(3)), r.getBoolean(4)))
      .toSeq
    assert(got === Seq(
      ("s1", "validation_status_approved", Some(1700000000000L), Some("ana"), false),
      ("s2", "not_validated", None, None, false),   // 200 with null validation data
      ("s3", "not_validated", None, None, false),   // non-200
      ("s4", null, None, None, true)))              // transport error -> fetch_error
  }

  test("rate-limited PATCH push sends the reference's request shape") {
    val ids = Seq("a1", "a2").toDF("submission_id")
    val update = RestSource.koboPatchUpdate(PatchMock, "aFORM", "Token ktok",
      StatusSync.NotApproved)
    val got = StatusSync.pushStatuses(spark, ids, StatusSync.NotApproved,
        rateLimitMs = 0)(update)
      .orderBy($"submission_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(got === Seq(
      ("a1", StatusSync.NotApproved, true), ("a2", StatusSync.NotApproved, true)))
    val calls = PatchMock.calls.toArray(Array.empty[(String, String, Option[String])]).toSeq
    assert(calls.map(_._1).sorted === Seq(
      "https://eu.kobotoolbox.org/api/v2/assets/aFORM/data/a1/validation_status/",
      "https://eu.kobotoolbox.org/api/v2/assets/aFORM/data/a2/validation_status/"))
    assert(calls.forall(_._2 == "PATCH"))
    // parse the body rather than substring-matching: the field value is
    // what the reference's PATCH shape requires, not the whitespace
    val bodyMapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(calls.forall(_._3.exists(b =>
      bodyMapper.readTree(b).get("validation_status.uid").asText() == StatusSync.NotApproved)))
  }
}

/** Executor-side mocks live at TOP level: a Scala top-level object
  * deserializes back to the module singleton (readResolve), so state
  * recorded inside local-mode tasks is visible to the driver assertion;
  * an object nested in the spec instance would deserialize to a copy.
  */

/** Scripted mock: behavior is a pure function of the request, assertions
  * ride back in the response data.
  */
private object KoboMock extends HttpTransport {
  override def request(url: String, method: String,
                       headers: Map[String, String],
                       body: Option[String]): HttpResponse = {
    // wrong auth shape → 500 → surfaces as a visibly wrong row
    if (headers.get("Authorization") != Some("Token ktok")) return HttpResponse(500, "")
    val id = url.split("/data/")(1).stripSuffix("/validation_status/")
    id match {
      case "s1" => HttpResponse(200,
        """{"uid": "validation_status_approved", "by_whom": "ana", "timestamp": 1700000000}""")
      case "s2" => HttpResponse(200, "{}")
      case "s3" => HttpResponse(404, "")
      case _ => throw new RuntimeException("connection reset")
    }
  }
}

/** PATCH recorder; tasks run concurrently, so the buffer is
  * thread-safe.
  */
private object PatchMock extends HttpTransport {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Option[String])]
  override def request(url: String, method: String,
                       headers: Map[String, String],
                       body: Option[String]): HttpResponse = {
    calls.add((url, method, body))
    HttpResponse(200, "{}")
  }
}
