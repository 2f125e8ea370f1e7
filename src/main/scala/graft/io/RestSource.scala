package graft.io

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal HTTP transport seam. Implementations must be Serializable —
  * per-row fan-outs ship the transport to executors. Production swaps in
  * a real client; tests (and this zero-egress sandbox) use mocks. The
  * seam is the entire HTTP surface the reference touches: method, URL,
  * headers, optional body.
  */
trait HttpTransport extends Serializable {
  def request(url: String, method: String = "GET",
              headers: Map[String, String] = Map.empty,
              body: Option[String] = None): HttpResponse
}

final case class HttpResponse(status: Int, body: String)

/** REST sources/sinks behind [[HttpTransport]]:
  *
  *  - Airtable paginated records → DataFrame (`airtable_to_df`,
  *    reference R/airtable.R:13-88): driver-side offset-following loop
  *    (pagination is inherently sequential and carries only page
  *    metadata), then ONE schema-on-read `spark.read.json` over the
  *    collected page bodies — records land distributed, never
  *    row-by-row appended on the driver;
  *  - Kobo per-submission validation-status GET fan-out
  *    (`get_validation_status`, R/validation-functions.R:502-592): a
  *    `mapPartitions` over the id set with a per-partition rate limiter
  *    (the reference's future_map + Sys.sleep shape, resilient to
  *    executor parallelism);
  *  - the rate-limited PATCH push reuses
  *    [[graft.pipeline.StatusSync.pushStatuses]] with a transport-backed
  *    update function.
  */
object RestSource {

  // thread-safe after construction; shared across all driver-side parses
  private val mapper = new ObjectMapper()

  /** Follow Airtable's offset pagination, returning raw page bodies.
    * Capped defensively — a server echoing the same offset forever must
    * not hang the pipeline.
    */
  private[io] def fetchPages(transport: HttpTransport, baseUrl: String,
                             token: String, maxPages: Int): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var offset: Option[String] = None
    var n = 0
    var done = false
    while (!done && n < maxPages) {
      val url = offset.fold(baseUrl)(o => s"$baseUrl?offset=$o")
      val resp = transport.request(url,
        headers = Map("Authorization" -> s"Bearer $token"))
      require(resp.status == 200, s"airtable GET $url failed: ${resp.status}")
      pages += resp.body
      val node = mapper.readTree(resp.body).get("offset")
      offset = Option(node).filterNot(_.isNull).map(_.asText())
      done = offset.isEmpty
      n += 1
    }
    // a truncated load must fail loudly, not look complete downstream
    require(done, s"airtable pagination did not terminate within $maxPages pages")
    pages.result()
  }

  /** `airtable_to_df`: all records of a table as a DataFrame with the
    * record id as `airtable_id` and each `fields` key as a column
    * (schema-on-read). Multi-valued fields collapse to a ", "-joined
    * string (`list_handler = "collapse"`) or their count (`"count"`),
    * mirroring R/airtable.R:74-81.
    */
  def airtableToDf(spark: SparkSession, transport: HttpTransport,
                   baseId: String, tableName: String, token: String,
                   listHandler: String = "collapse",
                   maxPages: Int = 10000): DataFrame = {
    val baseUrl = s"https://api.airtable.com/v0/$baseId/" +
      java.net.URLEncoder.encode(tableName, "UTF-8").replace("+", "%20")
    val pages = fetchPages(transport, baseUrl, token, maxPages)
    val raw = spark.read.json(spark.createDataset(pages)(Encoders.STRING))
    val records = raw.select(explode(col("records")).as("r"))
      .select(col("r.id").as("airtable_id"), col("r.fields.*"))
    records.schema.fields.foldLeft(records) {
      case (df, StructField(name, _: ArrayType, _, _)) => listHandler match {
        // elements cast to string individually: attachment/linked-record
        // fields infer as array<struct>, which array_join alone rejects
        // (no implicit struct -> string cast) — failing the whole load
        // for one column
        case "collapse" => df.withColumn(name,
          array_join(transform(col(s"`$name`"), _.cast("string")), ", "))
        case "count" => df.withColumn(name, size(col(s"`$name`")).cast("long"))
        case other => throw new IllegalArgumentException(s"unknown list_handler: $other")
      }
      case (df, _) => df
    }
  }

  private val statusSchema = StructType(Seq(
    StructField("submission_id", StringType),
    StructField("validation_status", StringType),
    StructField("validated_at", TimestampType),
    StructField("validated_by", StringType),
    StructField("fetch_error", BooleanType)))

  /** Kobo auth header: prefix "Token " unless already present
    * (R/validation-functions.R:516-518).
    */
  private[io] def koboAuth(token: String): String =
    if (token.startsWith("Token ")) token else s"Token $token"

  private[io] def koboStatusUrl(assetId: String, submissionId: String): String =
    s"https://eu.kobotoolbox.org/api/v2/assets/$assetId/data/$submissionId/validation_status/"

  /** Per-submission validation-status fan-out: GET each id's status,
    * rate-limited per partition. Response handling mirrors the
    * reference: 200 + uid → that status, 200 without → "not_validated",
    * non-200 → "not_validated", transport error → null status +
    * `fetch_error` (R/validation-functions.R:530-592). Aggregate QPS =
    * partitions / rateLimitMs — size with `ids.repartition(n)`.
    */
  def koboValidationStatuses(ids: DataFrame, transport: HttpTransport,
                             assetId: String, token: String,
                             rateLimitMs: Long = 100): DataFrame = {
    val auth = koboAuth(token)
    val enc = RowEncoder.encoderFor(statusSchema)
    ids.select(col("submission_id").cast("string"))
      .mapPartitions { rows =>
        val om = new ObjectMapper()
        rows.map { r =>
          val id = r.getString(0)
          val row = try {
            val resp = transport.request(koboStatusUrl(assetId, id),
              headers = Map("Authorization" -> auth))
            if (resp.status == 200) {
              val n = om.readTree(resp.body)
              val uid = Option(n.get("uid")).filterNot(_.isNull).map(_.asText())
              val by = Option(n.get("by_whom")).filterNot(_.isNull).map(_.asText())
              val ts = Option(n.get("timestamp")).filterNot(_.isNull)
                .map(t => new java.sql.Timestamp(t.asLong() * 1000L))
              Row(id, uid.getOrElse("not_validated"), ts.orNull, by.orNull, false)
            } else Row(id, "not_validated", null, null, false)
          } catch {
            case scala.util.control.NonFatal(_) => Row(id, null, null, null, true)
          }
          if (rateLimitMs > 0) Thread.sleep(rateLimitMs)
          row
        }
      }(enc)
  }

  /** Transport-backed update function for
    * [[graft.pipeline.StatusSync.pushStatuses]]: PATCH the validation
    * status of one submission (R/validation.R:1043-1075 shape).
    */
  def koboPatchUpdate(transport: HttpTransport, assetId: String,
                      token: String, status: String): String => Boolean = {
    val auth = koboAuth(token)
    // serialize via the mapper — a status containing a quote/backslash
    // must not produce a malformed request body
    val payload = {
      val node = mapper.createObjectNode()
      node.put("validation_status.uid", status)
      mapper.writeValueAsString(node)
    }
    id => transport.request(
      koboStatusUrl(assetId, id), method = "PATCH",
      headers = Map("Authorization" -> auth, "Content-Type" -> "application/json"),
      body = Some(payload)).status == 200
  }
}
