package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import graft.ext.Exec.EagerDf
import org.apache.spark.sql.types._

/** Validation-status synchronization — `sync_validation_submissions()` /
  * `export_validation_flags()` (reference R/validation.R:968-1160,
  * :1256-1330) and the rate-limited per-submission API fan-out
  * (`process_submissions_parallel`, R/validation-functions.R:800-840).
  *
  * Dataflow semantics (all DataFrame ops):
  *  - human approvals are never overwritten: manual-approved ids are
  *    anti-joined out of the flagged set (`setdiff` ≙ left_anti);
  *  - flagged → not_approved, clean → approved, already-approved clean
  *    ids skipped (another anti-join);
  *  - status reconciliation on export: preserve non-pipeline reviewers,
  *    else derive from alert_flag (case_when chain).
  *
  * Transport: the per-submission PATCH loop is a `mapPartitions` seam
  * with a per-partition rate limiter — the same shape as the reference's
  * future_map + Sys.sleep, but resilient to executor parallelism (each
  * task throttles independently; aggregate QPS = partitions / interval,
  * sized by repartitioning the id set). The HTTP call itself is a
  * pluggable function (stubbed in tests; zero-egress here).
  */
object StatusSync {

  val SystemUser = "pipeline_bot"
  val Approved = "validation_status_approved"
  val NotApproved = "validation_status_not_approved"

  /** Split ids into (toFlag, toApprove) honoring manual decisions. */
  def planUpdates(flags: DataFrame, currentStatus: DataFrame,
                  systemUser: String = SystemUser): (DataFrame, DataFrame) = {
    val manualApproved = currentStatus.filter(
      col("validation_status") === Approved &&
        col("validated_by").isNotNull && col("validated_by") =!= "" &&
        col("validated_by") =!= systemUser)
      .select("submission_id")
    val flagged = flags.filter(col("alert_flag").isNotNull)
      .select("submission_id").distinct()
      .join(manualApproved, Seq("submission_id"), "left_anti")
    val alreadyApproved = currentStatus
      .filter(col("validation_status") === Approved).select("submission_id")
    val clean = flags.filter(col("alert_flag").isNull)
      .select("submission_id").distinct()
      .join(alreadyApproved, Seq("submission_id"), "left_anti")
    (flagged, clean)
  }

  /** Export-time status reconciliation (R/validation.R:1267-1287). */
  def reconcile(flags: DataFrame, statuses: DataFrame,
                systemUser: String = SystemUser): DataFrame =
    flags.join(statuses, Seq("submission_id"), "full")
      .withColumn("validated_by",
        when(col("alert_flag").isNull, lit(systemUser)).otherwise(col("validated_by")))
      .withColumn("validation_status",
        when(col("validated_by").isNotNull && col("validated_by") =!= systemUser,
          col("validation_status"))
          .when(col("alert_flag").isNotNull, lit(NotApproved))
          .when(col("alert_flag").isNull, lit(Approved))
          .otherwise(col("validation_status")))
      .filter(col("submitted_by").isNotNull)

  private val resultSchema = StructType(Seq(
    StructField("submission_id", StringType),
    StructField("status", StringType),
    StructField("ok", BooleanType)))

  /** S12 — rate-limited per-submission update fan-out. `update` is the
    * transport (HTTP PATCH in production, stub in tests); each partition
    * sleeps `rateLimitMs` between calls, mirroring the reference's
    * 0.1–0.2 s/call budget.
    *
    * The result is EAGERLY materialized (localCheckpoint): the map is
    * side-effecting, and a lazy return would re-fire every PATCH on each
    * downstream action — e.g. a mere `orderBy` adds a range-sampling
    * pass that would double-send every update.
    */
  def pushStatuses(spark: SparkSession, ids: DataFrame, status: String,
                   rateLimitMs: Long)(update: String => Boolean): DataFrame = {
    val enc = RowEncoder.encoderFor(resultSchema)
    ids.select(col("submission_id").cast("string"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getString(0)
          val ok = update(id)
          if (rateLimitMs > 0) Thread.sleep(rateLimitMs)
          Row(id, status, ok)
        }
      }(enc)
      .checkpointEager()
  }
}
