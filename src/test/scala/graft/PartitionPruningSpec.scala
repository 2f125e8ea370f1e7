package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** 100 TB posture: a month-partitioned fact directory read with a month
  * filter must prune to that month's partition at PLAN time (the scan
  * never lists, opens, or schedules the other months), and ordinary
  * predicates must reach the parquet reader as pushed filters. This is
  * the layout `graft.core.Tables`' scaladoc promises for production
  * (month-partitioned directories) — asserted here on a real write.
  */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("month filter prunes a month-partitioned scan to one partition") {
    val dir = Files.createTempDirectory("ppart").toString
    spark.range(1000)
      .selectExpr("id", "concat('2024-0', 1 + id % 4) AS month",
        "CAST(id % 97 AS DOUBLE) AS catch_kg")
      .write.partitionBy("month").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir)
      .filter($"month" === "2024-02" && $"catch_kg" > 10.0)
      .select($"id", $"catch_kg")
    read.collect()

    val scan = read.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // partition pruning: only month=2024-02's files are scheduled
    val monthFiles = Files.list(Paths.get(dir, "month=2024-02")).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    val totalFiles = (1 to 4).map(m => Files.list(Paths.get(dir, s"month=2024-0$m"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))).sum
    assert(monthFiles > 0 && totalFiles > monthFiles)
    assert(scan.metrics("numFiles").value === monthFiles,
      s"scan read ${scan.metrics("numFiles").value} files, expected only the $monthFiles in month=2024-02")
    // the month predicate is a PartitionFilter (metadata-level), and the
    // data predicate reached the parquet reader as a pushed filter
    val meta = scan.metadata
    assert(meta("PartitionFilters").contains("month"),
      s"month filter not in PartitionFilters: ${meta("PartitionFilters")}")
    assert(meta("PushedFilters").contains("GreaterThan(catch_kg"),
      s"catch_kg filter not pushed: ${meta("PushedFilters")}")
  }
}
