package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the DuckDB oracle TYPE hazard (round-7 verdict
  * item #2). The driver's hasher is sensitive to each column's physical
  * type, not just its values: DuckDB widens `sum(BIGINT)` — including
  * WINDOW sums, the q197/q215 trap that stayed red for two rounds — to
  * HUGEINT, while Spark emits BIGINT; values compare equal in
  * tools/check.py but the driver hash diverges.
  *
  * This spec writes `SparkEntry.oracleSql` to a temp json (same escaping
  * as `graft.Verify`) and runs `tools/oracle_types.py`, which DESCRIBEs
  * every oracle over the sf0.001 tables (binder only — nothing executes)
  * and fails on any leaf type Spark cannot write to parquet (HUGEINT,
  * DECIMAL, unsigned/short ints, INTERVAL, ...). DuckDB is a driver-side
  * tool; if the python interpreter or the duckdb module is absent the
  * spec cancels rather than fails, so `sbt test` stays meaningful in
  * JVM-only environments while catching oracle regressions here.
  */
class OracleTypesSpec extends AnyFunSuite {

  private def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("every oracle column binds to a Spark-writable type in DuckDB") {
    val duckOk = Process(Seq("python3", "-c", "import duckdb")).!(
      ProcessLogger(_ => ())) == 0
    assume(duckOk, "python3+duckdb not available in this environment")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, json)
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/oracle_types.py",
        tmp.toString, "/root/testdata/sf0.001"),
      new java.io.File(".")).!(
      ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle type sweep failed:\n$out")
  }
}
