package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r16 item 7: the oracle result-type sweep as a GATE, not a
  * tool. The driver's hash canonicalization is type-representation-
  * sensitive: DuckDB widens SUM over integers to HUGEINT (and decimal
  * arithmetic to DECIMAL), and an aggregate OVER such a column — q165's
  * `MIN(m)` over a SUM-derived alias, round 15's one red row — lands a
  * 128-bit type in the result that hash-mismatches a bit-identical
  * Spark BIGINT. Commit 8cfdd50 added `tools/type_sweep.py` after that
  * class fired once, but a tool does not gate the NEXT new query; this
  * spec runs the same sweep (DuckDB-side result-type inspection of
  * every `SparkEntry.oracleSql` string) inside `sbt test`, so an
  * un-cast hazard column fails the suite before the driver ever hashes
  * it.
  *
  * The sweep needs the driver-side python3+duckdb (NOT a JVM
  * dependency — zero library additions); where that interpreter is
  * absent the test cancels rather than passes, so a green run always
  * means the sweep actually executed.
  */
class OracleTypeSweepSpec extends AnyFunSuite {

  test("type sweep: every oracle SQL yields Spark-representable DuckDB " +
      "result types (no HUGEINT/DECIMAL hash hazards)") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")
    assume(new java.io.File(sfDir).isDirectory, s"no testdata at $sfDir")
    val tool = new java.io.File("tools/type_sweep.py")
    assume(tool.isFile, "tools/type_sweep.py not found (run from repo root)")
    import scala.sys.process._
    val probe = try Process(Seq("python3", "-c", "import duckdb")).! == 0
                catch { case _: java.io.IOException => false }
    assume(probe, "python3+duckdb unavailable (driver-side interpreter)")

    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    try {
      java.nio.file.Files.writeString(tmp, Verify.oracleSqlJson)
      val log = new StringBuilder
      val code = Process(Seq("python3", tool.getPath, sfDir, tmp.toString))
        .!(ProcessLogger(l => log.append(l).append('\n'),
                         l => log.append(l).append('\n')))
      assert(code == 0,
        s"type sweep flagged oracle result types (cast the offending " +
          s"column to BIGINT/DOUBLE in BOTH the SQL and the Spark side):\n$log")
      assert(log.toString.contains(s"swept ${SparkEntry.oracleSql.size} queries"),
        s"sweep did not cover every oracle:\n$log")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
