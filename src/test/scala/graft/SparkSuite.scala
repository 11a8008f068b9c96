package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per suite via lazy val). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // string-form registration = the cluster deployment path; every suite
    // exercises it (vs .withExtensions, the programmatic face)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()

  def sf0001 = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Count shuffle exchanges with AQE disabled (AQE wraps the executed
    * plan in AdaptiveSparkPlanExec, hiding children from collect;
    * sparkPlan is pre-EnsureRequirements and has no exchanges at all). */
  def countShuffles(mkDf: => org.apache.spark.sql.DataFrame): Int = {
    var n = -1
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      n = mkDf.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
    }
    n
  }
}
