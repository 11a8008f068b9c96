package graft

import org.apache.spark.sql.functions._

/** AQE's skew-join handling is the runtime backstop this library's plans
  * rely on where salting is not pre-applied (VERDICT r1 called it the
  * q26 hot-band backstop) — pin that it actually fires on this Spark
  * build, with thresholds scaled to test data. */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits the skewed partition of a shuffle join (skew=true)") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one pathological key carrying 80% of all rows (fat payload so the
      // hot partition's shuffle bytes dwarf the 16KB/2x thresholds)
      val left = spark.range(50000)
        .select(when($"id" < 40000, lit(0L)).otherwise($"id" % 1000 + 1).as("k"),
          lpad($"id".cast("string"), 64, "x").as("pad"))
      val right = spark.range(1001).select($"id".as("k"), lit(1L).as("w"))
      val joined = left.join(right, "k")
      // run THIS QueryExecution (a count() would plan a separate query and
      // leave this one's adaptive plan untouched)
      val n = joined.collect().length
      assert(n === 50000) // every left row matches exactly one right key
      val planStr = joined.queryExecution.executedPlan.toString()
      assert(planStr.contains("isFinalPlan=true"), planStr)
      assert(planStr.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$planStr")
    }
  }

  test("control: the same join without skew carries no skew marker") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(5000)
        .select(($"id" % 1000).as("k"), lpad($"id".cast("string"), 64, "x").as("pad"))
      val right = spark.range(1000).select($"id".as("k"), lit(1L).as("w"))
      val joined = left.join(right, "k")
      assert(joined.collect().length === 5000)
      assert(!joined.queryExecution.executedPlan.toString().contains("skew=true"))
    }
  }
}
