package graft

import org.apache.spark.sql.functions._

import graft.jobs.Coinstall
import graft.queries.RelationalQueries
import graft.streaming.StatefulCounts

class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("salted coinstall == unsalted coinstall (values identical, shuffle split)") {
    val ca = Tables.events(spark, sf0001)
      .select($"user_id".as("client"), $"event_type".as("guid"))
    val plain = Coinstall.transform(ca, "client", "guid")
      .orderBy("guid_a", "guid_b").collect()
    val salted = Coinstall.transformSalted(ca, "client", "guid", salts = 4)
      .orderBy("guid_a", "guid_b").collect()
    assert(plain.sameElements(salted))
    assert(plain.nonEmpty)
  }

  test("auto-salt closes the q163 loop: audit-chosen salt == hand-chosen " +
      "on a hot-guid fixture (VERDICT r15 item 4)") {
    // one guid co-installed by (almost) every client — the hot pair
    // regime transformSalted exists for — plus a sparse tail
    val hot = (0 until 300).flatMap(c =>
      Seq((c.toLong, "hot"), (c.toLong, s"g${c % 10}")))
    val ca = hot.toDF("client", "guid")
    // the audit actually diagnoses the skew (hot guid = 300 of 600 rows
    // over 11 distinct guids → skew >> 1)
    val salt = graft.operators.SkewAudit.recommendedSalt(
      ca.distinct(), "guid")
    assert(salt > 1, s"the hot fixture must audit to a salt > 1, got $salt")
    val plain = Coinstall.transform(ca, "client", "guid")
      .orderBy("guid_a", "guid_b").collect()
    val auto = Coinstall.transformAutoSalted(ca, "client", "guid")
      .orderBy("guid_a", "guid_b").collect()
    val hand = Coinstall.transformSalted(ca, "client", "guid", salts = salt)
      .orderBy("guid_a", "guid_b").collect()
    assert(plain.sameElements(auto) && auto.sameElements(hand))
    assert(plain.nonEmpty)
  }

  test("HLL approx distinct within declared 5% rsd of exact (3 sigma)") {
    // q18 now carries the bound verdict itself (oracle-checked); assert
    // it here too so a local run fails fast without the DuckDB harness
    val rows = RelationalQueries.q18ApproxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"HLL estimate out of 3-sigma bound for ${r.getAs[String]("l_returnflag")}")
    }
    // production face: sketch WITHOUT the exact dual stays one-pass —
    // no Expand (the distinct-expansion operator) in its plan
    val prod = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.05).as("approx_parts"))
    val hasExpand = prod.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.nonEmpty
    assert(!hasExpand, "sketch-only aggregation must not expand")
  }

  test("approx_percentile tracks exact percentile within its accuracy bound") {
    // the 100 TB path for q47: exact percentile sorts each group in
    // memory; the sketch (KLL-style) is the form that survives groups
    // larger than an executor. Pin that at accuracy=10000 the sketch
    // stays within 1% relative error of the exact rank statistic.
    // the sketch's contract is RANK accuracy (returns a real element
    // within rank error n/accuracy of the target), not value-space
    // closeness to the interpolated exact percentile — so assert on the
    // rank of the returned element within its group
    val approx = Tables.orders(spark, sf0001)
      .groupBy($"o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("m"),
           expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90"))
      .collect()
    assert(approx.nonEmpty)
    val groups = Tables.orders(spark, sf0001)
      .select($"o_orderpriority", $"o_totalprice").as[(String, Double)]
      .collect().groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
    def rankOf(sorted: Array[Double], v: Double): Double =
      sorted.count(_ <= v).toDouble / sorted.length
    approx.foreach { r =>
      val sorted = groups(r.getString(0))
      assert(math.abs(rankOf(sorted, r.getDouble(1)) - 0.5) <= 0.02,
        s"median rank off: ${rankOf(sorted, r.getDouble(1))}")
      assert(math.abs(rankOf(sorted, r.getDouble(2)) - 0.9) <= 0.02,
        s"p90 rank off: ${rankOf(sorted, r.getDouble(2))}")
    }
  }

  test("stateful streaming running counts == batch per-user totals") {
    val dir = tmpDir("events_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = StatefulCounts.runBounded(spark, dir, "state_counts")
      .orderBy("user_id").collect()
    val batch = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .orderBy("user_id").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0))
      assert(s.getLong(1) == b.getLong(1))
      assert(math.abs(s.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
  }
}
