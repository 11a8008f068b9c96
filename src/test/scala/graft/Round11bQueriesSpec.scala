package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Late-round-11 additions: q137 EWMA anomaly detection (integer-exact
  * cross-multiplied flag), and friends. */
class Round11bQueriesSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "sec", "event_id", "value")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"value")

  // ---- q137: EWMA anomaly ----

  test("q137 fixture: spike against a flat history flags exactly once") {
    val events = ev(Seq(
      (1L, 1L, 1L, 1.00), (1L, 2L, 2L, 1.00),
      (1L, 3L, 3L, 1.00), (1L, 4L, 4L, 200.00),
      (2L, 1L, 5L, 42.00) // singleton: never scored
    ))
    val out = RelationalQueries.ewmaAnomalyCore(spark, events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    // user 1: first event unscored (no history); events 2-3 match the
    // flat EWMA exactly; event 4's |20000*224 - 22400| = 4_457_600 >
    // 15000*224 = 3_360_000 cents*den
    assert(out.toSeq == Seq((1L, 4L, 3L, 1L, 4L), (2L, 1L, 0L, 0L, -1L)))
  }

  test("q137 boundary: deviation == T*den is NOT an anomaly; one cent over is") {
    // one prior event at $1.00 (den=128, ewma=100c); threshold $150
    val at = ev(Seq((1L, 1L, 1L, 1.00), (1L, 2L, 2L, 151.00)))
    val over = ev(Seq((1L, 1L, 1L, 1.00), (1L, 2L, 2L, 151.01)))
    val nAt = RelationalQueries.ewmaAnomalyCore(spark, at)
      .agg(sum($"n_anomalies")).collect()(0).getLong(0)
    val nOver = RelationalQueries.ewmaAnomalyCore(spark, over)
      .agg(sum($"n_anomalies")).collect()(0).getLong(0)
    assert(nAt == 0L, "strict inequality at the exact threshold")
    assert(nOver == 1L, "one cent past the threshold flags")
  }

  test("q137 window depth: an outlier 9 steps back is outside the spike's window") {
    // user 1: 8 flat priors then a spike; user 2: the same with a $400
    // outlier prepended. The outlier flags its OWN successor (it IS that
    // event's whole history) but sits at lag 9 from the spike, so the
    // spike's verdict — and every intermediate one — is untouched by it.
    val flat8u = (u: Long) => (1 to 8).map(i => (u, i.toLong + 1L, u * 100 + i + 1, 1.00))
    val without = flat8u(1L) :+ ((1L, 10L, 110L, 200.00))
    val with9 = ((2L, 1L, 201L, 400.00) +: flat8u(2L)) :+ ((2L, 10L, 210L, 200.00))
    val out = RelationalQueries.ewmaAnomalyCore(spark, ev(without ++ with9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // user 1: only the spike flags; user 2: the outlier's successor (202)
    // plus the spike — one extra flag, same spike verdict
    assert(out.toSeq == Seq((1L, 9L, 8L, 1L, 110L), (2L, 10L, 9L, 2L, 202L)))
  }
}
