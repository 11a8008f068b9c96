package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Round-19: the CC loops' convergence probes ride each iteration's
  * checkpoint job as observed metrics instead of dedicated follow-up
  * jobs. These tests pin (a) the load-bearing Spark contract — an
  * `Observation` completes under an EAGER `localCheckpoint` action and
  * carries the exact row metric — and (b) that the observed-metric loop
  * still converges to the exact fixpoint labels on a multi-iteration
  * fixture (a path, where min-label takes diameter+1 rounds).
  * StarCcSpec pins cross-variant equality on random graphs and the real
  * LSH pair graph. */
class CcObserveSpec extends SparkSuite {
  import spark.implicits._

  test("an Observation completes under an eager localCheckpoint and is exact") {
    val obs = Observation()
    val df = spark.range(1000).toDF("id")
      .where($"id" % 3 === 0)
      .observe(obs, count(when($"id" > 500, true)).as("n_big"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    // get blocks until the action's listener fires — a hang here means the
    // checkpoint stopped running under withAction/SQLExecution
    assert(obs.get("n").asInstanceOf[Long] == 334L)
    assert(obs.get("n_big").asInstanceOf[Long] == 167L)
    assert(df.count() == 334L) // the checkpointed frame is intact
  }

  test("min-label components converge exactly on a path (multi-iteration loop)") {
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = ConnectedComponents.components(path, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 10)
    assert(labels.values.toSet == Set(0L), "all nodes label to the path head")
  }

  test("the CC loops submit no dedicated convergence-probe jobs") {
    // path 0..5: min-label needs 6 update rounds (5 to converge + 1
    // no-change round). The former probes were their own driver actions —
    // `isEmpty at ConnectedComponents...` (min-label) and
    // `count at ConnectedComponents...` (star fixpoint) — one or two
    // extra jobs per round. With the observed metrics those callsites
    // must never appear as job callsites; the checkpoint jobs (and AQE's
    // per-exchange stage jobs under the same actions) remain.
    val path = (0L until 6L).map(i => (i, i + 1)).toDF("a", "b")
      .localCheckpoint(true) // isolate fixture prep from the counted jobs
    val probeJobs = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val cs = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        if (cs.contains("ConnectedComponents") &&
            (cs.startsWith("isEmpty") || cs.startsWith("count")))
          probeJobs += cs
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val labels = ConnectedComponents.components(path, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.values.toSet == Set(0L))
      val star = ConnectedComponents.componentsStar(path, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star.values.toSet == Set(0L))
    } finally {
      Thread.sleep(300) // let the listener bus drain (R18JobProbe pattern)
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(probeJobs.isEmpty,
      s"dedicated convergence-probe jobs found: ${probeJobs.mkString(", ")}")
  }
}
