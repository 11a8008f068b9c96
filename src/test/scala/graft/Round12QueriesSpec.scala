package graft

import org.apache.spark.sql.DataFrame

import graft.queries._

/** Round-12 operators: convergence-driven LPA (q145) and edge-churn
  * incremental graph maintenance (q146). */
class Round12QueriesSpec extends SparkSuite {
  import spark.implicits._

  /** Mirror a u<v pair list into the (u,v)+(v,u) edge frame. */
  private def mirrored(pairs: Seq[(Long, Long)]): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  private def lpaResult(df: DataFrame) = {
    val rows = df.collect()
    val labels = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meta = rows.head
    (labels, meta.getLong(2), meta.getBoolean(3), meta.getBoolean(4))
  }

  // ---- q145: label propagation to convergence ----

  test("q145 fixture: bridged triangles CONVERGE (delta stop, settled labels)") {
    val edges = mirrored(Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L)))
    val (labels, n, conv, osc) = lpaResult(GraphQueries.lpaConvergeCore(edges))
    assert(labels == Map(1L->1L, 2L->1L, 3L->1L, 4L->4L, 5L->4L, 6L->4L))
    assert(n == 4 && conv && !osc)
  }

  test("q145 fixture: a mid-segment fixed point is a harmless overshoot") {
    // the star settles at round 1; the first CHECK fires at round 2 —
    // a converged vector is a fixed point, so the extra round is a no-op
    val edges = mirrored(Seq((0L,1L),(0L,2L)))
    val (labels, n, conv, osc) = lpaResult(GraphQueries.lpaConvergeCore(edges))
    assert(labels == Map(0L->0L, 1L->0L, 2L->0L))
    assert(n == 2 && conv && !osc)
  }

  test("q145 fixture: a sync-LPA 2-cycle stops via the OSCILLATION guard") {
    // brute-force-found oscillator for the deterministic rule (self-vote,
    // ties to smallest): labels at round 4 equal round 2 while the
    // one-round delta stays nonzero — a pure delta-to-zero stop rule
    // would spin to the cap; the 2-round-ago comparison catches it
    val edges = mirrored(Seq((0L,4L),(0L,5L),(1L,2L),(1L,3L),(1L,4L),(1L,5L),
      (2L,4L),(2L,5L),(3L,4L),(3L,5L)))
    val (labels, n, conv, osc) = lpaResult(GraphQueries.lpaConvergeCore(edges))
    assert(labels == Map(0L->0L, 1L->1L, 2L->0L, 3L->0L, 4L->1L, 5L->1L))
    assert(n == 4 && !conv && osc)
  }
}
