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

  // ---- shared edge memo ----

  test("edge memo: unpersisted blocks trigger a rebuild, not a dead-lineage failure") {
    val e1 = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
    val n1 = e1.count()
    val ids = GraphQueries.sharedRddIds(spark)
    assert(ids.nonEmpty)
    // simulate a harness releasing per-query state without sparing the
    // shared frame: the memo must detect the dead lineage and rebuild
    spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) => if (ids(id)) rdd.unpersist(blocking = true) }
    val e2 = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
    assert(e2.count() == n1)
    val ids2 = GraphQueries.sharedRddIds(spark)
    assert(ids2.nonEmpty && ids2.intersect(ids).isEmpty, s"$ids -> $ids2")
    // and a memo HIT returns the same live frame (no rebuild)
    assert(GraphQueries.sharedRddIds(spark) == ids2)
    GraphQueries.weightedEdgesPartitioned(spark, sf0001)
    assert(GraphQueries.sharedRddIds(spark) == ids2)
  }

  // ---- q146: edge-churn incremental community maintenance ----

  test("q146 fixture: incremental == full recompute; changed flags exact") {
    import org.apache.spark.sql.functions.col
    // old graph: triangles {1,2,3} and {7,8,9}, pair {4,5}; today's batch
    // bridges 3–4, 5–7 and attaches the brand-new node 10 to 1
    val old = Seq((1L,2L),(1L,3L),(2L,3L),(7L,8L),(7L,9L),(8L,9L),(4L,5L))
    val batch = Seq((3L,4L),(5L,7L),(1L,10L))
    val full = mirrored(old ++ batch)
    val isBatch = (col("u") + col("v")).isin(7L, 12L, 11L) // sums unique to batch
    val out = GraphQueries.lpaChurnCore(full, isBatch).collect()
    val labels = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the equivalence contract: identical to a full q140-shape recompute
    val fullRun = GraphQueries.lpaCore(full, GraphQueries.LpaRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == fullRun)
    assert(labels == Map(1L->1L, 2L->1L, 3L->1L, 4L->1L, 5L->1L,
      7L->7L, 8L->7L, 9L->7L, 10L->1L))
    // changed = exactly the nodes whose community moved (4, 5) plus the
    // new-to-graph node (10); batch endpoints 3, 7 and the rest of the
    // frontier were RECONSIDERED but kept their labels
    val changed = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(changed == Set(4L, 5L, 10L))
  }

  test("q146 fixture: batch touching nothing leaves every label unchanged") {
    import org.apache.spark.sql.functions.col
    // the new bridge joins two settled triangles but the 3-round labels
    // do not move — incremental must report zero changes and still
    // equal the full recompute
    val full = mirrored(Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L)))
    val out = GraphQueries.lpaChurnCore(full, col("u") + col("v") === 7L).collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L->1L, 2L->1L, 3L->1L, 4L->4L, 5L->4L, 6L->4L))
    assert(!out.exists(_.getBoolean(2)))
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
