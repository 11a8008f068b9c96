package graft

import org.apache.spark.sql.functions._

import graft.jobs.GraphIngest
import graft.queries.GraphQueries

/** GraphIngest (VERDICT r12 item 1): the graph family's shared state —
  * weighted co-purchase edges and q146's per-round LPA label history —
  * persisted as bucketed tables, with the session memos acting as
  * read-through caches. Pins (a) compute≡read equality for the queries
  * that consume each table, (b) the warm path: a cold memo with the
  * tables present rebuilds from the TABLE, with zero lineitem scan
  * (no basket re-materialization), (c) rebuild-if-absent. */
class GraphIngestSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => null
      case x => x
    }).toSeq

  test("ingest persists edges+history; cold-memo reads come from the table " +
      "(no lineitem scan) and match the compute path exactly") {
    GraphIngest.drop(spark, sf0001)
    GraphQueries.clearMemos(spark)

    // compute-path ground truth (also warms the memo the writer shares)
    val computedEdges = rows(GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .orderBy($"u", $"v"))
    val computedQ146 = rows(GraphQueries.q146LpaEdgeChurn(spark, sf0001))
    val computedQ66 = rows(GraphQueries.q66PagerankStep(spark, sf0001))

    val (edgesT, histT) = GraphIngest.ingest(spark, sf0001)
    assert(spark.catalog.tableExists(edgesT) && spark.catalog.tableExists(histT))
    // ingest is idempotent: a second call reuses the catalog pair
    assert(GraphIngest.ingest(spark, sf0001) == (edgesT, histT))

    // cold process simulated: memos cleared, tables present → the edge
    // source must be the TABLE and its plan must touch no lineitem file
    GraphQueries.clearMemos(spark)
    val (src, fromTable) = GraphQueries.weightedEdgesSource(spark, sf0001)
    assert(fromTable, "with the table present the source must be the table")
    val scans = src.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach(s => assert(!s.toString.contains("lineitem"),
      s"warm path must not re-materialize baskets from lineitem: $s"))

    // and the queries riding the warm path reproduce the compute path
    assert(rows(GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .orderBy($"u", $"v")) == computedEdges)
    assert(rows(GraphQueries.q146LpaEdgeChurn(spark, sf0001)) == computedQ146)
    assert(rows(GraphQueries.q66PagerankStep(spark, sf0001)) == computedQ66)

    // the history table holds exactly LpaRounds node-sized rounds
    val hist = spark.table(histT)
    assert(rows(hist.select($"round").distinct().orderBy($"round"))
      == (1 to GraphQueries.LpaRounds).map(k => Seq(k)))

    // rebuild-if-absent: dropping the tables falls back to compute
    GraphIngest.drop(spark, sf0001)
    GraphQueries.clearMemos(spark)
    val (_, fromTable2) = GraphQueries.weightedEdgesSource(spark, sf0001)
    assert(!fromTable2)
    assert(rows(GraphQueries.q146LpaEdgeChurn(spark, sf0001)) == computedQ146)
  }

  test("advanceState: one day's edge batch appends bucket-aligned and rolls " +
      "the label history forward — advance == from-scratch rebuild per round, " +
      "including weight-merging overlap rows and a chained second day") {
    import graft.queries.GraphQueries.{ChurnMod, LpaRounds}
    val prefix = "graphadv_test"
    // synthetic yesterday/today split of the real corpus graph: old =
    // (u+v)%ChurnMod != 0 (the q146 convention), batch = the complement
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % ChurnMod === 0
    val old = full.where(!isBatch).localCheckpoint(true)
    val batch = full.where(isBatch).localCheckpoint(true)
    // the documented base: a SELF-CONSISTENT pair (edges + history over
    // those same edges) — the q146 demo pair ingest(dir) writes is not
    // a valid advance base (see the GraphIngest scaladocs)
    GraphIngest.ingestConsistent(spark, prefix, old)

    GraphIngest.advanceState(spark, prefix, "day1", batch)

    // edges: aggregated table == the full graph exactly
    def aggRead = spark.table(s"${prefix}_edges")
      .groupBy($"u", $"v").agg(sum($"w").as("w")).orderBy($"u", $"v")
    assert(rows(aggRead) == rows(full.orderBy($"u", $"v")))
    // history: every stored round == a from-scratch LPA over the full
    // graph (the roll-forward's correctness contract)
    val scratch = GraphQueries.lpaHistory(full.select($"u", $"v"))
    (1 to LpaRounds).foreach { k =>
      val stored = rows(spark.table(s"${prefix}_lpahist")
        .where($"round" === k).select($"v", $"lab").orderBy($"v"))
      assert(stored == rows(scratch(k - 1).orderBy($"v")),
        s"round $k: advanced history must equal the rebuild")
    }
    // a second day: NEW nodes (ids shifted past the corpus) PLUS an
    // OVERLAP slice re-sending existing pairs with fresh weight — the
    // case the read path's sum(w)-per-pair merge exists for (a (u, v)
    // pair now spans base + delta physical rows)
    val shifted = full.where(isBatch)
      .select(($"u" + 1000000L).as("u"), ($"v" + 1000000L).as("v"), $"w")
    // symmetric selector keeps the overlap delta MIRRORED (the contract)
    val overlap = full.where(isBatch && ($"u" + $"v") % 5 === 0)
      .select($"u", $"v", lit(3L).as("w"))
    val batch2 = shifted.unionByName(overlap).localCheckpoint(true)
    GraphIngest.advanceState(spark, prefix, "day2", batch2)
    // expected edges: pairwise-summed union (overlap pairs gain +3)
    val full2 = full.unionByName(batch2)
      .groupBy($"u", $"v").agg(sum($"w").as("w")).localCheckpoint(true)
    assert(rows(aggRead) == rows(full2.orderBy($"u", $"v")),
      "overlap delta rows must merge by weight sum on read")
    // history: EVERY round of the two-day advance == rebuild over the
    // merged graph (overlap pairs change no pair-set, only weights —
    // LPA is weight-blind, so the rebuild sees the same vote structure)
    val scratch2 = GraphQueries.lpaHistory(full2.select($"u", $"v"))
    (1 to LpaRounds).foreach { k =>
      val stored = rows(spark.table(s"${prefix}_lpahist")
        .where($"round" === k).select($"v", $"lab").orderBy($"v"))
      assert(stored == rows(scratch2(k - 1).orderBy($"v")),
        s"round $k: second advance must equal the two-day rebuild")
    }
    dropPrefix(prefix)
  }

  private def dropPrefix(prefix: String): Unit =
    Seq("_edges", "_lpahist", "_lpahist__next", "_meta", "_pending",
      "_applied", "_applied_digest", "_edges__rnext", "_edges__rpending")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $prefix$sfx"))

  private def histRows(prefix: String, k: Int): Seq[Seq[Any]] =
    rows(spark.table(s"${prefix}_lpahist")
      .where($"round" === k).select($"v", $"lab").orderBy($"v"))

  private def edgeAggRows(prefix: String): Seq[Seq[Any]] =
    rows(spark.table(s"${prefix}_edges")
      .groupBy($"u", $"v").agg(sum($"w").as("w")).orderBy($"u", $"v"))

  test("advanceState replay safety is a mechanism: a double-delivered batch " +
      "appends nothing and leaves edges + history identical") {
    import graft.queries.GraphQueries.{ChurnMod, LpaRounds}
    val prefix = "graphreplay_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % ChurnMod === 0
    GraphIngest.ingestConsistent(spark, prefix, full.where(!isBatch))
    val batch = full.where(isBatch).localCheckpoint(true)
    GraphIngest.advanceState(spark, prefix, "day1", batch)
    val edges1 = edgeAggRows(prefix)
    val hist1 = (1 to LpaRounds).map(histRows(prefix, _))
    val physRows = spark.table(s"${prefix}_edges").count()
    // the same logical batch re-delivered (at-least-once): no-op
    GraphIngest.advanceState(spark, prefix, "day1", batch)
    assert(spark.table(s"${prefix}_edges").count() == physRows,
      "redelivered batch must append zero physical rows")
    assert(edgeAggRows(prefix) == edges1)
    (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) == hist1(k - 1)))
    dropPrefix(prefix)
  }

  test("provenance gate: the ingest(dir) demo pair fails fast on advance " +
      "with a rebuild message") {
    GraphIngest.drop(spark, sf0001)
    GraphQueries.clearMemos(spark)
    GraphIngest.ingest(spark, sf0001)
    val batch = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("u", "v", "w")
    val e = intercept[IllegalArgumentException] {
      GraphIngest.advanceState(spark, GraphIngest.tablePrefix(sf0001), "x", batch)
    }
    assert(e.getMessage.contains("ingestConsistent"), e.getMessage)
    GraphIngest.drop(spark, sf0001)
    GraphQueries.clearMemos(spark)
  }

  test("every crash window self-heals: pending-only, mid-append, staged, " +
      "and dropped-history crashes all converge to advance == rebuild on " +
      "the next advanceState (or a bare heal), with redelivery a no-op") {
    import graft.queries.GraphQueries.{ChurnMod, LpaRounds}
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % ChurnMod === 0
    val old = full.where(!isBatch).localCheckpoint(true)
    val batch = full.where(isBatch).localCheckpoint(true)
    val scratch = GraphQueries.lpaHistory(full.select($"u", $"v"))
      .map(df => rows(df.orderBy($"v")))
    val fullEdges = rows(full.orderBy($"u", $"v"))

    // "swap" (ADVICE r14): crash between the history RENAME and the
    // pending-marker drop — heal's identity re-roll of already-advanced
    // history, the one window the old vocabulary could not drive
    for (window <- Seq("pending", "append", "stage", "drophist", "swap")) {
      val prefix = s"graphcrash_${window}_test"
      GraphIngest.ingestConsistent(spark, prefix, old)
      // the REAL advance path, crashed after the named step
      GraphIngest.advanceStateUntil(spark, prefix, "day1", batch, window)
      assert(spark.catalog.tableExists(s"${prefix}_pending"),
        s"$window: the in-flight marker must survive the crash")
      // the caller's at-least-once redelivery heals the park and lands
      // (or skips) the batch — no operator intervention
      GraphIngest.advanceState(spark, prefix, "day1", batch)
      assert(!spark.catalog.tableExists(s"${prefix}_pending"), window)
      assert(edgeAggRows(prefix) == fullEdges,
        s"$window: healed edges must equal the full graph")
      (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) == scratch(k - 1),
        s"$window round $k: healed history must equal the rebuild"))
      dropPrefix(prefix)
    }

    // a bare heal (no redelivery) after the worst window — batch fully
    // appended, history dropped, staged __next parked — must commit the
    // staged state rather than regress it (the round-13 advice's trap)
    val prefix = "graphheal_test"
    GraphIngest.ingestConsistent(spark, prefix, old)
    GraphIngest.advanceStateUntil(spark, prefix, "day1", batch, "drophist")
    assert(!spark.catalog.tableExists(s"${prefix}_lpahist"))
    GraphIngest.heal(spark, prefix)
    assert(!spark.catalog.tableExists(s"${prefix}_pending"))
    (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) == scratch(k - 1),
      s"bare-heal round $k must equal the rebuild"))
    dropPrefix(prefix)

    // bare heal after the POST-SWAP window (ADVICE r14): history is
    // already advanced and only the marker survives — heal's re-roll
    // must be the identity on the committed values and clear the marker
    val prefixS = "graphswapheal_test"
    GraphIngest.ingestConsistent(spark, prefixS, old)
    GraphIngest.advanceStateUntil(spark, prefixS, "day1", batch, "swap")
    val histSwapped = (1 to LpaRounds).map(histRows(prefixS, _))
    assert(spark.catalog.tableExists(s"${prefixS}_pending"))
    GraphIngest.heal(spark, prefixS)
    assert(!spark.catalog.tableExists(s"${prefixS}_pending"))
    assert(edgeAggRows(prefixS) == fullEdges,
      "post-swap heal must leave the appended edges untouched")
    (1 to LpaRounds).foreach { k =>
      assert(histRows(prefixS, k) == histSwapped(k - 1),
        s"post-swap heal round $k must re-commit identical history")
      assert(histRows(prefixS, k) == scratch(k - 1))
    }
    dropPrefix(prefixS)
  }

  private def edgeLiveRows(prefix: String): Seq[Seq[Any]] =
    rows(spark.table(s"${prefix}_edges")
      .groupBy($"u", $"v").agg(sum($"w").as("w")).where($"w" > 0)
      .orderBy($"u", $"v"))

  test("retractBatch: full takedown removes the edges from every view and " +
      "rolls the history to the reduced graph's rebuild; partial decrement " +
      "keeps the pair; a replayed retraction is a no-op") {
    import graft.queries.GraphQueries.{ChurnMod, LpaRounds}
    val prefix = "graphretract_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    GraphIngest.ingestConsistent(spark, prefix, full)
    val isGone = ($"u" + $"v") % ChurnMod === 0
    val takedown = full.where(isGone).localCheckpoint(true)
    assert(takedown.count() > 0, "fixture must retract something")
    val remaining = full.where(!isGone).localCheckpoint(true)

    // full takedown: retract the edges' ENTIRE weight
    GraphIngest.retractBatch(spark, prefix, "take1", takedown)
    assert(edgeLiveRows(prefix) == rows(remaining.orderBy($"u", $"v")),
      "post-retraction view must equal the graph without the edges")
    val scratch = GraphQueries.lpaHistory(remaining.select($"u", $"v"))
    (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) ==
      rows(scratch(k - 1).orderBy($"v")),
      s"round $k: retraction must equal the reduced-graph rebuild"))

    // replayed retraction (at-least-once): nothing removed twice
    val phys = spark.table(s"${prefix}_edges").count()
    GraphIngest.retractBatch(spark, prefix, "take1", takedown)
    assert(spark.table(s"${prefix}_edges").count() == phys,
      "replayed retraction must append zero rows")
    assert(edgeLiveRows(prefix) == rows(remaining.orderBy($"u", $"v")))

    // partial decrement: w >= 2 pairs lose all but one unit — the PAIR
    // SET is unchanged (LPA is weight-blind), only weights move
    val partial = remaining.where($"w" >= 2)
      .select($"u", $"v", ($"w" - 1).as("w")).localCheckpoint(true)
    assert(partial.count() > 0, "fixture must have a w >= 2 pair")
    GraphIngest.retractBatch(spark, prefix, "take2", partial)
    val expected = remaining.select($"u", $"v",
      when($"w" >= 2, 1L).otherwise($"w").as("w"))
    assert(edgeLiveRows(prefix) == rows(expected.orderBy($"u", $"v")),
      "partial decrement must adjust weights without dropping pairs")
    (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) ==
      rows(scratch(k - 1).orderBy($"v")),
      s"round $k: weight-only retraction must not move the labels"))
    dropPrefix(prefix)
  }

  test("compact folds delta rows to one per pair with no reader-visible " +
      "change; folded batches stay replay-idempotent via the applied " +
      "watermark; a later advance still equals the rebuild") {
    import graft.queries.GraphQueries.{ChurnMod, LpaRounds}
    val prefix = "graphcompact_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % ChurnMod === 0
    val old = full.where(!isBatch).localCheckpoint(true)
    // day1 = the churn pairs PLUS extra weight on existing pairs, so the
    // table holds base+delta rows for one (u, v) — what compaction folds
    val batch = full.where(isBatch).select($"u", $"v", $"w")
      .unionByName(old.where(($"u" + $"v") % ChurnMod === 1)
        .select($"u", $"v", lit(1L).as("w")))
      .localCheckpoint(true)
    GraphIngest.ingestConsistent(spark, prefix, old)
    GraphIngest.advanceState(spark, prefix, "day1", batch)
    val live1 = edgeLiveRows(prefix)
    val hist1 = (1 to LpaRounds).map(histRows(prefix, _))
    val physBefore = spark.table(s"${prefix}_edges").count()
    val pairCount = spark.table(s"${prefix}_edges")
      .select($"u", $"v").distinct().count()
    assert(physBefore > pairCount, "fixture must hold overlapping delta rows")

    GraphIngest.compact(spark, prefix)
    assert(spark.table(s"${prefix}_edges").count() == pairCount,
      "compaction must fold to one row per (u, v)")
    assert(spark.table(s"${prefix}_edges")
      .where($"batch_id".isNotNull).count() == 0,
      "folded rows carry no batch tags")
    assert(edgeLiveRows(prefix) == live1, "reader view must be unchanged")
    (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) == hist1(k - 1)))

    // the folded day1 redelivered: the watermark screens it
    GraphIngest.advanceState(spark, prefix, "day1", batch)
    assert(spark.table(s"${prefix}_edges").count() == pairCount,
      "a folded batch's redelivery must append nothing")
    assert(edgeLiveRows(prefix) == live1)

    // compact twice: idempotent
    GraphIngest.compact(spark, prefix)
    assert(edgeLiveRows(prefix) == live1)

    // life goes on: a fresh advance over the compacted base == rebuild
    val day2 = full.where(isBatch)
      .select($"u", $"v", ($"w" * 2).as("w")).localCheckpoint(true)
    GraphIngest.advanceState(spark, prefix, "day2", day2)
    val merged = old.select($"u", $"v", $"w").unionByName(batch)
      .unionByName(day2)
      .groupBy($"u", $"v").agg(sum($"w").as("w"))
    assert(edgeLiveRows(prefix) == rows(merged.orderBy($"u", $"v")),
      "advance over a compacted base must equal the three-way merge")
    val scratch2 = GraphQueries.lpaHistory(merged.select($"u", $"v"))
    (1 to LpaRounds).foreach(k => assert(histRows(prefix, k) ==
      rows(scratch2(k - 1).orderBy($"v"))))
    dropPrefix(prefix)
  }

  test("bucketed edge table joins a u-keyed frame with no edge-side exchange") {
    GraphIngest.drop(spark, sf0001)
    GraphQueries.clearMemos(spark)
    val (edgesT, _) = GraphIngest.ingest(spark, sf0001)
    // a node-sized vector joined on u: the bucketed scan satisfies the
    // join's required distribution, so only the vector side exchanges
    val vec = spark.table(edgesT).select($"u").distinct()
      .withColumn("r", lit(1L))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val n = countShuffles(spark.table(edgesT).join(vec.hint("shuffle_hash"), Seq("u")))
      assert(n <= 2, s"edge side must ride its buckets (got $n exchanges)")
      val plan = spark.table(edgesT).join(vec.hint("shuffle_hash"), Seq("u"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
    }
    GraphIngest.drop(spark, sf0001)
    GraphQueries.clearMemos(spark)
  }
}
