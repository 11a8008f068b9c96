package graft

import org.apache.spark.sql.DataFrame
import graft.queries.RelationalQueries
import graft.queries.RelationalQueries.IntervalUs

/** q113 AS-OF join and q114 interval join on CONSTRUCTED inputs — the
  * boundary semantics (ties at equal timestamps, half-open range ends,
  * bucket-edge candidates) don't occur at controlled positions in the
  * generated corpus, so they are pinned here. */
class AsofRangeSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double, Long)*): DataFrame =
    rows.toDF("user_id", "event_id", "event_type", "value", "tus")

  test("q113: equal-timestamp purchase matches (<=); same-µs purchases dedup to max id") {
    val out = RelationalQueries.asofCore(spark, ev(
      (1L, 10L, "purchase", 5.0, 1000L),
      (1L, 11L, "purchase", 7.0, 1000L), // same µs — id 11 wins the dedup
      (1L, 20L, "click", 0.0, 1000L),    // equal ts → matches (ASOF <=)
      (1L, 21L, "click", 0.0, 999L),     // BEFORE any purchase → unmatched
      (1L, 12L, "purchase", 9.0, 2000L),
      (1L, 22L, "click", 0.0, 2500L),    // latest prior = id 12, not id 11
      (2L, 30L, "click", 0.0, 5000L)     // other user → purchases invisible
    )).collect().map(r => (r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(4)) -1L else r.getLong(4))).toList
    assert(out == List(
      (20L, 11L, 0L),        // tie at 1000µs → dedup winner 11, staleness 0
      (21L, -1L, -1L),       // unmatched: null purchase, null staleness
      (22L, 12L, 500L),
      (30L, -1L, -1L)))
  }

  test("q114: half-open range [p-30min, p) and cross-bucket candidates") {
    val p = 7 * IntervalUs + 60_000_000L // purchase 1 min into bucket 7
    val out = RelationalQueries.intervalCore(spark, ev(
      (1L, 50L, "purchase", 0.0, p),
      (1L, 60L, "click", 1.0, p - IntervalUs),      // exactly −30min → IN (>=)
      (1L, 61L, "click", 2.0, p - IntervalUs - 1L), // one µs earlier → OUT
      (1L, 62L, "click", 4.0, p),                   // exactly at p → OUT (<)
      (1L, 63L, "click", 8.0, p - 90_000_000L),     // in PREVIOUS bucket → IN
      (1L, 64L, "click", 16.0, p - 1L),             // same bucket → IN
      (2L, 65L, "click", 32.0, p - 1L),             // other user → OUT
      (2L, 51L, "purchase", 0.0, 42L)               // no clicks → zero row
    )).collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(out == List((50L, 3L, 25.0), (51L, 0L, 0.0)))
  }

  test("q114 salted variant is row-identical to the plain form (hub-key path)") {
    // a hub user concentrating one (user, bucket) key plus normal users;
    // salting must change the distribution, never the answer
    val p = 7 * IntervalUs + 60_000_000L
    val hub = (0 until 200).map(i =>
      (1L, 1000L + i, "click", i.toDouble, p - 1_000_000L * (i + 1)))
    val fixture = ev((hub :+ ((1L, 50L, "purchase", 0.0, p))
      :+ ((2L, 60L, "click", 1.0, p - 1L)) :+ ((2L, 51L, "purchase", 0.0, p))): _*)
    val plain = RelationalQueries.intervalCore(spark, fixture).collect().toSeq
    val salted = RelationalQueries.intervalCoreSalted(spark, fixture, 8).collect().toSeq
    assert(plain == salted)
    // the auto-salt loop (VERDICT r15 item 4): the audit diagnoses the
    // hub (200 clicks on one user vs 1 on the other → salt > 1) and the
    // audit-chosen salt gives the identical answer
    assert(graft.operators.SkewAudit.recommendedSalt(
      fixture.where($"event_type" === "click"), "user_id") > 1)
    assert(RelationalQueries.intervalCoreAutoSalted(spark, fixture)
      .collect().toSeq == plain)
    // and on the real corpus
    val evReal = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type", $"value",
        org.apache.spark.sql.functions.unix_micros($"ts").as("tus"))
    assert(RelationalQueries.intervalCore(spark, evReal).collect().toSeq ==
      RelationalQueries.intervalCoreSalted(spark, evReal, 8).collect().toSeq)
  }

  test("q116: divergence + watermark-boundary classification on constructed arrivals") {
    val DayUs = RelationalQueries.DayUs
    val fx = ev(
      // user 1: click (shard 0) arrives before its matching purchase
      // (shard 1) — divergent, lateness 1000µs ≤ 1 day: recoverable
      (1L, 7L, "click", 0.0, 2000L),
      (1L, 8L, "purchase", 5.0, 1000L),
      // user 2: purchase arrives > 1 day behind the user's frontier —
      // divergent AND unrecoverable even by a watermark-delayed pass
      (2L, 14L, "click", 0.0, DayUs + 2000L),
      (2L, 15L, "purchase", 6.0, 1000L),
      // user 3: lateness EXACTLY DayUs — the boundary stays recoverable
      // (strict >, the same comparison as q112's n_dropped)
      (3L, 21L, "click", 0.0, DayUs + 1000L),
      (3L, 22L, "purchase", 7.0, 1000L),
      // user 4: in-order arrival — matched, no divergence
      (4L, 28L, "purchase", 8.0, 100L),
      (4L, 29L, "click", 0.0, 200L),
      // user 5: unmatched click — not a divergence
      (5L, 35L, "click", 0.0, 300L))
    val out = RelationalQueries.asofLateCore(spark, fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(out == List(
      (0L, 3L, 2L, 1L, 0L),      // day 0: clicks 7,29,35; divergent: 7
      (86400L, 2L, 2L, 2L, 1L))) // day 1: 14,21 divergent; 14 unrecoverable
  }

  test("q116 counts the click the streaming face actually misses (late arrival)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("asof_late_stream")
    def stage(rows: Seq[(Long, Long, String, Double, Long)], name: String): Unit = {
      rows.toDF("user_id", "event_id", "event_type", "value", "tus")
        .withColumn("ts", expr("timestamp_micros(tus)")).drop("tus")
        .coalesce(1).write.parquet(s"$dir/stage_$name")
      val part = new java.io.File(s"$dir/stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    // batch 1 delivers the click; the event-time-EARLIER purchase only
    // arrives in batch 2 (the cross-micro-batch late delivery AsofStream
    // documents as its divergence)
    stage(Seq((1L, 7L, "click", 0.0, 2000L)), "b1")
    val (outDir, ckpt) = (s"$dir/out", s"$dir/ckpt")
    graft.streaming.AsofStream
      .runBoundedResumable(spark, s"$dir/b*.parquet", outDir, ckpt)
    stage(Seq((1L, 8L, "purchase", 5.0, 1000L)), "b2")
    val streamed = graft.streaming.AsofStream
      .runBoundedResumable(spark, s"$dir/b*.parquet", outDir, ckpt).collect()
    val c = streamed.find(_.getAs[Long]("click_id") == 7L).get
    assert(c.isNullAt(c.fieldIndex("purchase_id")),
      "the stream must not see the purchase that arrived after emit")
    // batch truth DOES match it...
    val fx = ev((1L, 7L, "click", 0.0, 2000L), (1L, 8L, "purchase", 5.0, 1000L))
    assert(RelationalQueries.asofCore(spark, fx).collect().head.getLong(2) == 8L)
    // ...and the audit counts exactly this click: 1 divergent, recoverable
    val audit = RelationalQueries.asofLateCore(spark, fx).collect().head
    assert((audit.getLong(1), audit.getLong(2), audit.getLong(3),
      audit.getLong(4)) == ((1L, 1L, 1L, 0L)))
  }

  test("q113/q114 match their DuckDB-oracle row counts on the sf0.001 corpus") {
    val clicks = Tables.events(spark, sf0001)
      .where($"event_type" === "click").count()
    val purchases = Tables.events(spark, sf0001)
      .where($"event_type" === "purchase").count()
    assert(RelationalQueries.q113AsofJoin(spark, sf0001).count() == clicks)
    assert(RelationalQueries.q114IntervalJoin(spark, sf0001).count() == purchases)
  }
}
