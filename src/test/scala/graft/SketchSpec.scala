package graft

import org.apache.spark.sql.functions._

import graft.functions.SpaceSaving
import graft.operators.Liveness

class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("SpaceSaving: exact when capacity >= distinct items") {
    val tokens = Tables.events(spark, sf0001)
      .select($"event_type").as[String]
    val sketch = tokens.select(new SpaceSaving(16).toColumn).head()
    val exact = Tables.events(spark, sf0001)
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch.foreach { case (item, est, err) =>
      assert(err == 0L)
      assert(est == exact(item), s"$item: $est vs ${exact(item)}")
    }
    assert(sketch.map(_._1).toSet == exact.keySet)
  }

  test("SpaceSaving: Misra-Gries bound + heavy-hitter guarantee under tiny capacity") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("w")).as[String]
    val n = words.count()
    val cap = 8
    val sketch = words.select(new SpaceSaving(cap).toColumn).head()
    val exact = words.groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // estimate undercounts; estimate + dec is an upper bound, and the
    // sketch-wide dec obeys the Agarwal merge bound N/(cap+1)
    sketch.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est <= truth, s"$item est $est > true $truth")
      assert(est + err >= truth, s"$item upper bound ${est + err} < true $truth")
      assert(err <= n / (cap + 1), s"dec $err exceeds N/(cap+1) ${n / (cap + 1)}")
    }
    // any item with true count > n/cap must be present
    val mustHave = exact.filter(_._2 > n / cap).keySet
    assert(mustHave.subsetOf(sketch.map(_._1).toSet),
      s"missing heavy hitters: ${mustHave -- sketch.map(_._1).toSet}")
  }

  test("SpaceSaving: merge bound survives adversarial partitioning") {
    // the round-5 hazard: a globally-heavy-but-locally-light key. Build
    // a stream where the heavy key appears once or twice per partition
    // among locally-heavier noise, under several partitionings (round-
    // robin spread, hash co-location, range concentration) — the
    // mergeable-summary bound must hold for every one of them.
    val cap = 8
    val heavy = "HEAVY"
    // 64 copies of the heavy key interleaved with 400 distinct rare keys
    // and 16 medium keys x 8 — per 32-row slice the heavy key is never
    // the local maximum
    val stream: Seq[String] =
      (0 until 64).flatMap { i =>
        heavy +: (0 until 6).map(j => s"rare_${i}_$j") :+ s"med_${i % 16}"
      }
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    val base = stream.toDF("w").as[String]
    val variants = Seq(
      base.repartition(16),                       // round-robin spread
      base.repartition(16, col("w")),             // hash co-location
      base.repartitionByRange(16, col("w")),      // range concentration
      base.repartition(1))                        // single-partition control
    for (ds <- variants) {
      val sketch = ds.select(new SpaceSaving(cap).toColumn).head()
      sketch.foreach { case (item, est, err) =>
        val truth = exact.getOrElse(item, 0L)
        assert(est <= truth, s"$item est $est > true $truth")
        assert(est + err >= truth, s"$item upper ${est + err} < true $truth")
        assert(err <= n / (cap + 1))
      }
      // the heavy key is above every provable threshold: present, always
      assert(exact(heavy) > n / (cap + 1))
      assert(sketch.map(_._1).contains(heavy),
        s"heavy key pruned by merge: ${sketch.map(_._1).mkString(",")}")
    }
  }

  test("Liveness: distributed probe keeps only live keys (F11)") {
    val guids = Seq("a@x", "dead@x", "b@x", "gone@x").toDF("guid")
    val live = Liveness.filterLiveDf(guids, "guid", g => !g.contains("dead") && !g.contains("gone"))
    assert(live.select("guid").as[String].collect().toSet == Set("a@x", "b@x"))
    // driver-side variant matches
    assert(Liveness.filterLiveDriverSide(Seq("a@x", "dead@x"), !_.contains("dead")) == Seq("a@x"))
  }
}
