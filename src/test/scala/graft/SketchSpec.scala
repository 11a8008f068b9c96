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

  test("SpaceSaving: overestimate invariant + heavy-hitter guarantee under tiny capacity") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("w")).as[String]
    val n = words.count()
    val cap = 8
    val sketch = words.select(new SpaceSaving(cap).toColumn).head()
    val exact = words.groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // estimate is an overestimate; estimate - error is a lower bound
    sketch.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"$item est $est < true $truth")
      assert(est - err <= truth, s"$item lower bound ${est - err} > true $truth")
    }
    // any item with true count > n/cap must be present
    val mustHave = exact.filter(_._2 > n / cap).keySet
    assert(mustHave.subsetOf(sketch.map(_._1).toSet),
      s"missing heavy hitters: ${mustHave -- sketch.map(_._1).toSet}")
  }

  test("Liveness: distributed probe keeps only live keys (F11)") {
    val guids = Seq("a@x", "dead@x", "b@x", "gone@x").toDF("guid")
    val live = Liveness.filterLiveDf(guids, "guid", g => !g.contains("dead") && !g.contains("gone"))
    assert(live.select("guid").as[String].collect().toSet == Set("a@x", "b@x"))
    // driver-side variant matches
    assert(Liveness.filterLiveDriverSide(Seq("a@x", "dead@x"), !_.contains("dead")) == Seq("a@x"))
  }
}
