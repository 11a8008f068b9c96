package graft

import org.apache.spark.sql.functions._

import graft.operators.ApplyChanges

/** Pins the CDC MERGE semantics of operators.ApplyChanges on constructed
  * inputs (the oracle-checked q51 exercises it at data scale). */
class ApplyChangesSpec extends SparkSuite {
  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0),
    (4L, "dave", 40.0)).toDF("id", "name", "bal")

  // (id, op, version, bal): id=1 two upserts (latest wins), id=2 delete,
  // id=3 untouched, id=4 upsert-then-delete ordering, id=5 insert
  private val changes = Seq(
    (1L, "U", 1L, 11.0),
    (1L, "U", 2L, 12.0),
    (2L, "D", 1L, 0.0),
    (4L, "D", 1L, 0.0),
    (4L, "U", 2L, 44.0),
    (5L, "U", 1L, 55.0)).toDF("id", "op", "v", "bal")

  private def run = ApplyChanges(base, changes, Seq("id"), Seq($"v"), "op", "D")
    .orderBy("id")

  test("latest change wins; deletes drop; untouched pass; inserts appear") {
    val out = run.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, Some("alice"), 12.0),  // latest upsert (v=2) wins
      (3L, Some("carol"), 30.0),  // untouched
      (4L, Some("dave"), 44.0),   // delete superseded by later upsert
      (5L, None, 55.0)))          // insert: base-only column is null
    // id=2: latest op is D → gone
  }

  test("delete wins when it is the LATEST change") {
    val ch = Seq((1L, "U", 1L, 11.0), (1L, "D", 2L, 0.0)).toDF("id", "op", "v", "bal")
    val out = ApplyChanges(base, ch, Seq("id"), Seq($"v"), "op", "D")
    assert(!out.select("id").as[Long].collect().contains(1L))
    assert(out.count() == 3)
  }

  test("null payload value keeps the base value (CDC partial-update convention)") {
    val ch = Seq((1L, "U", 1L, Option.empty[Double])).toDF("id", "op", "v", "bal")
    val out = ApplyChanges(base, ch, Seq("id"), Seq($"v"), "op", "D")
      .where($"id" === 1L).collect().head
    assert(out.getDouble(out.fieldIndex("bal")) == 10.0)
  }

  test("one window + one join: no extra shuffles beyond key agg and merge") {
    // control: the plan does shuffle (sanity that countShuffles sees any)
    val n = countShuffles(ApplyChanges(base, changes, Seq("id"), Seq($"v"), "op", "D"))
    assert(n >= 1 && n <= 3, s"expected window+join exchanges only, got $n")
  }
}
