package graft

import graft.queries.RelationalQueries
import graft.streaming.EventStream

class StreamingSpec extends SparkSuite {

  test("streaming dedup: re-delivered file emits no duplicate events") {
    // two copies of the same file = exact re-delivery of every event
    val dir = tmpDir("events_dedup")
    for (n <- Seq("a", "b")) java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events_$n.parquet"))
    val q = EventStream.dedupStream(EventStream.readEvents(spark, dir), "event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup_out")
    val batchDistinct = Tables.events(spark, sf0001).count()
    assert(streamed.count() == batchDistinct) // every event exactly once
    assert(streamed.select("event_id").distinct().count() == batchDistinct)
  }

  test("streaming daily rollup == batch q10 on the same bounded input") {
    // stage the single events.parquet as a drop-directory
    val dir = tmpDir("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventStream.runBounded(spark, dir, "stream_rollup")
      .orderBy("bucket").collect()
    val batch = RelationalQueries.q10TumblingWindow(spark, sf0001).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getLong(1) == b.getLong(1))
      assert(s.getDouble(2) == b.getDouble(2)) // exact decimal-sum → bitwise equal
    }
  }
}
