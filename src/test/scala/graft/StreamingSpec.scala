package graft

import graft.queries.RelationalQueries
import graft.streaming.EventStream

class StreamingSpec extends SparkSuite {

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
