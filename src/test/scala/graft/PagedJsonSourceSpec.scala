package graft

import org.apache.spark.sql.functions._

class PagedJsonSourceSpec extends SparkSuite {
  import spark.implicits._

  private def fixture(): String = {
    val dir = tmpDir("pages")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/page-0.jsonl"),
      """{"guid":"a@x","weekly_downloads":10}""" + "\n" +
      """{"guid":"b@x","weekly_downloads":20}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/page-1.jsonl"),
      """{"guid":"c@x","weekly_downloads":30,"junk":"dropped"}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/page-2.jsonl"),
      """{"guid":"d@x"}""")
    dir
  }

  test("one input partition per page; raw rows carry page provenance") {
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", fixture()).load()
    assert(df.rdd.getNumPartitions == 3) // page fan-out = task fan-out (X3)
    assert(df.count() == 4)
    assert(df.where($"page" === 0).count() == 2)
  }

  test("downstream from_json does the typed P4 marshal (undeclared keys dropped, absent → null)") {
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", fixture()).load()
    val typed = df.select(from_json($"value",
        org.apache.spark.sql.types.StructType.fromDDL("guid STRING, weekly_downloads BIGINT")).as("r"))
      .select($"r.guid", $"r.weekly_downloads")
      .orderBy("guid")
    val rows = typed.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a@x", "b@x", "c@x", "d@x"))
    assert(rows.last.isNullAt(1)) // absent declared key → null
    assert(!typed.columns.contains("junk")) // undeclared key projected away
  }
}
