package graft

import org.apache.spark.sql.functions._

/** Interchange-format breadth (S4 family): the same frame round-trips
  * through csv, json (+bzip2), and orc; and X6 permissive-vs-failfast
  * malformed-input semantics. */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val base = Tables.customer(spark, sf0001)
    .select($"c_custkey", $"c_name", $"c_acctbal").orderBy($"c_custkey")

  test("csv round-trip preserves values") {
    val dir = tmpDir("fmt_csv")
    base.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(base.schema).csv(dir).orderBy($"c_custkey")
    assert(back.collect().sameElements(base.collect()))
  }

  test("json round-trip with bzip2 codec preserves values (S4)") {
    val dir = tmpDir("fmt_json")
    base.write.option("compression", "bzip2").mode("overwrite").json(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".json.bz2")))
    val back = spark.read.schema(base.schema).json(dir).orderBy($"c_custkey")
    assert(back.collect().sameElements(base.collect()))
  }

  test("orc round-trip preserves values") {
    val dir = tmpDir("fmt_orc")
    base.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).orderBy($"c_custkey")
    assert(back.collect().sameElements(base.collect()))
  }

  test("X6: PERMISSIVE json parse nulls malformed rows; FAILFAST raises") {
    val dir = tmpDir("fmt_bad")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/bad.json"),
      """{"a": 1}""" + "\n" + """{"a": not-json}""" + "\n" + """{"a": 3}""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a BIGINT")
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(dir)
    assert(permissive.count() == 3)
    assert(permissive.where($"a".isNull).count() == 1) // malformed → null
    val failfast = spark.read.schema(schema).option("mode", "FAILFAST").json(dir)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }
}
