package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.AvroIo

/** S6/K3 Avro export + source round-trip (profile-export surface:
  * atomics, arrays, nested structs, nulls everywhere). */
class AvroIoSpec extends SparkSuite {
  import spark.implicits._

  private val addon = StructType(Seq(
    StructField("addon_id", StringType), StructField("version", StringType),
    StructField("user_disabled", BooleanType)))
  private val profile = StructType(Seq(
    StructField("client_id", StringType),
    StructField("locale", StringType),
    StructField("profile_age_days", LongType),
    StructField("crash_rate", DoubleType),
    StructField("has_sync", BooleanType),
    StructField("bookmarks", ArrayType(LongType)),
    StructField("active_addons", ArrayType(addon))))

  private def sample = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("c1", "en-US", 120L, 0.5, true, Seq(1L, 2L, 3L),
        Seq(Row("a@ext", "1.0", false), Row("b@ext", "2.1", true))),
      Row("c2", null, null, null, false, Seq.empty[Long], null),
      Row("c3", "de", 7L, 0.0, null, null,
        Seq(Row(null, null, null)))), 2), profile)

  test("avro round-trip preserves every value, null, and nested struct") {
    val dir = tmpDir("avroio")
    AvroIo.write(sample, dir)
    val back = AvroIo.read(spark, dir, profile)
    assert(back.schema == profile)
    val a = sample.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"round-trip diverged:\n$a\nvs\n$b")
  }

  test("one part file per partition; read parallelism = file count") {
    val dir = tmpDir("avroio_parts")
    AvroIo.write(sample.repartition(3), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 3, files.mkString(","))
    val back = AvroIo.read(spark, dir, profile)
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 3)
  }

  test("export of a real testdata frame reads back identical (K3→S6 pipe)") {
    val dir = tmpDir("avroio_cust")
    val cust = Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_name", $"c_acctbal".cast("double").as("bal"))
    AvroIo.write(cust, dir)
    val back = AvroIo.read(spark, dir, cust.schema)
    assert(back.count() == cust.count())
    assert(back.exceptAll(cust).isEmpty && cust.exceptAll(back).isEmpty)
  }

  test("reader-schema resolution: subset projects, added nullable column reads as null") {
    val dir = tmpDir("avroio_evolve")
    AvroIo.write(sample, dir)
    // projection: two of seven fields — Avro skips the rest at decode
    val proj = StructType(Seq(
      StructField("client_id", StringType), StructField("locale", StringType)))
    val narrow = AvroIo.read(spark, dir, proj)
    assert(narrow.schema == proj)
    assert(narrow.collect().map(_.getString(0)).sorted.toSeq == Seq("c1", "c2", "c3"))
    // evolution: a field the writer never had resolves to its null default
    val evolved = StructType(proj.fields :+ StructField("new_score", DoubleType))
    val back = AvroIo.read(spark, dir, evolved)
    assert(back.count() == 3)
    assert(back.where($"new_score".isNotNull).isEmpty)
  }

  test("uncompressed and deflate part files round-trip identically") {
    val (d1, d2) = (tmpDir("avro_null"), tmpDir("avro_defl"))
    AvroIo.write(sample, d1, codec = "null")
    AvroIo.write(sample, d2, codec = "deflate")
    val (a, b) = (AvroIo.read(spark, d1, profile), AvroIo.read(spark, d2, profile))
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }

  test("date / timestamp-micros / decimal logical types round-trip exactly") {
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("amt", DecimalType(12, 2))))
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2024-06-01"),
        java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456"),
        new java.math.BigDecimal("12345.67")),
      // pre-epoch date and negative amount exercise the signed encodings
      Row(2L, java.sql.Date.valueOf("1969-07-20"),
        java.sql.Timestamp.valueOf("1969-07-20 20:17:40.000001"),
        new java.math.BigDecimal("-0.01")),
      Row(3L, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), st)
    val dir = tmpDir("avro_logical")
    AvroIo.write(df, dir)
    // the written file must carry the STANDARD logical-type annotations
    // (any Avro consumer decodes it, not just this reader)
    val s = AvroIo.avroSchema(st)
    assert(s.getField("d").schema().getTypes.get(1).getLogicalType.getName == "date")
    assert(s.getField("ts").schema().getTypes.get(1).getLogicalType.getName == "timestamp-micros")
    assert(s.getField("amt").schema().getTypes.get(1).getLogicalType.getName == "decimal")
    val back = AvroIo.read(spark, dir, st)
    assert(back.schema == st)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("profile pipeline staged via Avro produces the identical KV table") {
    import graft.jobs.ProfileEtl
    val clients = Seq(
      ("2024-06-01", "c1", "Berlin", Some(2.5), "de", "Linux", Seq("a@x"), Some(3.7)),
      ("2024-06-01", "c4", "Oslo", None, "no", "Linux", Seq("c@x"), None))
      .toDF("submission_date", "client_id", "city", "subsession_hours_sum",
        "locale", "os", "active_addons", "places_bookmarks_count_mean")
      .withColumn("scalar_parent_browser_engagement_tab_open_event_count_sum", lit(null).cast("long"))
      .withColumn("scalar_parent_browser_engagement_total_uri_count_sum", lit(7L))
      .withColumn("scalar_parent_browser_engagement_unique_domains_count_mean", lit(2L))
    val profiles = ProfileEtl.extract(clients, "2024-06-01", sampleRate = 1.0)
    val (direct, staged, avroDir) =
      (tmpDir("kv_direct"), tmpDir("kv_staged"), tmpDir("avro_hop"))
    ProfileEtl.loadKv(spark, profiles, direct)
    ProfileEtl.exportAvro(profiles, avroDir)
    ProfileEtl.loadKv(spark,
      ProfileEtl.readAvro(spark, avroDir, profiles.schema), staged)
    def rows(p: String) = spark.read.parquet(p).orderBy("key").collect()
      .map(r => (r.getAs[String]("key"),
        r.getAs[Array[Byte]]("payload").toSeq)).toSeq
    // key AND compressed payload bytes identical — the interchange hop
    // is lossless down to the sink representation
    assert(rows(direct) == rows(staged))
  }
}
