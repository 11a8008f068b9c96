package graft

class GraftSqlSpec extends SparkSuite {

  test("SQL text surface: same plan space as the DataFrame API") {
    val viaSql = GraftSql.sql(spark, sf0001,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val viaDf = graft.queries.RelationalQueries.q01PricingSummary(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("custom zlib functions callable from SQL") {
    GraftSql.register(spark, sf0001)
    val out = spark.sql(
      """SELECT CAST(zlib_decompress(zlib_compress(CAST(c_name AS BINARY))) AS STRING) AS rt,
        |       c_name FROM customer ORDER BY c_custkey LIMIT 5""".stripMargin)
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("events view carries the normalized microsecond timestamps") {
    GraftSql.register(spark, sf0001)
    val t = spark.sql("SELECT typeof(ts) FROM events LIMIT 1").collect()(0).getString(0)
    assert(t == "timestamp")
  }

  test("Tables.events normalizes both physical ts shapes (µs-NTZ and nanos-as-long)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456 UTC wall-clock

    // Shape 1: TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark writes this
    // physical type for a TimestampNTZType column; reads back as TIMESTAMP_NTZ.
    val ntzDir = tmpDir("events-ntz")
    val ntzRow = Row(java.time.LocalDateTime.ofEpochSecond(
      micros / 1000000L, ((micros % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC), 1L)
    spark.createDataFrame(
      java.util.Arrays.asList(ntzRow),
      StructType(Seq(StructField("ts", TimestampNTZType), StructField("user_id", LongType))))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    // Shape 2: int64 ts — what the nanosAsLong legacy conf surfaces for
    // parquet TIMESTAMP(NANOS); value carried in nanoseconds.
    val nsDir = tmpDir("events-ns")
    spark.createDataFrame(
      java.util.Arrays.asList(Row(micros * 1000L, 1L)),
      StructType(Seq(StructField("ts", LongType), StructField("user_id", LongType))))
      .write.mode("overwrite").parquet(s"$nsDir/events.parquet")

    for (dir <- Seq(ntzDir, nsDir)) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"dir=$dir")
      val got = df.select(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts"))).collect()(0).getLong(0)
      assert(got == micros, s"dir=$dir: wall-clock not preserved under UTC session TZ")
    }
  }

  test("native vector and hash functions callable from SQL") {
    GraftSql.register(spark, sf0001)
    val r = spark.sql(
      """SELECT vec_dot(embedding, embedding) AS d, vec_norm2(embedding) AS n,
        |       md5_prefix64(CAST(CAST(vec_id AS STRING) AS BINARY), 8) AS h
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // dot(x,x) == norm2(x), bitwise
      assert(row.getLong(2) >= 0L && row.getLong(2) <= 0xffffffffL)
    }
    val z = spark.sql(
      """SELECT vec_isqd(array(CAST(1 AS BIGINT), 5), array(CAST(4 AS BIGINT), 1))
        |AS d""".stripMargin).collect()(0).getLong(0)
    assert(z == 25L) // (1-4)^2 + (5-1)^2
  }
}
