package graft

import org.apache.spark.sql.functions._

import graft.functions.{CmsSketch, CountMin}

/** Merge and bound contracts of the Count-Min sketch (q87). */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private def words = Tables.documents(spark, sf0001)
    .select(explode(split($"text", " ")).as("w"))

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CmsSketch =
    df.as[String].select(new CountMin(4, 256).toColumn).head()

  test("merge is lossless: sketch is bit-identical under any partitioning") {
    val a = sketchOf(words.repartition(1))
    val b = sketchOf(words.repartition(13))
    assert(a.n == b.n)
    assert(a.counts.sameElements(b.counts),
      "counter arrays diverged across partitionings — merge is not elementwise")
  }

  test("every row of counters sums to n (no item dropped or double-counted)") {
    val sk = sketchOf(words)
    for (d <- 0 until 4)
      assert(sk.counts.slice(d * 256, (d + 1) * 256).sum == sk.n, s"row $d")
  }

  test("est never undercounts, for EVERY token (not just the probe set)") {
    val cms = new CountMin(4, 256)
    val sk = sketchOf(words)
    val exact = words.groupBy($"w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (tok, cnt) =>
      val est = (0 until 4).map(d => sk.counts(d * 256 + cms.bucket(tok, d))).min
      assert(est >= cnt, s"undercount for '$tok': est $est < true $cnt")
    }
  }

  test("JVM bucket matches the SQL hex-chunk hash (the oracle contract)") {
    val cms = new CountMin(4, 256)
    val toks = words.distinct().limit(20).as[String].collect()
    val cols = $"w" +: (0 until 4).map(d =>
      (conv(substring(md5($"w".cast("binary")), 8 * d + 1, 8), 16, 10)
        .cast("long") % 256).cast("int").as(s"b$d"))
    val viaSql = toks.toSeq.toDF("w").select(cols: _*)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getInt)).toMap
    toks.foreach { t =>
      val jvm = (0 until 4).map(cms.bucket(t, _))
      assert(jvm == viaSql(t), s"bucket mismatch for '$t': jvm $jvm vs sql ${viaSql(t)}")
    }
  }
}
