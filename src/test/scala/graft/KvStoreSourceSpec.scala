package graft

import org.apache.spark.sql.functions._

import graft.io.KvSink

class KvStoreSourceSpec extends SparkSuite {
  import spark.implicits._

  private def kvFrame(ids: Seq[(String, String, Long)]) =
    KvSink.toKv(spark, ids.toDF("client_id", "locale", "total_uri"), "client_id")

  test("V2 write protocol round-trips the KV frame (commit publishes, temp cleaned)") {
    val dir = tmpDir("kvstore") + "/store"
    val kv = kvFrame(Seq(("c1", "de", 5L), ("c2", "en", 7L), ("c3", "fr", 9L)))
      .repartition(3)
    kv.write.format("graft.sources.KvStoreSource")
      .mode("overwrite").option("path", dir).save()

    // one .kv file per task, no temp dir left behind
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".kv")) == 3, files.mkString(","))
    assert(!files.exists(_.startsWith("_temp")), files.mkString(","))

    val back = spark.read.format("graft.sources.KvStoreSource")
      .option("path", dir).load()
    assert(back.rdd.getNumPartitions == 3) // one input partition per file
    // exact round-trip, payload bytes included
    val orig = kv.orderBy("key").collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq))
    val got = back.orderBy("key").collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq))
    assert(got.toSeq == orig.toSeq)
    // payloads decode back to JSON with pseudonymized ids
    val decoded = KvSink.decodePayload(spark, back).select("json").as[String].collect()
    assert(decoded.length == 3 && decoded.forall(_.contains("\"locale\"")))
    assert(!decoded.exists(_.contains("\"c1\"")))
  }

  test("overwrite mode truncates previous contents (TRUNCATE capability)") {
    val dir = tmpDir("kvstore2") + "/store"
    kvFrame(Seq(("a", "de", 1L), ("b", "de", 2L))).write
      .format("graft.sources.KvStoreSource").mode("overwrite").option("path", dir).save()
    kvFrame(Seq(("z", "en", 9L))).write
      .format("graft.sources.KvStoreSource").mode("overwrite").option("path", dir).save()
    val back = spark.read.format("graft.sources.KvStoreSource")
      .option("path", dir).load()
    assert(back.count() == 1)
    val zKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest("z".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(back.select("key").as[String].head() == zKey)
  }

  test("empty store reads as empty, not an error") {
    val dir = tmpDir("kvstore3") + "/nothing"
    val back = spark.read.format("graft.sources.KvStoreSource")
      .option("path", dir).load()
    assert(back.count() == 0)
  }

  test("expireOlderThan: age-exceeded AND unversioned expire by default; migration window keeps legacy; idempotent") {
    // GC parity: union(maxAge 90d, maxVersions 1) — the age half. In
    // Bigtable every cell has a server timestamp, so MaxAge bounds ALL
    // data: an unversioned payload (predating the version scheme) must
    // expire too, unless the caller opts into the migration window.
    def freshStore(): String = {
      val dir = tmpDir("kvexpire") + "/store"
      val asOf = 1700000000000000L // micros
      val day = 24L * 3600L * 1000000L
      val rows = Seq(
        ("old", asOf - 91L * day),  // beyond 90d → expired
        ("edge", asOf - 90L * day), // exactly at cutoff → kept (>=)
        ("new", asOf - 1L * day))   // fresh → kept
        .toDF("client_id", "ver")
      KvSink.write(spark, rows, "client_id", dir)
      // plus one legacy row with no version field
      val legacy = KvSink.toKv(spark,
        Seq(("legacy", "de")).toDF("client_id", "locale"), "client_id")
      legacy.write.mode("append").parquet(dir)
      dir
    }
    val asOf = 1700000000000000L
    def keys(dir: String) = KvSink.decodePayload(spark, spark.read.parquet(dir))
      .select(get_json_object($"json", "$.client_id").as("cid"))
      .as[String].collect().toSet
    def sha(ids: String*) = ids.toSet
      .map((id: String) => org.apache.commons.codec.digest.DigestUtils.sha256Hex(id))

    // default (Bigtable parity): unversioned expires with the aged rows
    val d1 = freshStore()
    KvSink.expireOlderThan(spark, d1, asOf, days = 90)
    assert(keys(d1) == sha("edge", "new"))
    // idempotent: re-running with the same asOf changes nothing
    KvSink.expireOlderThan(spark, d1, asOf, days = 90)
    assert(keys(d1) == sha("edge", "new"))

    // migration window: keepUnversioned=true retains the legacy row
    val d2 = freshStore()
    KvSink.expireOlderThan(spark, d2, asOf, days = 90, keepUnversioned = true)
    assert(keys(d2) == sha("edge", "new", "legacy"))
  }

  test("interrupted rewrite self-heals: backup restored, not garbage-collected") {
    val dir = tmpDir("kvrecover") + "/store"
    val asOf = 1700000000000000L
    val day = 24L * 3600L * 1000000L
    val rows = Seq(("a", asOf - 1L * day), ("b", asOf - 2L * day))
      .toDF("client_id", "ver")
    KvSink.write(spark, rows, "client_id", dir)
    val before = spark.read.parquet(dir).collect().map(_.getString(0)).sorted.toSeq
    // simulate a crash between stepping-aside and publish: the live path
    // is gone and the ONLY surviving copy sits at <path>.old_rewrite
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    val (live, old) = (new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old_rewrite"))
    assert(fs.rename(live, old))
    // the next rewriting entry point must restore the backup (NOT treat
    // it as a deletable leftover) and then rewrite normally
    KvSink.expireOlderThan(spark, dir, asOf, days = 90)
    assert(spark.read.parquet(dir).collect().map(_.getString(0)).sorted.toSeq == before)
    assert(!fs.exists(old), "backup should be consumed by a successful rewrite")
  }

  test("per-store in-process monitor: a second THREAD's mutator waits for " +
      "the first (the writer lease alone is JVM-re-entrant by design and " +
      "only excludes other processes)") {
    val dir = tmpDir("kvmonitor") + "/store"
    val v1 = Seq(("a", "en")).toDF("client_id", "locale")
    KvSink.write(spark, v1, "client_id", dir)
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val aEntered = new java.util.concurrent.CountDownLatch(1)
    val t1 = new Thread(() => KvSink.withStoreLease(spark, dir) {
      order.add("a-in"); aEntered.countDown()
      Thread.sleep(400)
      order.add("a-out")
    }, "kv-holder")
    t1.start()
    assert(aEntered.await(10, java.util.concurrent.TimeUnit.SECONDS))
    val t2 = new Thread(() => KvSink.withStoreLease(spark, dir) {
      order.add("b-in")
    }, "kv-contender")
    t2.start()
    t1.join(30000); t2.join(30000)
    assert(order.toArray.toSeq == Seq("a-in", "a-out", "b-in"),
      s"the contender must enter only after the holder exits: ${order.toArray.toSeq}")
  }

  test("write on an EXISTING store commits under the rewrite protocol: " +
      "a write that fails mid-flight leaves the previous contents intact " +
      "(ADVICE r16)") {
    import org.apache.spark.sql.functions.{col, udf}
    val dir = tmpDir("kvrewrite") + "/store"
    val v1 = Seq(("a", "en"), ("b", "de")).toDF("client_id", "locale")
    KvSink.write(spark, v1, "client_id", dir)
    val before = spark.read.parquet(dir).collect().map(_.getString(0)).sorted.toSeq
    // a frame that fails at EXECUTION time (not analysis): before the
    // fix, write() published with a bare overwrite, which clears the
    // live store before any new file lands — this exact failure then
    // destroyed the previous contents with no backup
    val boom = udf((s: String) =>
      if (s != null) throw new RuntimeException("boom") else s)
    val bad = v1.withColumn("locale", boom(col("locale")))
    intercept[org.apache.spark.SparkException] {
      KvSink.write(spark, bad, "client_id", dir)
    }
    assert(spark.read.parquet(dir).collect().map(_.getString(0)).sorted.toSeq
      == before, "a failed rewrite must leave the store untouched")
    // ...and a SUCCESSFUL re-write replaces the contents completely,
    // consuming its own tmp/old residue
    val v2 = Seq(("c", "fr")).toDF("client_id", "locale")
    KvSink.write(spark, v2, "client_id", dir)
    assert(spark.read.parquet(dir).count() == 1L)
    val fs2 = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    assert(!fs2.exists(new org.apache.hadoop.fs.Path(dir + ".tmp_rewrite")) &&
      !fs2.exists(new org.apache.hadoop.fs.Path(dir + ".old_rewrite")),
      "a successful write must leave no rewrite residue")
  }
}
