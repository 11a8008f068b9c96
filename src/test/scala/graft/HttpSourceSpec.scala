package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.operators.Liveness
import graft.sources.Http

/** Exercises the live HTTP ingestion path (X4 retry-once, X5 per-request
  * timeout, S1 paged fetch, F11 liveness probe) against a loopback stub
  * server — no egress, fully deterministic. */
class HttpSourceSpec extends SparkSuite with BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var base: String = _
  private val slowHits = new AtomicInteger(0)
  private val flakyHits = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // S1: three pages of JSONL, ?page=N
    server.createContext("/addons", (ex: HttpExchange) => {
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      val body = (1 to 2)
        .map(i => s"""{"guid":"g${page}_$i@x","downloads":${page * 10 + i}}""")
        .mkString("\n")
      respond(ex, 200, body)
    })
    // X4: first hit fails with 503, second succeeds
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (flakyHits.incrementAndGet() == 1) respond(ex, 503, "")
      else respond(ex, 200, "recovered")
    })
    // X5: always slower than the client timeout
    server.createContext("/slow", (ex: HttpExchange) => {
      slowHits.incrementAndGet()
      Thread.sleep(1500)
      respond(ex, 200, "too late")
    })
    // F11: alive for even-numbered guids only
    server.createContext("/check", (ex: HttpExchange) => {
      val guid = ex.getRequestURI.getPath.stripPrefix("/check/")
      if (guid.matches("g[02468]@x")) respond(ex, 200, "ok")
      else respond(ex, 404, "")
    })
    // concurrent handler threads: a sleeping /slow exchange must not
    // serialize the retry attempt behind it
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    try super.afterAll() finally if (server != null) server.stop(0)
  }

  test("S1: paged URL mode plans one partition per page and fetches in executors") {
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("url", s"$base/addons?page={page}")
      .option("pages", "3")
      .option("timeoutMs", "5000")
      .load()
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.orderBy("page", "value").collect()
    assert(rows.length == 6)
    assert(rows.head.getInt(0) == 1 && rows.head.getString(1).contains("g1_1@x"))
    // downstream typed projection (P4 marshal pattern) still applies
    val typed = df.selectExpr("from_json(value, 'guid STRING, downloads INT') AS r")
      .select($"r.guid", $"r.downloads").orderBy($"r.downloads")
    assert(typed.count() == 6)
  }

  test("X4: one transient failure is absorbed by retry-once; hit count == 2") {
    flakyHits.set(0)
    assert(Http.get(s"$base/flaky", timeoutMs = 5000) == "recovered")
    assert(flakyHits.get() == 2)
  }

  test("X5: per-request timeout fires, retry happens once, then the error surfaces") {
    slowHits.set(0)
    val e = intercept[java.io.IOException] {
      Http.get(s"$base/slow", timeoutMs = 200)
    }
    assert(e.getMessage.contains("failed after 2 attempts"))
    // initial attempt + exactly one retry (poll: the server thread may
    // register the second hit a beat after the client gives up on it)
    val deadline = System.nanoTime() + 2.seconds.toNanos
    while (slowHits.get() < 2 && System.nanoTime() < deadline) Thread.sleep(20)
    assert(slowHits.get() == 2)
  }

  test("opt-in --validate-guids path: UpdateWhitelist keeps only live guids") {
    val editorial = (0 until 10).map(i => s"g$i@x").toDF("guid")
    val out = graft.jobs.UpdateWhitelist.run(editorial, tmpDir("uwv"),
      java.time.LocalDate.parse("2024-06-01"), allowShort = true,
      probe = Some(Liveness.httpProbe(s"$base/check/{guid}", timeoutMs = 5000)))
    assert(out.as[String].collect().toSeq == Seq("g0@x", "g2@x", "g4@x", "g6@x", "g8@x"))
  }

  test("F11: executor-side liveness probe keeps only live guids") {
    val guids = (0 until 10).map(i => s"g$i@x").toDS()
    val live = Liveness.filterLive(guids,
        Liveness.httpProbe(s"$base/check/{guid}", timeoutMs = 5000))
      .collect().sorted
    assert(live.toSeq == Seq("g0@x", "g2@x", "g4@x", "g6@x", "g8@x"))
    // and a dead SERVER yields none (probe never throws)
    val none = Liveness.filterLiveDriverSide(Seq("g0@x"),
      Liveness.httpProbe("http://127.0.0.1:1/check/{guid}", timeoutMs = 300))
    assert(none.isEmpty)
  }

  test("F11 budget: concurrency is capped at maxConcurrent tasks") {
    val guids = (0 until 200).map(i => s"g$i@x").toDS().repartition(50)
    val out = Liveness.filterLiveBudgeted(guids, _ => true,
      Liveness.ProbeBudget(maxConcurrent = 4, maxPerSecPerTask = 0))
    // the probe stage runs in exactly maxConcurrent tasks — one
    // synchronous probe each, so ≤ 4 requests are ever in flight
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == 200)
  }

  test("F11 budget: per-task pacing keeps the probe rate at the cap") {
    val guids = (0 until 30).map(i => s"g$i@x").toDS().coalesce(1)
    val t0 = System.nanoTime()
    val n = Liveness.filterLiveBudgeted(guids, _ => true,
      Liveness.ProbeBudget(maxConcurrent = 1, maxPerSecPerTask = 100.0)).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(n == 30)
    // 30 probes at 100/s need ≥ 29 inter-probe gaps of 10ms
    assert(elapsed >= 0.29, f"30 probes at 100/s finished in $elapsed%.3fs")
  }

  test("F11 budget: pacing still bites above 1000 probes/s/task (sub-ms intervals)") {
    // 0.2ms intervals: a millisecond-truncating sleep rounds every wait
    // to zero and the cap vanishes (ADVICE r8); parkNanos-remainder
    // pacing must stretch 1500 probes at 5000/s to ≥ ~0.3s.
    val guids = (0 until 1500).map(i => s"g$i@x").toDS().coalesce(1)
    val t0 = System.nanoTime()
    val n = Liveness.filterLiveBudgeted(guids, _ => true,
      Liveness.ProbeBudget(maxConcurrent = 1, maxPerSecPerTask = 5000.0)).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(n == 1500)
    assert(elapsed >= 0.29, f"1500 probes at 5000/s finished in $elapsed%.3fs — cap ineffective")
  }

  test("F11 budget: failure-rate breach aborts early instead of probing the whole set") {
    val hits = spark.sparkContext.longAccumulator("probe-hits")
    val guids = (0 until 10000).map(i => s"g$i@x").toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      Liveness.filterLiveBudgeted(guids,
        { _ => hits.add(1L); false },
        Liveness.ProbeBudget(maxConcurrent = 1, maxPerSecPerTask = 0,
          maxFailureRate = 0.5, minSample = 25)).count()
    }
    assert(e.getMessage.contains("exceeds") || e.getCause != null)
    // the task died at the minSample check (+ Spark may retry the task a
    // bounded number of times in local mode), nowhere near the full set
    assert(hits.value <= 200L, s"probed ${hits.value} of 10000 before aborting")
  }
}
