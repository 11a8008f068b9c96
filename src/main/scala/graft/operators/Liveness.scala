package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** F11 — remote-liveness validation (taar_update_whitelist.py:51-54,
  * 64-67: per-guid HTTP 200 probe, opt-in via --validate-guids).
  *
  * This is I/O, not relational algebra: the probe runs where the data is.
  * For small key sets (the editorial shortlist, ~200 guids) a driver-side
  * loop matches the reference; for large sets the same probe function
  * runs inside mapPartitions so the HTTP fan-out scales with executors.
  * The probe is injected (`String => Boolean`) — tests use predicates,
  * production supplies an HTTP HEAD/GET with its own timeout (X5).
  */
object Liveness {

  /** Driver-side probe (reference behavior; keys must be small). */
  def filterLiveDriverSide(guids: Seq[String], probe: String => Boolean): Seq[String] =
    guids.filter(probe)

  /** Distributed probe: same semantics, executor-side fan-out. The probe
    * must be serializable and self-contained (construct clients inside). */
  def filterLive(guids: Dataset[String], probe: String => Boolean): Dataset[String] = {
    import guids.sparkSession.implicits._
    guids.mapPartitions { it =>
      // per-partition client init would go here
      it.filter(probe)
    }
  }

  /** The production probe (F9/F11 + X5): GET of the per-key URL
    * (`{guid}` replaced, URL-encoded) returns 2xx within `timeoutMs`.
    * Serializable: the shared HTTP client lives per-JVM in
    * graft.sources.Http, so this closure captures only two strings. */
  def httpProbe(urlTemplate: String, timeoutMs: Int): String => Boolean =
    guid => graft.sources.Http.ok(
      urlTemplate.replace("{guid}",
        java.net.URLEncoder.encode(guid, java.nio.charset.StandardCharsets.UTF_8)),
      timeoutMs)

  def filterLiveDf(df: DataFrame, guidCol: String, probe: String => Boolean): DataFrame = {
    import df.sparkSession.implicits._
    val live = filterLive(df.select(guidCol).as[String], probe)
    df.join(live.toDF(guidCol), Seq(guidCol), "left_semi")
  }

  /** Hit budget for a distributed probe run (the reference's 2-second
    * timeout scaled to 100× guid counts): `maxConcurrent` bounds the
    * cluster-wide in-flight probes — the key set is coalesced to that
    * many tasks, each probing synchronously, so the target service never
    * sees more than `maxConcurrent` open requests; `maxPerSecPerTask`
    * paces each task (aggregate rate ≤ maxConcurrent × maxPerSecPerTask);
    * the failure budget ABORTS the job once a task has probed ≥
    * `minSample` keys with a failure fraction above `maxFailureRate` — a
    * dead or rate-limiting endpoint fails in seconds instead of being
    * hammered for the whole key set. */
  case class ProbeBudget(maxConcurrent: Int = 32,
      maxPerSecPerTask: Double = 10.0,
      maxFailureRate: Double = 0.9,
      minSample: Int = 20)

  class ProbeBudgetExceeded(msg: String) extends RuntimeException(msg)

  /** [[filterLive]] under a [[ProbeBudget]]: same semantics on success,
    * but concurrency-capped, rate-paced, and failure-budget-guarded.
    *
    * Pacing holds at ANY rate: the wait is `parkNanos` on the full
    * nanosecond remainder (a millisecond-truncating sleep zeroes out
    * above ~1000 probes/s/task and the cap silently vanishes — ADVICE
    * r8), looped because parkNanos may return early.
    *
    * The failure budget is PER TASK ATTEMPT: counters restart when the
    * scheduler retries a task, so a flaky endpoint can absorb up to
    * `spark.task.maxFailures` × the budgeted probes before the job
    * dies. Deliberate: a retried task re-probing is indistinguishable
    * from fresh work at the endpoint, and cross-attempt state would
    * need external coordination. Set `spark.task.maxFailures=1` on
    * probe stages when the endpoint must see at most one budget's
    * worth of failures. */
  def filterLiveBudgeted(guids: Dataset[String], probe: String => Boolean,
      budget: ProbeBudget = ProbeBudget()): Dataset[String] = {
    import guids.sparkSession.implicits._
    val b = budget
    val coalesced =
      if (guids.rdd.getNumPartitions > b.maxConcurrent) guids.coalesce(b.maxConcurrent)
      else guids
    coalesced.mapPartitions { it =>
      val minIntervalNs =
        if (b.maxPerSecPerTask <= 0) 0L else (1e9 / b.maxPerSecPerTask).toLong
      var nextAllowed = 0L
      var n = 0L
      var failed = 0L
      it.filter { g =>
        var now = System.nanoTime()
        while (now < nextAllowed) {
          // parkNanos returns immediately while the interrupt flag is set
          // — without this check a killed/cancelled task busy-spins
          // through every pacing wait and keeps probing the endpoint
          if (Thread.interrupted())
            throw new InterruptedException("liveness probe interrupted during pacing")
          java.util.concurrent.locks.LockSupport.parkNanos(nextAllowed - now)
          now = System.nanoTime()
        }
        nextAllowed = math.max(now, nextAllowed) + minIntervalNs
        val ok = probe(g)
        n += 1
        if (!ok) failed += 1
        if (n >= b.minSample && failed > b.maxFailureRate * n)
          throw new ProbeBudgetExceeded(
            s"liveness probe failure rate $failed/$n exceeds ${b.maxFailureRate} — aborting")
        ok
      }
    }
  }
}
