package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal HTTP fetch layer for the ingestion sources (S1/S2/S3, F11).
  *
  * Mirrors the reference client's failure behavior (taar_amodump.py:
  * 117-123,152): a PER-REQUEST timeout (X5) and RETRY-ONCE on any
  * failure — timeout, connect error, or non-2xx status — then the error
  * surfaces (X4). In distributed use, Spark task retry is the outer
  * loop; this inner retry absorbs one transient blip without paying a
  * whole task re-run.
  *
  * The client is one per JVM (lazy object field): executor-side closures
  * reference the object, never serialize a client.
  */
object Http {
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** GET with per-request timeout; retries `retries` times (default one)
    * on ANY failure, then throws with the last cause attached. */
  def get(url: String, timeoutMs: Int, retries: Int = 1): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(timeoutMs.toLong)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return resp.body()
        last = new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
      } catch { case e: Exception => last = e }
      attempt += 1
    }
    throw new java.io.IOException(s"GET $url failed after ${retries + 1} attempts", last)
  }

  /** Liveness probe: does a GET return 2xx within the timeout? Never
    * throws — a dead endpoint is `false`, matching the reference's
    * check_guid semantics (taar_update_whitelist.py:51-54). */
  def ok(url: String, timeoutMs: Int): Boolean =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs.toLong)).GET().build()
      client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode() / 100 == 2
    } catch { case _: Exception => false }
}
