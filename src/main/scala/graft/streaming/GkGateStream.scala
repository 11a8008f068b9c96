package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING face of the CONTINUOUS-score per-source quality gate
  * (VERDICT r14 item 3) — the member of the curation family
  * [[GateStream]] cannot cover: GateStream's state is the exact
  * (score → count) domain, bounded for integer lengths (q149's regime)
  * but corpus-sized for a continuous score where every document carries
  * a distinct value. The batch answer there is q153's GK sketch; this
  * face transports that sketch INTO the stream state — per source, a
  * Greenwald–Khanna quantile summary (Greenwald & Khanna, SIGMOD 2001:
  * the deterministic ε-approximate one-pass summary percentile_approx
  * implements) of O((1/ε)·log(εn)) tuples, NEVER row- or domain-sized.
  *
  * Decision rule — q153's gate made online: a doc is ADMITTED iff its
  * score clears its own source's sketch-[[QuantilePct]] threshold over
  * the prefix seen SO FAR (the doc included in its own calibration,
  * the GateStream convention). The sketch guarantee transports too:
  * the threshold's true prefix rank is within εn (+1 discretization
  * slack) of the target rank — which is exactly what the oracle-checked
  * batch dual q160 verifies per document ([[graft.queries.TextQueries
  * .q160GkGateStreamDual]] runs THIS fold over the batch frame, then
  * audits every emitted threshold against the exact prefix ranks from a
  * q157-style prefix self-join; the sketch threshold itself never
  * reaches the oracle — engine-specific summary internals — only its
  * rank-guarantee verdict does, the q93/q153 honesty pattern).
  *
  * Plan shape: map-only projection to (doc_id, source, score), ONE
  * stateful operator keyed by source. Batch ≡ stream under the
  * ingest-sequence contract (arrival follows doc_id; rows inside a
  * micro-batch fold in doc_id order) — StreamingSpec pins the bounded
  * driver's output equal to the batch fold row for row across
  * micro-batch boundaries, which transitively anchors the stream to
  * q160's DuckDB-checked audit. An optional TTL bounds state for
  * unbounded deployments. */
object GkGateStream {

  /** Sketch accuracy: rank error ≤ n/Acc — q153's [[graft.queries
    * .TextQueries.GkGateAcc]] parameter, restated as this face's ε. */
  val Acc = 100

  /** Gate percentile: drop each source's bottom quartile (q149/q153). */
  val QuantilePct = 25

  /** Default state TTL (disabled in bounded test drivers). */
  val StateTtl = "30 days"

  case class DocRow(doc_id: Long, source: String, score: Double)
  /** One GK tuple: value, g (rank-min increment), d (rank uncertainty). */
  case class GkTuple(v: Double, g: Long, d: Long)
  case class GkState(ts: List[GkTuple], n: Long, sinceCompress: Long)
  case class Verdict(doc_id: Long, source: String, score: Double,
      n_seen: Long, thr: Double, admit: Boolean)

  // ---- the Greenwald–Khanna summary (pure, deterministic) ----

  private def capacity(n: Long): Long = math.max(1L, (2L * n) / Acc) // ⌊2εn⌋

  /** Insert `v`: new tuple (v, 1, ⌊2εn⌋) before the first strictly
    * greater tuple; Δ = 0 at the extremes (their ranks are exact). */
  private[graft] def insert(st: GkState, v: Double): GkState = {
    val n1 = st.n + 1
    val i = st.ts.indexWhere(_.v > v)
    val ts1 =
      if (st.ts.isEmpty || i == 0 || i == -1) {
        val at = if (i == 0) 0 else st.ts.length
        st.ts.patch(at, List(GkTuple(v, 1L, 0L)), 0)
      } else st.ts.patch(i, List(GkTuple(v, 1L, capacity(st.n) - 1L)), 0)
    val st1 = GkState(ts1, n1, st.sinceCompress + 1)
    if (st1.sinceCompress >= Acc / 2) compress(st1) else st1
  }

  /** Merge adjacent tuples whose combined band fits the capacity —
    * right-to-left single pass (the paper's COMPRESS, minus the band
    * tree: correctness needs only g_i + g_{i+1} + Δ_{i+1} ≤ ⌊2εn⌋).
    * The first and last tuples are never merged away, so the summary's
    * extremes stay exact. */
  private[graft] def compress(st: GkState): GkState = {
    val cap = capacity(st.n)
    val buf = scala.collection.mutable.ArrayBuffer.from(st.ts)
    var i = buf.length - 2
    while (i >= 1) {
      val t = buf(i)
      val r = buf(i + 1)
      if (t.g + r.g + r.d <= cap) {
        buf(i + 1) = GkTuple(r.v, r.g + t.g, r.d)
        buf.remove(i)
      }
      i -= 1
    }
    GkState(buf.toList, st.n, 0L)
  }

  /** ε-approximate φ-quantile: the first tuple whose rank band sits
    * within εn of the target rank (existence guaranteed by the
    * insert/compress invariant g + Δ ≤ ⌊2εn⌋). */
  private[graft] def quantile(st: GkState, pct: Int): Double = {
    val r = math.max(1L, (st.n * pct + 99L) / 100L) // ⌈n·pct/100⌉
    val eps = st.n / Acc.toLong // ⌊εn⌋
    var rmin = 0L
    var found: Option[Double] = None
    val it = st.ts.iterator
    while (found.isEmpty && it.hasNext) {
      val t = it.next()
      rmin += t.g
      if (r - rmin <= eps && (rmin + t.d) - r <= eps) found = Some(t.v)
    }
    found.getOrElse(st.ts.last.v)
  }

  // ---- the stateful fold ----

  private[graft] def fold(source: String, it: Iterator[DocRow],
      state: GroupState[GkState], ttl: Option[String]): Iterator[Verdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption.getOrElse(GkState(Nil, 0L, 0L))
    val out = it.toSeq.sortBy(_.doc_id).map { r =>
      st = insert(st, r.score)
      val thr = quantile(st, QuantilePct)
      Verdict(r.doc_id, r.source, r.score, st.n, thr, r.score >= thr)
    }
    state.update(st)
    ttl.foreach(t => state.setTimeoutDuration(t))
    out.iterator
  }

  /** Per-document admission verdicts of a streaming (or batch) frame of
    * (doc_id, source, score DOUBLE). `ttl = None` disables expiry. */
  def verdicts(docs: DataFrame, ttl: Option[String] = Some(StateTtl))
      (implicit spark: SparkSession): Dataset[Verdict] = {
    import spark.implicits._
    val rows = docs.select($"doc_id", $"source", $"score").as[DocRow]
    val conf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    rows.groupByKey(_.source).flatMapGroupsWithState(OutputMode.Append(), conf)(
      (src: String, it: Iterator[DocRow], st: GroupState[GkState]) =>
        fold(src, it, st, ttl))
  }

  /** Drive to completion on a bounded (doc_id, source, score) drop-dir;
    * returns the verdict frame ordered by doc_id. */
  def runBounded(spark: SparkSession, glob: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    BoundedDrive.run(spark, glob, queryName, schema, maxFilesPerTrigger)(
      verdicts(_, ttl = None))
      .select($"doc_id", $"source", $"score", $"n_seen", $"thr", $"admit")
      .orderBy($"doc_id")
  }
}
