package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.TextQueries

/** STREAMING face of the per-source adaptive quality gate (q149's
  * batch calibration collapsed to per-document latency): every arriving
  * document is admitted or dropped against its OWN source's score
  * distribution as observed SO FAR — the admission form of the Gopher
  * per-domain length rule, where the threshold tracks the live corpus
  * instead of being re-derived nightly. VERDICT r13 item 8: the curation
  * family's missing streaming face, anchored (like DedupStream → q151)
  * to an oracle-checked batch dual, [[TextQueries.q157GateStreamDual]].
  *
  * Decision rule — q149's exact-rank semantics, made online: a doc is
  * ADMITTED iff its score clears the current bottom-1/[[TextQueries.GateDen]]
  * cut of its source, i.e. GateDen · |{seen: score ≤ mine}| ≥ n_seen,
  * where "seen" INCLUDES the doc itself (the doc is part of its own
  * source's distribution, exactly as in the batch gate). Equivalently
  * score ≥ thr(source) for q149's threshold over the seen prefix —
  * admit-or-not needs only the cumulative count at the doc's own score,
  * so the fold never materializes the threshold.
  *
  * Plan shape: map-only projection to (source, doc_id, score), then ONE
  * stateful operator keyed by source. State is the (score → count)
  * DOMAIN of the source plus its row count — q149's scale argument
  * transported to state: bounded by the source's distinct-score domain
  * (lengths, in the named query), NOT its row count; a 10⁹-doc source
  * with 50k distinct lengths carries 50k map entries. The per-doc
  * admit test folds the domain once (O(domain) worst case — the
  * domain-sized analogue of q149's window over the domain, not a
  * per-row corpus pass). An optional TTL (ProcessingTimeTimeout, the
  * stateful-face convention) bounds state for unbounded deployments
  * where the calibration window is "last N days".
  *
  * Batch≡stream: under the ingest-sequence contract (arrival follows
  * doc_id — the q151/DedupStream assumption; rows inside a micro-batch
  * are folded in doc_id order), the bounded driver's output equals the
  * batch dual row for row — pinned in StreamingSpec, which transitively
  * hash-checks this face against DuckDB through q157's oracle. */
object GateStream {

  case class DocRow(doc_id: Long, source: String, score: Long)
  case class SourceState(dom: Map[Long, Long], n: Long)
  case class Verdict(doc_id: Long, source: String, score: Long,
      n_seen: Long, admit: Boolean)

  /** Default state TTL (disabled in bounded test drivers). */
  val StateTtl = "30 days"

  /** One source fold: update the score domain, then admit iff
    * GateDen · cum(score) ≥ n over the state INCLUDING this doc. */
  private[graft] def fold(source: String, it: Iterator[DocRow],
      state: GroupState[SourceState], ttl: Option[String]): Iterator[Verdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var dom = state.getOption.map(_.dom).getOrElse(Map.empty[Long, Long])
    var n = state.getOption.map(_.n).getOrElse(0L)
    val out = it.toSeq.sortBy(_.doc_id).map { r =>
      dom = dom.updated(r.score, dom.getOrElse(r.score, 0L) + 1L)
      n += 1L
      val cumLe = dom.iterator.collect { case (s, c) if s <= r.score => c }.sum
      Verdict(r.doc_id, r.source, r.score, n,
        TextQueries.GateDen * cumLe >= n)
    }
    state.update(SourceState(dom, n))
    ttl.foreach(t => state.setTimeoutDuration(t))
    out.iterator
  }

  /** Per-document admission verdicts of a streaming (or batch)
    * documents frame. `ttl = None` disables expiry (bounded drivers). */
  def verdicts(docs: DataFrame, ttl: Option[String] = Some(StateTtl))
      (implicit spark: SparkSession): Dataset[Verdict] = {
    import spark.implicits._
    val rows = docs
      .select($"doc_id", $"source", $"n_chars".cast("long").as("score"))
      .as[DocRow]
    val conf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    rows.groupByKey(_.source).flatMapGroupsWithState(OutputMode.Append(), conf)(
      (src: String, it: Iterator[DocRow], st: GroupState[SourceState]) =>
        fold(src, it, st, ttl))
  }

  /** Drive to completion on a bounded documents drop-dir; returns the
    * per-doc verdict frame ordered by doc_id. */
  def runBounded(spark: SparkSession, glob: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(glob)
    val q = verdicts(stream, ttl = None)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop() // a poisoned batch must not leak a live query
    spark.table(queryName)
      .select($"doc_id", $"source", $"score", $"n_seen", $"admit")
      .orderBy($"doc_id")
  }
}
