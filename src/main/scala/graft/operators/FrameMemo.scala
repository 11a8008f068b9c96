package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) memo of an expensive derived frame — the shared
  * materialization pattern the graph family built in round 12
  * (weighted co-purchase edges, LPA label history) generalized so other
  * families (the dedup corpus shingle occurrences) ride the same
  * machinery instead of re-implementing it.
  *
  * Contract: the memoized value must be DERIVED and DETERMINISTIC — any
  * process rebuilds it on first access, so per-query self-containment
  * holds; within a process the N queries that share the frame pay its
  * materialization once. On a multi-app cluster the same sharing is a
  * bucketed table written at ingest (`jobs/CodesIngest`,
  * `jobs/GraphIngest`); the memo is the in-app equivalent and, where an
  * ingest job exists, the read-through cache over its table.
  *
  * Outer map: WeakHashMap on the user session (the Materialize
  * precedent) so a cached frame cannot pin a dead session live. Values:
  * SoftReferences — a cached DataFrame strongly references its
  * SparkSession, so a plain value would keep the weak KEY strongly
  * reachable and the WeakHashMap could never evict (its documented
  * failure mode); behind a soft ref the whole session+frames chain is
  * reclaimable under memory pressure, and a cleared ref takes the
  * rebuild path.
  *
  * `live` is the per-value liveness check — presence is not enough: a
  * checkpointed frame whose blocks were unpersisted (e.g. a harness
  * deterministically releasing per-query state) has TRUNCATED lineage
  * and cannot recompute; reusing it would fail the job, so it rebuilds
  * instead. Every rebuild of a PREVIOUSLY-CACHED entry logs one line
  * naming the cause (GC-cleared vs dead-lineage — review finding r12:
  * a GC-induced rebuild mid-benchmark must be self-diagnosing rather
  * than appearing as unexplained rep spread). */
final class FrameMemo[T](name: String, live: (SparkSession, T) => Boolean) {

  private val cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, java.lang.ref.SoftReference[T]]]()

  /** The live memoized value for (s, key), else `build` (memoizing it).
    * Synchronized across sessions: builds are idempotent, but two
    * threads of one session must not race a double build. */
  def getOrBuild(s: SparkSession, key: String)(build: => T): T = synchronized {
    val perKey = {
      var m = cache.get(s)
      if (m == null) { m = scala.collection.mutable.Map(); cache.put(s, m) }
      m
    }
    val ref = perKey.get(key)
    val value = ref.flatMap(r => Option(r.get()))
    value.filter(live(s, _)).getOrElse {
      if (ref.isDefined) {
        val cause = if (value.isEmpty) "GC-cleared" else "dead-lineage"
        System.err.println(s"[graft] memo $name/$key $cause — rebuilding")
      }
      val built = build
      perKey(key) = new java.lang.ref.SoftReference(built)
      built
    }
  }

  /** All LIVE values cached for this session (dead/cleared entries are
    * awaiting rebuild — not reported). */
  def liveValues(s: SparkSession): Seq[T] = synchronized {
    val m = cache.get(s)
    if (m == null) Seq.empty
    else m.values.flatMap(r => Option(r.get())).filter(live(s, _)).toSeq
  }

  /** Drop this session's entries (test hook — forces the rebuild path a
    * fresh process would take). */
  def clear(s: SparkSession): Unit = synchronized {
    val m = cache.get(s)
    if (m != null) m.clear()
  }
}

object FrameMemo {

  /** The checkpoint RDD id of a frame whose plan is a LogicalRDD. */
  def rddIdOf(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }

  /** Liveness of one checkpointed frame: its block manager entry still
    * exists (an externally-unpersisted checkpoint is dead lineage). */
  def frameLive(s: SparkSession, df: DataFrame): Boolean =
    rddIdOf(df).exists(s.sparkContext.getPersistentRDDs.contains)

  /** Liveness of a frame vector: ALL members must be live. */
  def framesLive(s: SparkSession, dfs: Seq[DataFrame]): Boolean =
    dfs.forall(frameLive(s, _))
}
