package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The typed face of lease contention: thrown ONLY when another
  * process's live lease refuses an acquire — never by the guarded work
  * itself — so a bounded-wait caller ([[graft.io.KvSink
  * .withStoreLeaseRetry]]) can retry contention precisely without
  * swallowing real IllegalStateExceptions from the work it wraps.
  * Subclasses IllegalStateException, so every existing fail-fast
  * contract (and spec) is unchanged. */
class LeaseHeldException(msg: String) extends IllegalStateException(msg)

/** Cross-PROCESS single-writer guard for the state-ingest jobs (VERDICT
  * r14 item 7): `OccIngest`/`CodesIngest`/`RotIngest`/`GraphIngest`
  * serialize writers per JVM with object locks, but two processes
  * sharing one warehouse (the stated deployment) could still race
  * DROP/append/swap. A lease FILE in the warehouse dir — created
  * atomically with `FileSystem.create(overwrite = false)`, the same
  * primitive HDFS/GCS-connector leases build on — turns the documented
  * one-writer-per-warehouse contract into a fail-fast:
  *
  *  - a live lease held by another process refuses the mutation with an
  *    IllegalStateException naming the lease file;
  *  - the holder HEARTBEATS: a daemon thread refreshes the lease mtime
  *    every staleMs/3, so a long-running mutation (a 100 TB compact
  *    easily exceeds any fixed budget) is never misclassified as dead
  *    (review r15) — only a crashed writer's lease goes stale;
  *  - a STALE lease (older than `spark.graft.lease.staleMs`, default
  *    15 min) is stolen ATOMICALLY: the thief RENAMEs the stale file to
  *    a unique name (rename is the atomic primitive — of two racing
  *    thieves exactly one rename succeeds; review r15) and only then
  *    creates its own. Stealing is safe because every mutation is
  *    crash-safe by its own commit protocol (StagedRewrite /
  *    GraphIngest.heal) — the thief's first act is healing whatever the
  *    corpse left;
  *  - re-entry within this JVM (advanceState → heal, retractBatch →
  *    advanceState, compact → heal) passes through, keyed by the FULL
  *    lease path — two same-JVM sessions over different warehouses hold
  *    independent leases (review r15);
  *  - `create` succeeding IS the acquisition: the informational payload
  *    write is best-effort, so a payload I/O hiccup cannot strand a
  *    half-created lease that locks out its own writer (review r15).
  *
  * The lease is advisory (a writer that does not call [[withLease]] is
  * not stopped) — it guards the repo's OWN mutators, which all route
  * through it. */
object WriterLease {

  /** Lease paths held by THIS JVM right now (re-entry pass-through). */
  private val held = scala.collection.mutable.Set[String]()

  private def staleMs(s: SparkSession): Long =
    s.conf.getOption("spark.graft.lease.staleMs")
      .map(_.toLong).getOrElse(15L * 60L * 1000L)

  /** The lease file guarding `name` (a table prefix). */
  def leasePath(s: SparkSession, name: String): Path =
    new Path(s.conf.get("spark.sql.warehouse.dir"),
      s"${name.toLowerCase}__lease")

  private def tryCreate(fs: org.apache.hadoop.fs.FileSystem,
      path: Path): Boolean =
    try {
      val out = fs.create(path, false)
      // the create IS the acquisition — the payload is informational
      // and must not be able to fail the acquire halfway
      try {
        out.write(java.lang.management.ManagementFactory
          .getRuntimeMXBean.getName.getBytes("UTF-8"))
        out.close()
      } catch { case _: java.io.IOException => try out.close() catch { case _: Throwable => } }
      true
    } catch { case _: java.io.IOException => false }

  private def acquire(s: SparkSession, path: Path): Unit = {
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!tryCreate(fs, path)) {
      val st = try Some(fs.getFileStatus(path))
        catch { case _: java.io.FileNotFoundException => None }
      val stale = st.forall(f =>
        System.currentTimeMillis() - f.getModificationTime > staleMs(s))
      // atomic steal: rename the EXACT stale file away — of two racing
      // thieves only one rename succeeds, and a fresh lease that
      // replaced the stale one in between is not the renamed file
      // (rename fails on a missing source), so a live writer's new
      // lease is never deleted
      val graveyard = new Path(path.getParent, path.getName + ".stale." +
        java.util.UUID.randomUUID().toString)
      val stolen = stale && (try fs.rename(path, graveyard)
      catch { case _: java.io.IOException => false })
      if (stolen) // the corpse is evidence no longer needed
        try fs.delete(graveyard, false)
        catch { case _: java.io.IOException => }
      if (!(stolen && tryCreate(fs, path)))
        throw new LeaseHeldException(
          s"another writer holds the lease ($path): one mutating " +
            "process per warehouse — wait for it, or delete the lease " +
            "file if its holder is known dead " +
            s"(auto-stolen after ${staleMs(s)} ms without heartbeat)")
    }
  }

  /** Run `f` holding the cross-process lease on `name`, heartbeating
    * the lease mtime for as long as `f` runs. */
  def withLease[T](s: SparkSession, name: String)(f: => T): T = {
    val path = leasePath(s, name)
    val key = path.toString
    val first = held.synchronized { held.add(key) }
    if (!first) f // re-entrant within this JVM (same warehouse + name)
    else {
      // a FAILED acquire must not release anything — the live lease
      // file belongs to the other writer
      try acquire(s, path)
      catch {
        case e: Throwable => held.synchronized { held -= key }; throw e
      }
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      val beat = new java.util.concurrent.atomic.AtomicBoolean(true)
      val interval = math.max(1000L, staleMs(s) / 3)
      val heart = new Thread(() => {
        while (beat.get()) {
          try Thread.sleep(interval)
          catch { case _: InterruptedException => }
          if (beat.get())
            try fs.setTimes(path, System.currentTimeMillis(), -1)
            catch { case _: java.io.IOException => } // next beat retries
        }
      }, s"graft-lease-heartbeat-$name")
      heart.setDaemon(true)
      heart.start()
      try f
      finally {
        beat.set(false)
        heart.interrupt()
        fs.delete(path, false)
        held.synchronized { held -= key }
      }
    }
  }
}
