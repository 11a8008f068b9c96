package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
  *    IllegalStateException naming the holder;
  *  - a STALE lease (older than `spark.graft.lease.staleMs`, default
  *    15 min — a crashed writer) is stolen: deleted and re-acquired
  *    once. Mutations are crash-safe by their own commit protocols
  *    (StagedRewrite / GraphIngest.heal), so stealing is safe — the
  *    thief's first act is healing whatever the corpse left;
  *  - re-entry within this JVM (advanceState → heal, retractBatch →
  *    advanceState, compact → heal) passes through — the per-family
  *    object locks already serialize same-name writers in-process,
  *    which is what makes the held-set check race-free.
  *
  * The lease is advisory (a writer that does not call [[withLease]] is
  * not stopped) — it guards the repo's OWN mutators, which all route
  * through it. */
object WriterLease {

  /** Names leased by THIS JVM right now (re-entry pass-through). */
  private val held = scala.collection.mutable.Set[String]()

  private def staleMs(s: SparkSession): Long =
    s.conf.getOption("spark.graft.lease.staleMs")
      .map(_.toLong).getOrElse(15L * 60L * 1000L)

  /** The lease file guarding `name` (a table prefix). */
  def leasePath(s: SparkSession, name: String): Path =
    new Path(s.conf.get("spark.sql.warehouse.dir"),
      s"${name.toLowerCase}__lease")

  private def acquire(s: SparkSession, name: String): Unit = {
    val path = leasePath(s, name)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    def tryCreate(): Boolean =
      try {
        val out = fs.create(path, false)
        try out.write(
          s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val st = try Some(fs.getFileStatus(path))
        catch { case _: java.io.FileNotFoundException => None }
      val stale = st.forall(f =>
        System.currentTimeMillis() - f.getModificationTime > staleMs(s))
      if (stale) fs.delete(path, false) // crashed writer: steal once
      if (stale && tryCreate()) ()
      else throw new IllegalStateException(
        s"another writer holds the lease on $name (${path}): " +
          "one mutating process per warehouse — wait for it, or delete " +
          "the lease file if its holder is known dead " +
          s"(auto-stolen after ${staleMs(s)} ms)")
    }
  }

  /** Run `f` holding the cross-process lease on `name`. */
  def withLease[T](s: SparkSession, name: String)(f: => T): T = {
    val first = held.synchronized { held.add(name) }
    if (!first) f // re-entrant within this JVM
    else {
      // a FAILED acquire must not release anything — the live lease
      // file belongs to the other writer
      try acquire(s, name)
      catch {
        case e: Throwable => held.synchronized { held -= name }; throw e
      }
      try f
      finally {
        val path = leasePath(s, name)
        path.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(path, false)
        held.synchronized { held -= name }
      }
    }
  }
}
