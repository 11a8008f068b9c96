package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-18 probe: per-JOB wall/task-time breakdown of one query run.
  *
  * The heavy queries here are multi-job (iterative loops, checkpoint
  * materializations, range-sample passes); stage-level task metrics say
  * whether a slow query is compute-bound (task time ≈ wall × cores) or
  * overhead-bound (many short jobs, wall ≫ task time / cores — the
  * scheduling/planning fixed costs the optimization guide's §1 empirical
  * loop needs separated before any operator work). */
object R18JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    case class Job(id: Int, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
      var gcMs: Long = 0L, var shuffleWrite: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs(e.jobId) = Job(e.jobId, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          j.taskMs += si.taskMetrics.executorRunTime
          j.gcMs += si.taskMetrics.jvmGCTime
          j.shuffleWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup (shared frames, codegen)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val keep = graft.queries.GraphQueries.sharedRddIds(spark) ++
        graft.queries.DedupQueries.sharedRddIds(spark)
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep.contains(id)) rdd.unpersist(blocking = false) }

      jobs.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      // the declared query verbatim (round 19: sortShared moved into the
      // query layer, so allowlisted queries already carry it)
      fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"===== $name wall=$wall%.3f s, ${jobs.size} jobs =====")
      jobs.values.foreach { j =>
        println(f"[job ${j.id}%3d] wall=${(j.t1 - j.t0) / 1e3}%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskMs / 1e3}%8.3f s gc=${j.gcMs / 1e3}%7.3f s shufW=${j.shuffleWrite / 1024}%8d KB")
      }
      val totalJobWall = jobs.values.map(j => j.t1 - j.t0).sum / 1e3
      val gaps = wall - totalJobWall
      println(f"[sum] jobWall=$totalJobWall%.3f s, outside-jobs (planning/driver)=$gaps%.3f s")
    }
    spark.stop()
  }
}
