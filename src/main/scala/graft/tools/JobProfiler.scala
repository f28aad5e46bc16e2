package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level profile of individual SparkEntry queries: per Spark job, wall
  * time, task count and description, plus the DRIVER GAPS between jobs
  * (planning / listing / collect work that never shows as a job). This is
  * the guide-§1 empirical loop for queries whose cost is many small serial
  * jobs rather than one big stage — the serving paths.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.tools.JobProfiler crawl_pipeline knn_ann_many_shards'
  *
  * Profiles the WARM second run (after one untimed warm-up), the state
  * Bench measures.
  */
object JobProfiler {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = -1L,
        var tasks: Int = 0, var desc: String = "",
        names: java.util.List[String] =
          java.util.Collections.synchronizedList(
            new java.util.ArrayList[String]()))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, e.time)
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, j)
        order.add(e.jobId)
        // JobStart carries the job's stage ids — exact task attribution
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = jobs.get(stageToJob.getOrDefault(e.stageInfo.stageId, -1))
        if (j != null) {
          j.tasks += e.stageInfo.numTasks
          j.names.add(e.stageInfo.name.take(70))
        }
      }
    }

    args.foreach { name =>
      // warm-up (index builds, searcher caches, JIT)
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      graft.CacheScope.releaseAll()
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e6
      spark.sparkContext.removeSparkListener(listener)
      graft.CacheScope.releaseAll()
      Thread.sleep(200) // drain listener bus
      println(f"[prof] ===== $name: wall=$wall%.0f ms, jobs=${order.size()}")
      var prevEnd = -1L
      order.forEach { id =>
        val j = jobs.get(id)
        val gap = if (prevEnd > 0) j.start - prevEnd else 0L
        val dur = if (j.end > 0) j.end - j.start else -1L
        val nm = {
          val it = j.names.iterator(); val b = new StringBuilder
          while (it.hasNext && b.length < 120) { b ++= it.next(); b += ';' }
          b.toString
        }
        println(f"[prof]   job $id%3d dur=$dur%5d ms tasks=${j.tasks}%4d " +
          f"gap_before=$gap%5d ms  ${j.desc.take(40)} | $nm")
        prevEnd = if (j.end > 0) j.end else prevEnd
      }
    }
    spark.stop()
  }
}
