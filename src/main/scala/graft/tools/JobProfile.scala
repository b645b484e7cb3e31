package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid: run ONE contract query with a
  * SparkListener that records every job's wall time, task count, and
  * call site, then print the jobs sorted by cost. Answers "where do the
  * seconds of a multi-action query actually go" (train vs store write
  * vs audit vs probe) — the Spark-UI stage view, reduced to a terminal,
  * for sessions where the UI is disabled.
  *
  * Usage: runMain graft.tools.JobProfile <query> [sfDir] [runs]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = -1L,
      var tasks: Int = 0, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs.put(js.jobId, Job(js.jobId, js.time, site = site))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)) / 1e3
          val m = si.taskMetrics
          if (wall > 0.15) println(
            f"[jobprofile]   stage ${si.stageId}%4d ${wall}%7.3f s " +
            f"${si.numTasks}%4d tasks  in=${m.inputMetrics.bytesRead / 1e6}%.1f MB " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1f MB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1f MB  ${si.name}")
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val fn = graft.SparkEntry.queries(name)
    def once(collect: Boolean): Double = {
      collecting = collect
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally {
        collecting = false
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      (System.nanoTime() - t0) / 1e9
    }
    val warm = once(collect = false) // JIT/codegen warm-up
    println(f"[jobprofile] $name warm-up ${warm}%.3f s")
    var best = Double.MaxValue
    (1 to runs).foreach { i =>
      jobs.clear()
      val t = once(collect = true)
      println(f"[jobprofile] $name run$i ${t}%.3f s, ${jobs.size} jobs")
      if (t < best) best = t
      if (i == runs) { // print the last run's breakdown
        import scala.jdk.CollectionConverters._
        val done = jobs.values().asScala.filter(_.end > 0).toSeq
        val total = done.map(j => j.end - j.start).sum / 1e3
        println(f"[jobprofile] job wall sum ${total}%.3f s over ${done.size} jobs (gaps = driver time)")
        val bySite = done.groupBy(_.site).map { case (s, js) =>
          (s, js.map(j => j.end - j.start).sum / 1e3, js.size)
        }.toSeq.sortBy(-_._2)
        bySite.take(30).foreach { case (s, sec, n) =>
          println(f"[jobprofile]   ${sec}%8.3f s  $n%4d jobs  $s")
        }
        done.sortBy(j => -(j.end - j.start)).take(15).foreach { j =>
          println(f"[jobprofile]   job ${j.id}%4d  ${(j.end - j.start) / 1e3}%8.3f s  ${j.site}")
        }
      }
    }
    println(f"[jobprofile] $name best ${best}%.3f s")
    spark.stop()
  }
}
