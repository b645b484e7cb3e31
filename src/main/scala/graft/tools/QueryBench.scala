package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling aid: time named SparkEntry queries N times in ONE
  * session (the Bench.scala execution shape, minus the full sweep) —
  * catches in-session re-run failures and JIT-vs-steady-state deltas that
  * per-query Verify runs cannot.
  *
  * Usage: runMain graft.tools.QueryBench <sfDir> <q1,q2,...> [runs]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // A/B the scale-adaptive scan spread (SPARK_GRAFT_SPREAD_MIN=
      // 9999999999999 disables it) without a checkout — PlanSnap's toggle
      .config("spark.graft.scan.spreadMinBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPREAD_MIN", (128L * 1024).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"[qbench] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
        } catch {
          case e: Throwable =>
            println(s"[qbench] $name run$i FAILED: ${e.getMessage}")
        } finally {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      }
    }
    spark.stop()
  }
}
