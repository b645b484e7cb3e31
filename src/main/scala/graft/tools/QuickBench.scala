package graft.tools

import org.apache.spark.sql.SparkSession

/** Local iteration timer: times the named contract queries (min of two
  * noop-write runs, same harness shape as Bench) on SPARK_GRAFT_SF_DIR.
  * `runMain graft.tools.QuickBench q_a q_b …` — keeps the feedback loop
  * per-query instead of paying the full 250+-query sweep while tuning. */
object QuickBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QuickBench <query> [query …]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      run(fn) // warm
      val t = math.min(run(fn), run(fn))
      println(f"[quickbench] $name%-28s ${t}%.3f s")
    }
    spark.stop()
  }
}
