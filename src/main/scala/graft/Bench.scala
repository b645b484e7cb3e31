package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is forced with a noop-format write — unlike count(), this
  * materializes every output column and cannot let the optimizer drop
  * sorts/projections, so the timing covers the full declared plan. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    // Per-query state isolation, OUTSIDE the timed region (the former
    // shape ran cleanup inside a `finally` that the elapsed expression
    // waited on, charging cleanup to the query being measured):
    // clearCache drops DataFrame persists; iterative operators
    // (BFS/CC/PageRank) also leave RDD persists and localCheckpoint
    // blocks behind — across a 276-query sweep those accumulate into
    // block-manager memory pressure that taxes every later query (dedup
    // family measured 2x slower in-session than isolated before this
    // cleanup). The explicit GC then lets ContextCleaner's
    // reference-queue pass reclaim dropped shuffle files and broadcast
    // blocks between queries — the shuffle-file accumulation suspected
    // behind the r7 4-5x in-sweep outliers (q_dedup_survivors 10.4 s
    // in-sweep vs 2.5 s steady on identical code). Opt out with
    // SPARK_GRAFT_BENCH_NO_GC=1.
    val gcBetween = !sys.env.contains("SPARK_GRAFT_BENCH_NO_GC")
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (gcBetween) { System.gc(); Thread.sleep(50) }
    }

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val elapsed =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] failed: ${e.getMessage}"); -1.0
        }
      isolate()
      elapsed
    }

    // Warm-up: run every query once at the smallest scale factor so the
    // measured pass reports steady-state (codegen classes compiled, JIT
    // warm) rather than first-run compilation latency. Falls back to a
    // single-query warm-up if sf0.001 is absent.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        // NonFatal: warm-up failures are fine, VM errors/interrupts are not
        catch { case scala.util.control.NonFatal(_) => () }
        finally isolate() // warm-up persists must not leak into the runs
      }
    else SparkEntry.queries.get("q_scan").foreach(run)
    // Min of two measured runs per query: the second run reuses compiled
    // codegen classes, so the min reflects steady-state execution rather
    // than JIT noise — stabilizes round-over-round comparisons.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a = run(fn); val b = run(fn)
      name -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // SHORT line FIRST **and** LAST: the per-query line between them can
    // run long (one entry per query), and a log capture may keep only a
    // head OR only a tail — bracketing with the compact headline
    // guarantees an intact parsable line in either capture.
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(shortLine)
    println(fullLine)
    println(shortLine)
    // also persist the complete per-query map to a repo file: the driver's
    // log tail keeps only ~2 KB, which truncates the per-query line at
    // ~45 of 240+ entries — BENCH_LOCAL.json lets round-over-round
    // comparison diff EVERY query. Anchored to the REPO ROOT (env
    // override, else derived from the compiled-classes location:
    // <repo>/target/scala-2.13/classes), never the JVM cwd — a bench
    // launched from a tool dir must not silently strand the evidence.
    try {
      val repoRoot = sys.env.get("SPARK_GRAFT_REPO_DIR").getOrElse {
        // The code source is <repo>/target/scala-2.13/classes for a plain
        // classpath run, but sbt's FORKED runMain repackages classes into
        // <repo>/target/bg-jobs/sbt_*/job-*/target/*/*.jar — a fixed
        // number of getParent hops silently lands inside that transient
        // dir and the artifact evaporates with it. Walk UP until the
        // directory actually holding build.sbt (the repo root marker);
        // fall back to the JVM cwd if the walk never finds one.
        // getCodeSource may be null (boot/layered classloaders) — that
        // must fall into the user.dir fallback, not NPE into the outer
        // catch and silently strand the artifact
        Option(Bench.getClass.getProtectionDomain.getCodeSource)
          .flatMap { cs =>
            val start = java.nio.file.Paths.get(cs.getLocation.toURI)
            Iterator.iterate(start)(_.getParent).takeWhile(_ != null)
              .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
              .map(_.toString)
          }
          .getOrElse(System.getProperty("user.dir"))
      }
      val out = java.nio.file.Paths.get(repoRoot, "BENCH_LOCAL.json")
      java.nio.file.Files.writeString(out, fullLine + "\n")
      System.err.println(s"[bench] wrote $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}") }
    spark.stop()
  }
}
