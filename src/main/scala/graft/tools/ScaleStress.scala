package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import scala.collection.mutable

/** sf1-scale skew stress for the dedup spine (VERDICT r4 item 5).
  *
  * The driver corpus tops out at sf0.1 (5k documents), so this tool
  * DERIVES a 10x stress corpus in /tmp: replica 0 is the original
  * document set; replicas 1..9 append a per-replica marker token so the
  * copies are near- (not exact-) duplicates — every original becomes a
  * 10-member near-dup cluster, which multiplies candidate-pair volume
  * ~100x inside exactly the shared buckets where skew lives. Stress
  * corpus for plan-shape + runtime-skew measurement only; correctness
  * oracles stay at the driver scale factors.
  *
  * Each pipeline runs in its SCALE configuration (library-default hot
  * bucket caps) — the contract queries deliberately uncap
  * (maxBucketSize=100000, maxDocFreq=200-uncapped) so their O(n²) DuckDB
  * twins stay exact, which is the oracle trade, not the production one.
  * Reported per query: wall seconds, rows, task count, and the
  * worst-stage skew = max/median task runtime within the heaviest
  * stages (stages with >= 2 s of total task time; tiny-task stages say
  * nothing about skew). SCALE.md gate: worst-stage max <= 4x median.
  *
  * Usage: runMain graft.tools.ScaleStress [factor]
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val srcDir = "/root/testdata/sf0.1"
    val outDir = "/tmp/graft_sfstress"
    val spark = graft.engine.Context.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")

    val marker = new java.io.File(s"$outDir/.factor_$factor")
    if (!marker.exists()) {
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      val n = docs.count()
      val reps = docs.crossJoin(
          spark.range(factor).select(col("id").as("rep")))
        .select(
          (col("doc_id") + col("rep") * n).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep"), col("rep")))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      reps.repartition(32).write.mode("overwrite")
        .parquet(s"$outDir/documents.parquet")
      new java.io.File(outDir).mkdirs()
      marker.createNewFile()
      println(s"[stress] built ${n * factor}-doc corpus at $outDir")
    }

    // (stageId -> task durations) per measured query
    val byStage = new mutable.HashMap[Int, mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) byStage.synchronized {
          byStage.getOrElseUpdate(e.stageId, mutable.ArrayBuffer.empty)
            .append(e.taskInfo.duration)
        }
    })

    import graft.dedup.Dedup
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val docs24 = docs.select(col("doc_id"), substring(col("text"), 1, 24).as("k"))
    def pairsDefault = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
    val pipelines: Seq[(String, () => DataFrame)] = Seq(
      "minhash_verified" -> (() => Dedup.minhashVerifiedPairs(docs, threshold = 0.7)),
      "fuzzy_join" -> (() => Dedup.editDistancePairs(docs24, "k", "doc_id", maxDist = 2)),
      "dedup_best" -> (() => Dedup.nearDupSurvivorsBy(docs, pairsDefault, col("n_chars"))),
      "dedup_survivors" -> (() => Dedup.nearDupSurvivors(docs, pairsDefault)),
      "incremental_near" -> (() => Dedup.minhashNewOnly(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), threshold = 0.7))
    )

    def measure(name: String, mk: () => DataFrame): Unit = {
      byStage.synchronized(byStage.clear())
      val t0 = System.nanoTime()
      val rows = mk().count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // task-end events arrive on the async listener bus after the job
      // returns — poll until the captured count stops moving so the
      // slowest task can't be missed and late events can't bleed into
      // the next pipeline's cleared map
      var prevN = -1
      var curN = byStage.synchronized(byStage.valuesIterator.map(_.size).sum)
      var drainRounds = 0
      while (curN != prevN && drainRounds < 50) {
        Thread.sleep(100)
        prevN = curN
        curN = byStage.synchronized(byStage.valuesIterator.map(_.size).sum)
        drainRounds += 1
      }
      val stages = byStage.synchronized(byStage.map { case (k, v) =>
        (k, v.toSeq.sorted) }.toMap)
      val nTasks = stages.valuesIterator.map(_.size).sum
      // stages with >= 2 s total task time carry the real work; report
      // the worst max/median ratio among them
      val heavy = stages.filter(_._2.sum >= 2000)
      val worst = heavy.values.map { ds =>
        val med = math.max(1L, ds(ds.size / 2))
        (ds.last.toDouble / med, ds.last, med, ds.size)
      }.toSeq.sortBy(-_._1).headOption
      val w = worst.map { case (r, mx, md, nt) =>
        f"$r%6.2fx  (max $mx%6d / med $md%5d over $nt%4d tasks)"
      }.getOrElse("no stage >= 2s")
      println(f"$name%-18s $wall%8.2f $rows%9d $nTasks%7d  $w")
    }

    println(f"${"pipeline"}%-18s ${"wall_s"}%8s ${"rows"}%9s ${"tasks"}%7s ${"worst-stage max/med (ms, tasks)"}")
    pipelines.foreach { case (name, mk) => measure(name, mk) }

    // graph family at the same 10x node count (50k nodes, 150k directed
    // edges: ring + skip + affine — same generator family as the
    // contract queries, so the plan shapes match what PLANS.md audits)
    val nNodes = docs.count()
    val nodes = docs.select(col("doc_id").as("node_id"))
    val id = col("doc_id")
    val edges = docs.select(id.as("src"), ((id + 1) % nNodes).as("dst"))
      .union(docs.select(id.as("src"), ((id + 2) % nNodes).as("dst")))
      .union(docs.select(id.as("src"), ((id * 7 + 3) % nNodes).as("dst")))
    val seeds = nodes.filter(col("node_id") < 2)
    val graphPipelines: Seq[(String, () => DataFrame)] = Seq(
      "pagerank_3it" -> (() =>
        graft.graph.PageRank.run(nodes, edges, nNodes, iters = 3)),
      "trustrank_3it" -> (() =>
        graft.graph.PageRank.personalizedRun(nodes, edges, seeds, 2, 3)),
      "bfs_4hop" -> (() => graft.graph.Bfs.hops(edges, seeds, 4)),
      "triangles" -> (() => graft.graph.Triangles.perNode(edges))
    )
    graphPipelines.foreach { case (name, mk) => measure(name, mk) }

    // round-5 late additions: the session's heaviest new operators at
    // the same 10x corpus (50k docs / 50k-node graph)
    val embPath = s"$srcDir/embeddings.parquet"
    val emb = spark.read.parquet(embPath)
    val latePipelines: Seq[(String, () => DataFrame)] = Seq(
      "sorted_neighborhood" -> (() =>
        Dedup.sortedNeighborhoodPairs(docs, windowSize = 4)),
      "novelty_rate" -> (() =>
        graft.functions.Text.noveltyRate(docs, n = 3)),
      "simhash_calibration" -> (() =>
        Dedup.simhashCalibration(docs, maxHamming = 3)),
      "clustering_coef" -> (() =>
        graft.graph.Triangles.clusteringCoefficient(edges)),
      "keywords_top3" -> (() =>
        graft.functions.Text.topTerms(docs, k = 3)),
      "mean_pool" -> (() =>
        graft.similarity.Pooling.meanByGroup(emb, "label", "embedding",
          "vec_id"))
    )
    latePipelines.foreach { case (name, mk) => measure(name, mk) }

    // round-6 additions: the rank-selection spine and the
    // vocabulary-postings join at the same 10x corpus
    val r6Pipelines: Seq[(String, () => DataFrame)] = Seq(
      "trimmed_mean" -> (() => graft.operators.Analytics
        .trimmedMean(docs, Seq("lang"), "n_chars", trim = 0.05)),
      "rank_spine" -> (() => graft.operators.Analytics
        .rankedByGroup(docs, Nil, "n_chars")),
      "vocab_overlap" -> (() => {
        val toks = docs.select(col("source"),
            explode(split(col("text"), "\\s+")).as("tok"))
          .filter(col("tok") =!= "").distinct()
        toks.select(col("source").as("src_a"), col("tok"))
          .join(toks.select(col("source").as("src_b"), col("tok")),
            Seq("tok"))
          .filter(col("src_a") =!= col("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      })
    )
    r6Pipelines.foreach { case (name, mk) => measure(name, mk) }
    spark.stop()
  }
}
