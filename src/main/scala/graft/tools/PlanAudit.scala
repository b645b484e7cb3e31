package graft.tools

import graft.engine.Context

/** Prints plan-quality signals for headline queries: scan pushdown,
  * join strategy, codegen coverage. Run with SPARK_GRAFT_SF_DIR. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[8]", 8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_agg_group", "q_join_inner", "q_join_fanout", "q_filter",
      "q_projection", "q_window_rank", "q_dedup_minhash", "q_ann_topk",
      "q_asof", "q_events_hourly")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct").filter(plan.contains)
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      val exch = "Exchange".r.findAllIn(plan).length
      val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
      println(s"=== $n")
      println(s"  joins: ${joins.mkString(",")}  codegenSpans: $wsc  exchanges: $exch")
      pushed.foreach(p => println(s"  $p"))
      if (readSchema.nonEmpty) println(s"  ${readSchema.take(160)}")
    }
    spark.stop()
  }
}
