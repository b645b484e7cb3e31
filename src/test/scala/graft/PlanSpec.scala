package graft

/** Plan-shape assertions — the engine's analog of the reference's golden
  * plan-string tests (ref: predicate_pushdown.rs:539-719,
  * projection_pushdown.rs:303-442): instead of matching plan text exactly,
  * assert the properties that matter at scale — pushdown reached the scan,
  * column pruning happened, partial aggregation exists, the dim join
  * broadcasts, top-k fuses. */
class PlanSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sfDir

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("filter predicate pushes into the parquet scan (ref PredicatePushDownRule analog)") {
    val p = plan("q_agg_group")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("column pruning reaches the scan (ref ProjectionPushDownRule analog)") {
    val p = plan("q_join_fanout")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"),
      "lineitem scan should read exactly the 2 needed columns")
  }

  test("grouped aggregation plans partial (map-side) + final phases") {
    val p = plan("q_agg_group")
    assert(p.contains("partial_sum") && p.contains("partial_count"))
  }

  test("dim join resolves to broadcast hash join") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
  }

  test("empty-key theta join plans nested-loop, not shuffle join") {
    assert(plan("q_cross_theta").contains("BroadcastNestedLoopJoin"))
  }

  test("FastSS fuzzy join and near-dup candidate generation never go cartesian") {
    for (q <- Seq("q_fuzzy_join_docs", "q_dedup_minhash",
        "q_dedup_incremental_near", "q_decontaminate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
    }
  }

  test("ANN top-k ranks via partial aggregation, not a per-query window sort") {
    val p = plan("q_ann_topk")
    assert(!p.contains("Window"), "top-k should not shuffle into a window")
    assert(p.contains("partial"), "TopK aggregator should plan a partial phase")
  }

  test("sort+limit fuses to TakeOrderedAndProject (no global sort for top-k)") {
    assert(plan("q_limit").contains("TakeOrderedAndProject"))
  }

  test("PreAggGroupingSets: rollup/cube expand pre-aggregated rows, not the fact table") {
    for (q <- Seq("q_rollup", "q_cube")) {
      val opt = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan
      val expands = opt.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
      }
      assert(expands.nonEmpty, s"$q should still plan an Expand")
      assert(expands.forall(_.child.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
        s"$q: Expand's child must be the injected partial Aggregate")
      assert(opt.toString.contains("_pre0"))
    }
    // guard: a query with DISTINCT aggregates must NOT be rewritten
    val d = SparkEntry.queries("q_agg_distinct")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!d.contains("_pre0"))
  }
}
