package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Error-bound assertions for the two sketch aggregates — the right
  * verification shape for approximate structures whose internals are
  * engine-specific (their contract queries are rows-only by design; this
  * is where their accuracy is actually pinned). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("approx_count_distinct stays within 3x the default 5% rsd") {
    val rows = Tables.load(spark, SparkFixture.sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .select("approx", "exact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(a - e) / e <= 0.15,
        s"approx_count_distinct off by ${math.abs(a - e) / e}: $a vs $e")
    }
  }

  test("approx_percentile(0.5, acc=1000) lands between the exact p45 and p55") {
    val rows = Tables.load(spark, SparkFixture.sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx"),
        expr("percentile(o_totalprice, 0.45)").as("lo"),
        expr("percentile(o_totalprice, 0.55)").as("hi"))
      .select("approx", "lo", "hi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(a >= lo && a <= hi, s"approx p50 $a outside exact [$lo, $hi]")
    }
  }
}
