package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning on skew: one hot key dominating a sort-merge
  * join gets split into multiple reader partitions at runtime — the
  * mechanism SCALE.md leans on for moderate skew (explicit salting covers
  * the extreme case; see Relational.saltedJoin). */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // one hot key (0) carries ~100k rows; 1000 cold keys carry 10 each
      val left = spark.range(100000).select(lit(0L).as("k"), col("id").as("lv"))
        .union(spark.range(10000).select((col("id") % 1000 + 1).as("k"), col("id").as("lv")))
      val right = spark.range(1001).select(col("id").as("k2"), (col("id") * 2).as("rv"))
      val joined = left.join(right, col("k") === col("k2"))
      // collect() executes THIS Dataset's QueryExecution (count() would
      // build a fresh one and leave this plan un-finalized)
      assert(joined.collect().length == 110000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("skew"), // AQEShuffleRead marks split partitions
        s"expected AQE skew-split readers in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
