package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{Context, Tables}

/** Ad-hoc: dump analyzed/optimized plan trees for grouping-set queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[4]", 4)
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
    val q = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"),
        min(col("l_extendedprice")).as("m"))
    println("==== analyzed"); println(q.queryExecution.analyzed.treeString)
    println("==== optimized"); println(q.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
