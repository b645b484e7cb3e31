package graft.tools

import graft.engine.Context

object Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[8]", 8)
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q_agg_group")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("[probe] codegen spans after exec: " +
      "WholeStageCodegen".r.findAllIn(plan).length)
    println("[probe] plan head:\n" + plan.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
