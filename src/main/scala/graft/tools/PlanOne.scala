package graft.tools
import graft.engine.Context
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(s"exchanges=${"Exchange".r.findAllIn(plan).length}")
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
