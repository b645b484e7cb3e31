package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{Context, Tables}

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      val q = graft.SparkEntry.queries("q_filter")(spark, dir)
      time(s"q_filter run$i")(q.write.format("noop").mode("overwrite").save())
    }
    val noSort = Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30.0 && col("l_discount") <= 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    time("filter only, no sort")(noSort.write.format("noop").mode("overwrite").save())
    time("filter + sort")(noSort.orderBy("l_orderkey","l_linenumber","l_quantity","l_discount")
      .write.format("noop").mode("overwrite").save())
    val q2 = graft.SparkEntry.queries("q_text_quality")(spark, dir)
    time("q_text_quality run1")(q2.write.format("noop").mode("overwrite").save())
    time("q_text_quality run2")(q2.write.format("noop").mode("overwrite").save())
    graft.SparkEntry.queries("q_filter")(spark, dir).explain("formatted")
    spark.stop()
  }
}
