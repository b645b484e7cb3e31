package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{Context, Tables}

object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val grams = docs.select(col("doc_id").as("id"),
      graft.functions.Text.wordShingles(col("text"), 3).as("grams"))
      .withColumn("n_grams", size(col("grams")).cast("long"))
    time("grams noop")(grams.write.format("noop").mode("overwrite").save())
    val posting = grams.select(col("id"), col("n_grams"), explode(col("grams")).as("gram"))
    time("posting noop")(posting.write.format("noop").mode("overwrite").save())
    val cached = posting.persist()
    time("posting persist count")(cached.count())
    val dfCut = cached.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") <= 200)
    time("dfcut noop")(dfCut.write.format("noop").mode("overwrite").save())
    val pruned = cached.join(dfCut.select("gram"), "gram")
    time("pruned noop")(pruned.write.format("noop").mode("overwrite").save())
    val l = pruned.select(col("gram"), col("id").as("id_a"), col("n_grams").as("na"))
    val r = pruned.select(col("gram"), col("id").as("id_b"), col("n_grams").as("nb"))
    val joined = l.join(r, "gram").filter(col("id_a") < col("id_b"))
    time("pair join noop")(joined.write.format("noop").mode("overwrite").save())
    val agg = joined.groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("shared"))
    time("pair agg noop")(agg.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
