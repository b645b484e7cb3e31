package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{Context, Tables}
import graft.dedup.Dedup

object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.load(spark, dir, "embeddings")
    for (i <- 1 to 2) {
      val q = Dedup.embeddingNearDupPairs(emb, threshold = 0.2, planes = 4)
      val n = time(s"embed_neardup run$i count")(q.count())
      println(s"[probe] pairs=$n")
    }
    val docs = Tables.load(spark, dir, "documents")
    val g = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5, maxDocFreq = 200)
    val n2 = time("ngram pairs count")(g.count())
    println(s"[probe] ngram pairs=$n2")
    // posting fan-out diagnostics
    val grams = docs.select(col("doc_id").as("id"),
      graft.functions.Text.wordShingles(col("text"), 3).as("grams"))
    val posting = grams.select(col("id"), explode(col("grams")).as("gram"))
    val stats = posting.groupBy("gram").count()
      .agg(count(lit(1)), max("count"), sum(col("count")*col("count"))).collect()(0)
    println(s"[probe] grams=${stats.getLong(0)} maxDf=${stats.getLong(1)} sumSqDf=${stats.getLong(2)}")
    spark.stop()
  }
}
