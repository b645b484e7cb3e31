package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Context, Tables}
import graft.functions.native

/** Stage-by-stage timing of the n-gram Jaccard dedup pipeline (the slowest
  * bench query) — run ad hoc to see where wall-clock goes before touching
  * the algorithm. Mirrors Dedup.ngramJaccardPairs stage boundaries. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = 3; val threshold = 0.5; val maxDocFreq = 200

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngram] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[ngram] ---- pass $round")
      val grams = Tables.load(spark, dir, "documents")
        .select(col("doc_id").as("id"), native.word_ngram_hashes(col("text"), n).as("grams"))
        .withColumn("n_grams", size(col("grams")).cast(LongType))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("gram+persist")(grams.count())

      val posting = grams.select(col("id"), col("n_grams"), explode(col("grams")).as("gram"))
      val gramDf = posting.groupBy("gram").agg(count(lit(1)).as("df"))
      time("gramDf count")(println("[ngram]   distinct grams: " + gramDf.count()))

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("df").asc, col("gram").asc)
      val prefixLen = (col("n_grams") - ceil(col("n_grams") * threshold) + 1).cast(LongType)
      val prefix = posting.join(gramDf.filter(col("df") <= maxDocFreq), "gram")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= prefixLen)
        .select(col("gram"), col("id"), col("rank"), col("n_grams"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefix join+window")(println("[ngram]   prefix rows: " + prefix.count()))

      val pa = prefix.select(col("gram"), col("id").as("id_a"), col("rank").as("pa"), col("n_grams").as("na"))
      val pb = prefix.select(col("gram"), col("id").as("id_b"), col("rank").as("pb"), col("n_grams").as("nb"))
      val minOverlap = (col("na") + col("nb")) * (threshold / (1.0 + threshold)) - 1e-9
      val cand = pa.join(pb, "gram")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(max(least(col("na") - col("pa"), col("nb") - col("pb"))).as("slack"))
        .filter((col("slack") + 1).cast(DoubleType) >= minOverlap)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("candidate self-join")(println("[ngram]   candidates: " + cand.count()))

      val ga = grams.select(col("id").as("id_a"), col("grams").as("grams_a"), col("n_grams").as("na"))
      val gb = grams.select(col("id").as("id_b"), col("grams").as("grams_b"), col("n_grams").as("nb"))
      val out = cand.join(ga, "id_a").join(gb, "id_b")
        .withColumn("shared", native.sorted_intersect(col("grams_a"), col("grams_b")).cast(LongType))
        .select(col("id_a"), col("id_b"),
          (col("shared").cast(DoubleType) /
            (col("na") + col("nb") - col("shared")).cast(DoubleType)).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      time("verify")(println("[ngram]   pairs: " + out.count()))
      grams.unpersist(); prefix.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
