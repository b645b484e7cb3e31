package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Context, Tables}
import graft.functions.native

/** Stage-by-stage timing of the FastSS edit-distance join at sf0.1. */
object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fz] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[fz] ---- pass $round")
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 24).as("k"))

      val posted = docs.select(col("doc_id").as("id"), col("k").as("key"),
        explode(native.deletion_variant_hashes(col("k"), 2)).as("variant"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("posting persist")(println("[fz]   posting rows: " + posted.count()))

      val hot = posted.groupBy("variant").agg(count(lit(1)).as("n"))
      time("variant stats")(hot.agg(count(lit(1)), max("n"),
        sum(col("n") * (col("n") - 1) / 2)).show(false))

      val l = posted.select(col("variant"), col("id").as("id_a"), col("key").as("key_a"))
      val r = posted.select(col("variant"), col("id").as("id_b"), col("key").as("key_b"))
      val raw = l.join(r, "variant").filter(col("id_a") < col("id_b"))
      time("raw pair count")(println("[fz]   raw pairs: " + raw.count()))
      val ded = raw.dropDuplicates("id_a", "id_b")
      time("dedup count")(println("[fz]   dedup pairs: " + ded.count()))

      val e2e = graft.dedup.Dedup.editDistancePairs(docs, "k", "doc_id",
        maxDist = 2, maxBucketSize = 100000)
      time("editDistancePairs e2e")(println("[fz]   final pairs: " + e2e.count()))
      posted.unpersist()
    }
    spark.stop()
  }
}
