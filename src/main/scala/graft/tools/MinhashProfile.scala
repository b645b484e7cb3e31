package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Context, Tables}
import graft.functions.native

/** Stage-by-stage timing of the exact-verified MinHash pipeline — run ad
  * hoc to see where wall-clock goes before touching the algorithm.
  * Mirrors Dedup.minhashVerifiedPairs stage boundaries. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val numHashes = 64; val bands = 16; val shingle = 5

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[mh] ---- pass $round")
      val docs = Tables.load(spark, dir, "documents")
      val sig = docs.select(col("doc_id").as("id"),
        native.minhash_sig(col("text"), numHashes, shingle).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("signature+persist")(println("[mh]   docs: " + sig.count()))

      val banded = sig.select(col("id"), col("sig"),
        posexplode(native.minhash_bands(col("sig"), bands)).as(Seq("band_id", "band_hash")))
      val bstats = banded.groupBy("band_id", "band_hash").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"), max("n").as("max_bucket"),
          sum(col("n") * (col("n") - 1) / 2).as("in_bucket_pairs"))
      time("bucket stats")(bstats.show(false))

      val l = banded.select(col("band_id"), col("band_hash"), col("id").as("id_a"), col("sig").as("sig_a"))
      val r = banded.select(col("band_id"), col("band_hash"), col("id").as("id_b"), col("sig").as("sig_b"))
      val agree = native.sig_agree(col("sig_a"), col("sig_b")).cast(DoubleType)
      val cand = l.join(r, Seq("band_id", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), (agree / numHashes.toDouble).as("est_jaccard"))
        .dropDuplicates("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("band join + pair dedup")(println("[mh]   candidate pairs: " + cand.count()))
      time("  est>=0.4 pairs")(println("[mh]   est>=0.4: " + cand.filter(col("est_jaccard") >= 0.4).count()))

      val sh = docs.select(col("doc_id").as("id"),
          native.char_shingle_hashes(col("text"), shingle).as("sh"))
        .withColumn("n_sh", size(col("sh")).cast(LongType))
      val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n_sh").as("na"))
      val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n_sh").as("nb"))
      val out = cand.join(a, "id_a").join(b, "id_b")
        .withColumn("shared", native.sorted_intersect(col("sh_a"), col("sh_b")).cast(LongType))
        .select(col("id_a"), col("id_b"),
          (col("shared").cast(DoubleType) /
            (col("na") + col("nb") - col("shared")).cast(DoubleType)).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
      time("exact verify join")(println("[mh]   final pairs: " + out.count()))
      cand.unpersist(); sig.unpersist()

      val e2e = graft.dedup.Dedup.minhashVerifiedPairs(docs, threshold = 0.7,
        maxBucketSize = 100000)
      time("minhashVerifiedPairs e2e")(println("[mh]   e2e pairs: " + e2e.count()))

      // slim stage breakdown
      val slim = docs.select(col("doc_id").as("id"),
          posexplode(native.minhash_bands(native.minhash_sig(col("text"), numHashes, shingle), bands))
            .as(Seq("band_id", "band_hash")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("slim banded persist")(println("[mh]   banded rows: " + slim.count()))
      val sl = slim.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
      val sr = slim.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
      val scand = sl.join(sr, Seq("band_id", "band_hash"))
        .filter(col("id_a") < col("id_b"))
      time("slim join raw count")(println("[mh]   raw pair rows: " + scand.count()))
      val sdedup = scand.dropDuplicates("id_a", "id_b")
      time("slim join+dedup count")(println("[mh]   dedup pairs: " + sdedup.count()))
      slim.unpersist()
    }
    spark.stop()
  }
}
