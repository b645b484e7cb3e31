package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.Context
import graft.functions.native

/** Ad-hoc: bucket-size distribution of the banded minhash candidate
  * stage on an arbitrary documents parquet — diagnoses candidate-pair
  * explosions at stress scale without running the verify join. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val path = args.headOption.getOrElse("/tmp/graft_sfstress/documents.parquet")
    val cap = if (args.length > 1) args(1).toInt else 1000
    val docs = spark.read.parquet(path)
    val banded = docs.select(col("doc_id").as("id"),
        posexplode(native.minhash_bands(
          graft.dedup.Dedup.minhashSignature(col("text"), 64, 5), 16))
          .as(Seq("band_id", "band_hash")))
    val stats = banded.groupBy("band_id", "band_hash").agg(count(lit(1)).as("n"))
    stats.agg(count(lit(1)).as("buckets"), max("n").as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("in_bucket_pairs"),
      sum(when(col("n") <= cap, col("n") * (col("n") - 1) / 2).otherwise(0L))
        .as(s"capped_pairs_le_$cap"),
      sum(when(col("n") <= cap, lit(0L)).otherwise(col("n"))).as("rows_dropped"))
      .show(false)
    spark.stop()
  }
}
