package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{Context, Tables}
import graft.functions.native

/** Ad-hoc profiling main for pipeline stages (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Context.session("local[32]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sig = docs.select(col("doc_id").as("id"),
      native.minhash_sig(col("text"), 64, 5).as("sig"))
    time("signatures only")(sig.write.format("noop").mode("overwrite").save())

    val banded = sig.select(col("id"), col("sig"),
      posexplode(native.minhash_bands(col("sig"), 16)).as(Seq("band_id", "band_hash")))
    time("banded")(banded.write.format("noop").mode("overwrite").save())

    val bcount = time("bucket stats") {
      banded.groupBy("band_id", "band_hash").count()
        .agg(count(lit(1)), max("count"), avg("count"),
          sum(col("count") * col("count"))).collect()(0)
    }
    println(s"[probe] buckets=${bcount.getLong(0)} maxBucket=${bcount.getLong(1)} " +
      f"avgBucket=${bcount.getDouble(2)}%.1f sumSq=${bcount.getLong(3)}")

    val l = banded.select(col("band_id"), col("band_hash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band_id"), col("band_hash"), col("id").as("id_b"), col("sig").as("sig_b"))
    val agree = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b)).cast("double")
    val pairs = l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), (agree / 64.0).as("est"))
    time("bucket join + est")(pairs.write.format("noop").mode("overwrite").save())
    val n = time("distinct pairs count")(
      pairs.filter(col("est") >= 0.4).dropDuplicates("id_a", "id_b").count())
    println(s"[probe] final pairs=$n")
    spark.stop()
  }
}
