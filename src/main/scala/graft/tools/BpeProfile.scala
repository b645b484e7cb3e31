package graft.tools

/** BPE TRAIN-side cost curve (VERDICT r9 item 4): wall-clock and batched
  * driver-round count of `Text.bpeTrainMerges` at growing merge budgets
  * over the real documents table — the measurement that pins the train
  * bound next to the apply kernel's. Exact BPE is inherently sequential
  * per merge; the batched trainer's claim is that ROUNDS (driver round
  * trips) grow far slower than k, and this prints both so SCALE.md can
  * record merges/rounds/wall per k.
  *
  * Usage: runMain graft.tools.BpeProfile [sfDir] [k1 k2 ...]
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(6, 100, 1000)
    val spark = graft.engine.Context.session("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    // the contract documents corpus exhausts (every word fully merged)
    // at ~89 merges, so deep-k costs are measured on a high-entropy
    // synthetic corpus too: 200k docs of deterministic base-26
    // pseudo-words (id-hash derived), whose pair diversity supports a
    // genuine k=1000 merge table
    import org.apache.spark.sql.functions._
    val docs =
      if (sfDir == "--synthetic")
        spark.range(200000).select(concat_ws(" ",
          (0 until 6).map { j =>
            val h = abs(hash(col("id") * 7 + j))
            concat(
              chr(lit(97) + pmod(h, lit(26))),
              chr(lit(97) + pmod(h / 26, lit(26))),
              chr(lit(97) + pmod(h / 676, lit(26))),
              chr(lit(97) + pmod(h / 17576, lit(26))))
          }: _*).as("text"))
      else graft.engine.Tables.load(spark, sfDir, "documents")
    println(f"${"k"}%6s ${"merges"}%7s ${"rounds"}%7s ${"wall_s"}%8s  merges/round")
    for (k <- ks) {
      val t0 = System.nanoTime()
      val (m, rounds) = graft.functions.Text.bpeTrainMergesCounted(docs, k = k)
      val n = m.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"$k%6d $n%7d $rounds%7d $wall%8.1f  ${n.toDouble / rounds}%.1f")
    }
    spark.stop()
  }
}
