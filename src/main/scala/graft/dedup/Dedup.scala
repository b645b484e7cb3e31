package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{native, Text}

/** Distributed deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine. Beyond-reference capability
  * (the reference's only dedup is row-level DISTINCT,
  * ref: src/plan/logical/distinct.rs:8-16).
  *
  * Scale design (the whole point at 100 TB):
  *  - No driver-side materialization anywhere — every stage is a map,
  *    hash-shuffle, or aggregate that Catalyst plans with partial/final
  *    phases and AQE.
  *  - Candidate generation is always *bucketed* (LSH bands / simhash chunks /
  *    shared n-grams), never an O(n²) cross join. Pair enumeration happens
  *    inside buckets only.
  *  - Hot buckets are capped (`maxBucketSize`): a degenerate key (e.g. the
  *    empty document) would otherwise explode quadratically — the cap turns
  *    the worst case into a no-op and is the standard skew guard.
  *  - All hashes are the deterministic FNV-based kernels from
  *    expressions.scala — reproducible across runs/partitions/clusters.
  */
object Dedup {

  /** Exact dedup: canonical row per duplicate group = lowest id. Pure
    * hash aggregate (map-side combine + single shuffle on the group hash).
    * Grouping on md5(text) rather than the full text keeps shuffle rows
    * small when documents are megabytes. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Rows that survive exact dedup (the kept representatives). */
  def exactKept(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keep = exact(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, idCol) // broadcast or shuffle join — Catalyst/AQE picks
  }

  // ---------------------------------------------------------------- MinHash

  /** Deterministic per-function coefficients for the minhash family
    * h_i(x) = (a_i * x31 + b_i) mod P, with x31 = base hash folded to 31
    * bits so a_i*x31 never overflows a signed 64-bit (ANSI-safe). */
  private val MersennePrime = 2305843009213693951L // 2^61 - 1
  private def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (1L << 31) + 1L,
      math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** MinHash signature column: array<bigint> of length `numHashes` over the
    * document's char-shingle set. Entirely functions-based (codegen'd). */
  def minhashSignature(text: Column, numHashes: Int = 64, shingle: Int = 5): Column = {
    val shingles = Text.charShingles(text, shingle)
    // base hash per shingle, folded to 31 bits
    val bases = transform(shingles, s => pmod(native.rolling_fingerprint(s), lit(1L << 31)))
    val sig = minhashCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(bases, x => pmod(x * a + b, lit(MersennePrime))))
    }
    array(sig: _*)
  }

  /** Candidate near-dup pairs via banded LSH over minhash signatures.
    *
    * Pipeline: signature → explode into `bands` (band_id, band_hash, id) →
    * group by band bucket → emit intra-bucket pairs → distinct → verify by
    * signature agreement (estimated Jaccard) ≥ threshold.
    *
    * The self-join is on (band_id, band_hash) — a key-partitioned shuffle
    * join, never a cross join. Bucket size capped for skew safety.
    */
  def minhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 64, bands: Int = 16, shingle: Int = 5,
      threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val sig = docs.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingle).as("sig"))

    val banded = sig.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band_id"))
      .select(col("id"), col("sig"), col("band_id"),
        // hash of this band's slice of the signature
        xxhash64(col("band_id"), concat_ws(",", slice(col("sig"),
          col("band_id") * rowsPerBand + 1, lit(rowsPerBand)))).as("band_hash"))

    // Skew guard: drop degenerate buckets (> maxBucketSize ids).
    val bucketed = banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band_id", "band_hash")))
      .filter(col("bucket_n") <= maxBucketSize)

    val l = bucketed.select(col("band_id"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = bucketed.select(col("band_id"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")

    // Verify: estimated Jaccard = fraction of agreeing signature slots.
    val agree = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      b => b)).cast(DoubleType)
    pairs.select(col("id_a"), col("id_b"),
        round(agree / numHashes.toDouble, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- SimHash

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Candidate generation via the pigeonhole trick: split the 64-bit hash
    * into `chunks` 16-bit pieces; any pair within distance k < chunks must
    * agree on at least one piece → bucket-join on (chunk_id, chunk_value).
    */
  def simhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val chunks = 4 // 4 x 16-bit pieces of the 64-bit simhash
    val withHash = docs.select(col(idCol).as("id"),
      native.simhash64(col(textCol)).as("sh"))

    val chunkVals = array((0 until chunks).map(i =>
      shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)
    val banded = withHash
      .select(col("id"), col("sh"), posexplode(chunkVals).as(Seq("chunk_id", "chunk_val")))
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("chunk_id", "chunk_val")))
      .filter(col("bucket_n") <= maxBucketSize)

    val l = banded.select(col("chunk_id"), col("chunk_val"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("chunk_id"), col("chunk_val"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs >= threshold via inverted index:
    * explode word n-grams → join on n-gram → count shared grams per pair →
    * jaccard = shared / (|A| + |B| - shared). No cross join; the shuffle
    * key is the n-gram, and frequent grams are capped (df cut, the standard
    * posting-list guard from MinHash/IR practice). */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 500): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        Text.wordShingles(col(textCol), n).as("grams"))
      .withColumn("n_grams", size(col("grams")).cast(LongType))

    val posting = grams.select(col("id"), col("n_grams"), explode(col("grams")).as("gram"))
    // df-cut: a gram appearing in > maxDocFreq docs contributes O(df^2) pairs
    val dfCut = posting.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val pruned = posting.join(dfCut.select("gram"), "gram")

    val l = pruned.select(col("gram"), col("id").as("id_a"), col("n_grams").as("na"))
    val r = pruned.select(col("gram"), col("id").as("id_b"), col("n_grams").as("nb"))
    l.join(r, "gram").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("shared"))
      .select(col("id_a"), col("id_b"),
        round(col("shared").cast(DoubleType) /
          (col("na") + col("nb") - col("shared")).cast(DoubleType), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding near-duplicates: cosine >= threshold, candidates via
    * random-hyperplane LSH (sign bits → bucket) computed with the native
    * vec_dot expression. See Ann.scala for the plane construction. */
  def embeddingNearDupPairs(emb: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", threshold: Double = 0.95,
      planes: Int = 12, dim: Int = 64, maxBucketSize: Int = 2000): DataFrame = {
    val bucketed = graft.similarity.Ann.withLshBucket(emb, vecCol, planes, dim)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("lsh_bucket"))
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("lsh_bucket")))
      .filter(col("bucket_n") <= maxBucketSize)

    val l = bucketed.select(col("lsh_bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = bucketed.select(col("lsh_bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, "lsh_bucket").filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        round(native.vec_cosine(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
