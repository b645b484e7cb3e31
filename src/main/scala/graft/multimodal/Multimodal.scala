package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Design: media is an opaque `binary` payload plus a typed metadata struct
  * — the layout large-scale multimodal pipelines use so that Parquet stores
  * payloads as byte arrays while pruning/predicates work on the typed
  * metadata columns (payload column is never read unless selected).
  *
  * The decode step is a clearly marked STUB (this container has no
  * image/audio codecs): `decodeFeatures` derives a deterministic fake
  * feature vector from the payload bytes. Everything around it — schema,
  * partition-wise batching, the Dataset[MediaRow] → Dataset[MediaFeatures]
  * signature — is the real Spark plumbing and is what the tests cover.
  *
  * Scale notes: decode runs via `mapPartitions`, i.e. one iterator per
  * input split with no shuffle; at 100 TB the parallelism is the file-split
  * count and the expensive decode would be the same per-partition loop
  * calling into a codec. Feature extraction output is columnar-friendly
  * (fixed-size float array).
  */
object Multimodal {

  /** Typed media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  /** Decoded/derived features per media item. */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
      byte_entropy: Double, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Build a media table from the documents table: payload = UTF-8 bytes of
    * the text. A stand-in corpus with real binary-column plumbing. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic fake mime rotation so filters have selectivity
      element_at(typedlit(Seq("image/png", "audio/wav", "video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("mime"),
      octet_length(col("text").cast(BinaryType)).cast(LongType).as("n_bytes"),
      col("text").cast(BinaryType).as("payload"))

  /** STUB decoder: a real deployment calls a codec here (libjpeg/ffmpeg …).
    * This fake is deterministic in the payload bytes so tests are stable:
    * features(i) = mean of bytes congruent to i mod dim, normalized. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sums(i % dim) += b; counts(i % dim) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      out(j) = if (counts(j) == 0) 0f else (sums(j) / counts(j) / 255.0).toFloat
      j += 1
    }
    out
  }

  private def entropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val freq = new Array[Long](256)
    payload.foreach(b => freq(b & 0xff) += 1)
    val n = payload.length.toDouble
    var h = 0.0
    freq.foreach { f =>
      if (f > 0) { val p = f / n; h -= p * math.log(p) / math.log(2) }
    }
    h
  }

  /** Decode + featurize, partition-wise (the batch shape a real codec
    * integration needs: amortize codec init per partition, stream rows). */
  def decodeFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights, …)
      rows.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        MediaFeatures(r.media_id, r.mime, r.n_bytes,
          math.rint(entropy(payload) * 1e6) / 1e6, stubDecode(payload, dim))
      }
    }
  }

  /** Per-media perceptual hash row. */
  case class MediaHash(media_id: Long, phash: Long)

  /** Perceptual hash over the payload: bit i is set when byte-slot i's
    * mean exceeds the whole payload's mean — the aHash/pHash family shape
    * (bits = per-cell intensity vs global reference) computed on the raw
    * bytes the way [[stubDecode]] stands in for a codec. All arithmetic
    * is exact INTEGER cross-multiplication (slotSum·C > total·slotCnt ⇔
    * slotMean > mean), so the hash is bit-identical in any engine — no
    * float thresholds. Exact for payloads < ~190 MB (255·L² < 2^63).
    * Runs per-partition like the decoder (codec init amortizes). */
  def perceptualHash(media: DataFrame, dim: Int = 32): Dataset[MediaHash] = {
    require(dim <= 63, "phash must fit a signed long")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.payload == null) Array.emptyByteArray else r.payload
        val sums = new Array[Long](dim)
        val cnts = new Array[Long](dim)
        var i = 0
        while (i < p.length) {
          sums(i % dim) += (p(i) & 0xff); cnts(i % dim) += 1; i += 1
        }
        val total = sums.sum
        val n = p.length.toLong
        var h = 0L
        var j = 0
        while (j < dim) {
          if (n > 0 && sums(j) * n > total * cnts(j)) h |= (1L << j)
          j += 1
        }
        MediaHash(r.media_id, h)
      }
    }
  }

  /** Perceptual-hash near-dup pairs: candidates share at least one 4-bit
    * band (pigeonhole: ≤ 3 differing bits leave ≥ dim/4 − 3 of the bands
    * intact, so `maxHamming` ≤ 3 loses nothing), verified by exact
    * Hamming distance. The same band→bucket-join→verify shape as SimHash
    * text dedup, but over the media payload hash — image/audio near-dup
    * at 100 TB without ever comparing payloads pairwise. */
  def phashNearDupPairs(media: DataFrame, dim: Int = 32,
      maxHamming: Int = 2): DataFrame = {
    require(maxHamming <= 3, "band completeness only proven to hamming 3")
    val nBands = dim / 4
    val h = perceptualHash(media, dim).toDF()
    val bands = h.select(col("media_id"), col("phash"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col("phash"), b * 4).bitwiseAND(lit(15L))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val a = bands.select(col("media_id").as("id_a"), col("phash").as("pa"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col("media_id").as("id_b"), col("phash").as("pb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "pa", "pb").distinct()
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** "Frame sampling" for video payloads: every `stride`-th fixed-size byte
    * window becomes one frame row (explode → one row per frame). Real
    * pipelines do exactly this shape with decoded frames. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor((col("n_bytes") / frameBytes.toDouble) / stride)
      .cast(IntegerType)
    // Guard zero-frame payloads: sequence(0, -1) counts DOWN in Spark and
    // would emit spurious frames with negative offsets.
    media.filter(col("mime").startsWith("video/"))
      .select(col("media_id"), col("n_bytes"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_bytes"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("media_id"),
        col("pos").cast(LongType).as("frame_idx"),
        (col("col").cast(LongType) * frameBytes * stride).as("byte_offset"))
  }
}
