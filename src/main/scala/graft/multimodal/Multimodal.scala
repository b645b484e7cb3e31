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
