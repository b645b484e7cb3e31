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
  * The image AND audio decode paths are REAL: [[syntheticImages]] encodes
  * deterministic pixels into genuine PNG payloads with `javax.imageio`
  * and [[decodeImageFeatures]] decodes them back with `ImageIO.read`
  * (per-channel intensity sums, 8-bin luminance histogram from the
  * DECODED pixels); [[syntheticAudio]] encodes deterministic 16-bit PCM
  * into genuine RIFF/WAVE streams with `javax.sound.sampled` and
  * [[decodeAudioFeatures]] parses them back with the JDK's WaveFileReader
  * (abs/square sums, peak, zero crossings, rms from the DECODED samples).
  * Both JDK-native — no container codecs needed. Because each generator
  * is a closed-form integer formula, an external oracle recomputes the
  * same features without any codec — a hash match therefore proves each
  * encode→decode round trip is lossless and the codec is exercised for
  * real. Video payloads stay opaque binary (byte-level frame sampling).
  *
  * Scale notes: encode/decode run via `mapPartitions`, i.e. one iterator
  * per input split with no shuffle; at 100 TB the parallelism is the
  * file-split count and the codec loop amortizes its init per partition.
  * Feature extraction output is columnar-friendly (fixed-width integers).
  */
object Multimodal {

  /** Typed media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

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

  /** One synthetic image row: real PNG bytes + the dims they encode. */
  case class ImageRow(media_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Pixel-derived features from a REAL `ImageIO` decode. All integer-exact:
    * channel sums are exact BIGINTs, the luminance histogram uses integer
    * Rec.601 weights with integer division, so any engine that replays the
    * pixel formula reproduces every column bit-for-bit. */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      lum_b0: Long, lum_b1: Long, lum_b2: Long, lum_b3: Long,
      lum_b4: Long, lum_b5: Long, lum_b6: Long, lum_b7: Long)

  /** The deterministic pixel generator shared (by formula) with the oracle:
    * channel value of flat index `idx` = (y·w + x)·3 + c, c∈{0:R,1:G,2:B},
    * is (media_id·131 + idx·7) mod 256. Small multipliers keep every
    * intermediate well inside 64-bit for any realistic id. */
  @inline private[multimodal] def pixelValue(mediaId: Long, idx: Long): Int =
    (((mediaId * 131L + idx * 7L) % 256L) + 256L).toInt % 256

  /** Build a table of REAL PNG images, one per document id: deterministic
    * pixels (see [[pixelValue]]) encoded with `javax.imageio.ImageIO` into
    * genuine PNG byte streams. Runs per-partition (codec init amortized,
    * no shuffle); payload sizes are codec-dependent, so only the decoded
    * pixels — never the byte length — participate in oracle checks. */
  def syntheticImages(docs: DataFrame, width: Int = 12,
      height: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // codec-bound generation (and the decode/featurize chained narrowly
    // on top): spread an under-parallel id scan first, or the whole PNG
    // pipeline runs in ONE task on a single-split local table
    // (Tables.spreadForKernel — no-op at production split counts)
    graft.engine.Tables.spreadForKernel(
        docs.select(col("doc_id").as("media_id")))
      .as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per image
      ids.map { id =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val base = (y.toLong * width + x) * 3L
            val r = pixelValue(id, base)
            val g = pixelValue(id, base + 1)
            val b = pixelValue(id, base + 2)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream(256)
        javax.imageio.ImageIO.write(img, "png", baos)
        ImageRow(id, width, height, baos.toByteArray)
      }
    }.toDF()
  }

  /** REAL image decode + featurize, partition-wise: `ImageIO.read` parses
    * the PNG payload back to pixels (the JDK's PNGImageReader — an actual
    * codec, not a byte heuristic), then derives per-channel intensity sums
    * and an 8-bin luminance histogram (integer Rec.601: lum =
    * (299·r + 587·g + 114·b) div 1000, bin = lum div 32). The dims come
    * from the DECODED image, not the metadata, so a corrupt payload fails
    * loudly instead of fabricating features. */
  def decodeImageFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"media_id=$id: payload is not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          val hist = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sr += r; sg += g; sb += b
              hist(((299 * r + 587 * g + 114 * b) / 1000) / 32) += 1
              x += 1
            }
            y += 1
          }
          ImageFeatures(id, w, h, sr, sg, sb,
            hist(0), hist(1), hist(2), hist(3),
            hist(4), hist(5), hist(6), hist(7))
        }
      }
  }

  /** One synthetic audio row: real WAV bytes + the samples they encode. */
  case class AudioRow(media_id: Long, n_samples: Int, payload: Array[Byte])

  /** Signal-derived features from a REAL `javax.sound.sampled` decode.
    * All integer-exact except `rms`, which is one IEEE division of exact
    * longs followed by a correctly-rounded sqrt — bit-identical in any
    * engine that replays the sample formula. */
  case class AudioFeatures(media_id: Long, n_samples: Long, sum_abs: Long,
      sum_sq: Long, peak_abs: Long, zero_crossings: Long, rms: Double)

  /** The deterministic 16-bit PCM sample generator shared (by formula)
    * with the oracle: sample i of media `id` is
    * ((id·37 + i·2654435761) mod 65536) − 32768. Inputs are nonnegative,
    * so both engines' `%` agree; every intermediate fits a long. */
  @inline private[multimodal] def sampleValue(mediaId: Long, i: Long): Int =
    (((mediaId * 37L + i * 2654435761L) % 65536L)).toInt - 32768

  /** Build a table of REAL WAV clips, one per document id: deterministic
    * 16-bit mono PCM (see [[sampleValue]]) encoded with
    * `javax.sound.sampled.AudioSystem` into genuine RIFF/WAVE byte streams
    * (JDK-native — no container codecs needed). Same proof shape as the
    * PNG path: the generator is closed-form, so an external oracle
    * recomputes the features without a codec, and a hash match proves the
    * WAV encode→decode round trip is lossless. */
  def syntheticAudio(docs: DataFrame, nSamples: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val pcm = new Array[Byte](nSamples * 2) // 16-bit mono little-endian
        var i = 0
        while (i < nSamples) {
          val s = sampleValue(id, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, true, false) // rate, bits, mono, signed, little-endian
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val baos = new java.io.ByteArrayOutputStream(pcm.length + 64)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        AudioRow(id, nSamples, baos.toByteArray)
      }
    }.toDF()
  }

  /** REAL WAV decode + featurize, partition-wise:
    * `AudioSystem.getAudioInputStream` parses the RIFF/fmt chunks (the
    * JDK's WaveFileReader — an actual parser, not a byte heuristic),
    * samples are rebuilt from the decoded PCM honoring the DECODED
    * format's endianness/width, and the features are exact integer
    * aggregates (abs/square sums, peak, sign-change count) plus one
    * IEEE-exact rms. The sample count comes from the decoder, not the
    * metadata, so a corrupt payload fails loudly. */
  def decodeAudioFeatures(audio: DataFrame): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"media_id=$id: expected 16-bit mono PCM, got $fmt")
          val bytes = ais.readAllBytes()
          // fail loudly on a valid-but-empty stream (rms would be 0/0 =
          // NaN) or a truncated odd byte count (a silently dropped
          // trailing byte means a corrupt 16-bit PCM payload)
          require(bytes.length > 0 && bytes.length % 2 == 0,
            s"media_id=$id: empty or odd-length PCM stream " +
              s"(${bytes.length} bytes)")
          val n = bytes.length / 2
          var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
          var prevNeg = false
          var i = 0
          while (i < n) {
            val lo = if (fmt.isBigEndian) bytes(2 * i + 1) else bytes(2 * i)
            val hi = if (fmt.isBigEndian) bytes(2 * i) else bytes(2 * i + 1)
            val s = ((hi << 8) | (lo & 0xff)).toShort.toInt
            val a = math.abs(s).toLong
            sumAbs += a; sumSq += a * a; if (a > peak) peak = a
            val neg = s < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            i += 1
          }
          AudioFeatures(id, n.toLong, sumAbs, sumSq, peak, zc,
            math.sqrt(sumSq.toDouble / n.toDouble))
        }
      }
  }

  /** Features of a box-filter-downsampled image. */
  case class ResizedFeatures(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image resize, partition-wise: decode the PNG payload with
    * `ImageIO.read`, then downsample by `factor` with an integer BOX
    * filter — output pixel (X,Y) is the truncating mean (`div factor²`)
    * of its factor×factor source block, per channel — and return exact
    * per-channel sums of the RESIZED raster. The box filter is written
    * out (not `getScaledInstance`) so the arithmetic is deterministic
    * across JDKs and an oracle can replay it bit-for-bit from the pixel
    * formula. Trailing rows/cols that don't fill a block are dropped
    * (out dims = floor(in/factor)), standard box-downsample semantics.
    * Same scale shape as [[decodeImageFeatures]]: mapPartitions, codec
    * init amortized per partition, no shuffle. */
  def resizeImageFeatures(images: DataFrame,
      factor: Int = 2): Dataset[ResizedFeatures] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"media_id=$id: payload is not a decodable image")
          val ow = img.getWidth / factor
          val oh = img.getHeight / factor
          val block = factor.toLong * factor
          var sr = 0L; var sg = 0L; var sb = 0L
          var yo = 0
          while (yo < oh) {
            var xo = 0
            while (xo < ow) {
              var br = 0L; var bg = 0L; var bb = 0L
              var dy = 0
              while (dy < factor) {
                var dx = 0
                while (dx < factor) {
                  val rgb = img.getRGB(xo * factor + dx, yo * factor + dy)
                  br += (rgb >> 16) & 0xff
                  bg += (rgb >> 8) & 0xff
                  bb += rgb & 0xff
                  dx += 1
                }
                dy += 1
              }
              sr += br / block; sg += bg / block; sb += bb / block
              xo += 1
            }
            yo += 1
          }
          ResizedFeatures(id, ow, oh, sr, sg, sb)
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
    // per-payload hashing is the kernel: spread an under-parallel media
    // scan once (conditional — no-op on an already-split store)
    graft.engine.Tables.spreadForKernel(media).as[MediaRow].mapPartitions { rows =>
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
  /** One synthetic video-frame row: real PNG bytes for frame `frame_idx`
    * of media `media_id`. */
  case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Build per-document frame SEQUENCES (a fake "video") of real PNGs:
    * frame f of media id draws pixels from [[pixelValue]] with scene seed
    * `id·2 + (f >= nFrames/2)` and flat index `idx + f` — consecutive
    * frames within a scene differ by a small constant drift (motion),
    * while the seed switch at nFrames/2 is a hard scene cut. Same
    * per-partition ImageIO encode as [[syntheticImages]]. */
  def syntheticFrames(docs: DataFrame, width: Int = 8, height: Int = 6,
      nFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // same kernel-input spread rationale as [[syntheticImages]]
    graft.engine.Tables.spreadForKernel(
        docs.select(col("doc_id").as("media_id")))
      .as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.flatMap { id =>
        (0 until nFrames).map { f =>
          val seed = id * 2L + (if (f >= nFrames / 2) 1L else 0L)
          val img = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val base = (y.toLong * width + x) * 3L
              val r = pixelValue(seed, base + f)
              val g = pixelValue(seed, base + 1 + f)
              val b = pixelValue(seed, base + 2 + f)
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream(256)
          javax.imageio.ImageIO.write(img, "png", baos)
          FrameRow(id, f, baos.toByteArray)
        }
      }
    }.toDF()
  }

  /** Shot-boundary detection over DECODED frames: each PNG payload is
    * parsed back with `ImageIO.read`, consecutive frames of a media are
    * equi-joined on (media_id, frame index), and the boundary signal is
    * the classic sum of absolute per-channel differences (SAD). The cut
    * decision is pure integer arithmetic — `sad > perElemThreshold ×
    * n_elements` — so any engine replaying the pixel formula reproduces
    * both the signal and the flags bit-for-bit.
    *
    * Scale shape: decode is a narrow per-partition map; the consecutive-
    * frame pairing is one equi-join on (media_id, frame) — frames of one
    * media co-hash, no window, no cartesian; SAD is a codegen'd
    * zip_with/aggregate fold over the (tiny) per-frame arrays. */
  def shotBoundaries(frames: DataFrame, perElemThreshold: Int = 40): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val decoded = frames
      .select(col("media_id"), col("frame_idx"), col("payload"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, f, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"media_id=$id frame=$f: not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          val pix = new Array[Int](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val o = (y * w + x) * 3
              pix(o) = (rgb >> 16) & 0xff
              pix(o + 1) = (rgb >> 8) & 0xff
              pix(o + 2) = rgb & 0xff
              x += 1
            }
            y += 1
          }
          (id, f, pix)
        }
      }.toDF("media_id", "f", "pix")
      // both sides of the consecutive-frame join read this — persist so
      // the PNG encode+decode (the dominant cost) runs once per frame,
      // not once per join side
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = decoded.select(col("media_id"), col("f"), col("pix").as("pa"))
    val b = decoded.select(col("media_id"), (col("f") - 1).as("f"),
      col("f").as("frame_idx"), col("pix").as("pb"))
    a.join(b, Seq("media_id", "f"))
      .select(col("media_id"), col("frame_idx"),
        aggregate(zip_with(col("pa"), col("pb"), (x, y) => abs(x - y)),
          lit(0L), (acc, v) => acc + v).as("sad"),
        size(col("pa")).cast(LongType).as("n_elems"))
      .select(col("media_id"), col("frame_idx"), col("sad"),
        (col("sad") > lit(perElemThreshold.toLong) * col("n_elems"))
          .as("is_cut"))
  }

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
