package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, deterministic stub decode, frame sampling. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def media = Multimodal.mediaFromDocuments(
    Tables.load(spark, SparkFixture.sfDir, "documents"))

  test("media table has binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("n_bytes").dataType.typeName == "long")
    assert(media.count() == 500)
    // metadata-only query must not need the payload column
    assert(media.filter("mime = 'image/png'").count() > 0)
  }

  test("real PNG decode: known image decodes to known pixel features") {
    import spark.implicits._
    // one known id through the full encode→decode pipeline; expectation
    // computed straight from the pixel formula, independent of any codec
    val docs = Seq((7L, "x")).toDF("doc_id", "text")
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.syntheticImages(docs, width = 12, height = 8)).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.width == 12 && f.height == 8)
    var er = 0L; var eg = 0L; var eb = 0L
    val ehist = new Array[Long](8)
    for (j <- 0 until 96) {
      val r = ((7L * 131 + (j * 3 + 0) * 7) % 256).toInt
      val g = ((7L * 131 + (j * 3 + 1) * 7) % 256).toInt
      val b = ((7L * 131 + (j * 3 + 2) * 7) % 256).toInt
      er += r; eg += g; eb += b
      ehist(((299 * r + 587 * g + 114 * b) / 1000) / 32) += 1
    }
    assert(f.sum_r == er && f.sum_g == eg && f.sum_b == eb)
    assert(Seq(f.lum_b0, f.lum_b1, f.lum_b2, f.lum_b3,
      f.lum_b4, f.lum_b5, f.lum_b6, f.lum_b7) == ehist.toSeq)
    assert(ehist.sum == 96)
  }

  test("real resize: 2x2 box filter matches the formula block means") {
    import spark.implicits._
    val docs = Seq((7L, "x")).toDF("doc_id", "text")
    val feats = Multimodal.resizeImageFeatures(
      Multimodal.syntheticImages(docs, width = 12, height = 8),
      factor = 2).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.width == 6 && f.height == 4)
    // expectation straight from the pixel formula: each output pixel is
    // the truncating mean of its 2x2 source block, summed per channel
    def pv(x: Int, y: Int, c: Int): Long =
      (7L * 131 + ((y.toLong * 12 + x) * 3 + c) * 7) % 256
    var er = 0L; var eg = 0L; var eb = 0L
    for (yo <- 0 until 4; xo <- 0 until 6) {
      def blk(c: Int): Long =
        (pv(2 * xo, 2 * yo, c) + pv(2 * xo + 1, 2 * yo, c) +
          pv(2 * xo, 2 * yo + 1, c) + pv(2 * xo + 1, 2 * yo + 1, c)) / 4
      er += blk(0); eg += blk(1); eb += blk(2)
    }
    assert(f.sum_r == er && f.sum_g == eg && f.sum_b == eb)
    // factor 1 resize is the identity: sums equal the decode sums
    val id1 = Multimodal.resizeImageFeatures(
      Multimodal.syntheticImages(docs), factor = 1).collect().head
    val dec = Multimodal.decodeImageFeatures(
      Multimodal.syntheticImages(docs)).collect().head
    assert(id1.width == 12 && id1.height == 8)
    assert((id1.sum_r, id1.sum_g, id1.sum_b) ==
      ((dec.sum_r, dec.sum_g, dec.sum_b)))
  }

  test("ImageIO round trip is lossless: handcrafted 2x1 PNG decodes exactly") {
    // bypass syntheticImages: encode a tiny image by hand, decode through
    // decodeImageFeatures, check the exact channel sums (255-red + pure
    // green pixel → sum_r=255, sum_g=255, sum_b=0)
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val df = Seq((1L, baos.toByteArray)).toDF("media_id", "payload")
    val f = Multimodal.decodeImageFeatures(df).collect().head
    assert(f.width == 2 && f.height == 1)
    assert(f.sum_r == 255L && f.sum_g == 255L && f.sum_b == 0L)
    // red pixel: lum = 299*255/1000 = 76 → bin 2; green: 587*255/1000=149 → bin 4
    assert(f.lum_b2 == 1L && f.lum_b4 == 1L)
    assert(f.lum_b0 + f.lum_b1 + f.lum_b3 + f.lum_b5 + f.lum_b6 + f.lum_b7 == 0L)
  }

  test("real WAV decode: known clip decodes to formula-exact signal features") {
    import spark.implicits._
    val docs = Seq((7L, "x")).toDF("doc_id", "text")
    val f = Multimodal.decodeAudioFeatures(
      Multimodal.syntheticAudio(docs, nSamples = 256)).collect().head
    assert(f.n_samples == 256L)
    // expectation straight from the sample formula, independent of codec
    var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
    var prevNeg = false
    for (i <- 0 until 256) {
      val s = (((7L * 37 + i.toLong * 2654435761L) % 65536L)).toInt - 32768
      val a = math.abs(s).toLong
      sumAbs += a; sumSq += a * a; if (a > peak) peak = a
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
    }
    assert(f.sum_abs == sumAbs && f.sum_sq == sumSq)
    assert(f.peak_abs == peak && f.zero_crossings == zc)
    assert(f.rms == math.sqrt(sumSq.toDouble / 256.0))
  }

  test("synthetic audio payloads are genuine RIFF/WAVE files") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val rows = Multimodal.syntheticAudio(docs).collect()
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      assert(new String(p.take(4), "US-ASCII") == "RIFF")
      assert(new String(p.slice(8, 12), "US-ASCII") == "WAVE")
      // and the JDK parser accepts it as 16-bit mono PCM
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      assert(ais.getFormat.getSampleSizeInBits == 16)
      assert(ais.getFormat.getChannels == 1)
      assert(ais.getFrameLength == 256L)
    }
  }

  test("synthetic images are real decodable PNGs with the PNG signature") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val rows = Multimodal.syntheticImages(docs).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      // PNG magic: 89 50 4E 47 0D 0A 1A 0A
      assert((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G')
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null && img.getWidth == 12 && img.getHeight == 8)
    }
    // determinism: same id twice → byte-identical features after decode
    val a = Multimodal.decodeImageFeatures(
      Multimodal.syntheticImages(docs)).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImageFeatures(
      Multimodal.syntheticImages(docs)).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling yields one row per sampled frame with offsets") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getLong(2) >= 0)) // no spurious negative-offset frames
    assert(frames.forall(_.getLong(2) % (64 * 2) == 0)) // byte_offset aligned
    // payloads shorter than one frame window must yield zero rows
    val tiny = Multimodal.sampleFrames(media, frameBytes = 1 << 20, stride = 4)
    assert(tiny.count() == 0)
    val perMedia = frames.groupBy(_.getLong(0))
    perMedia.values.foreach { rows =>
      val idx = rows.map(_.getLong(1)).sorted
      assert(idx.toSeq == (0L until idx.length).toSeq) // contiguous frame_idx
    }
  }

  test("shotBoundaries: decoded SAD matches the pixel formula; cut only at the seed switch") {
    import spark.implicits._
    val docs = Seq(7L, 8L).toDF("doc_id")
    val got = Multimodal.shotBoundaries(Multimodal.syntheticFrames(docs))
      .orderBy("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    // reference model of the generator: v = ((seed*131 + (i+f)*7) % 256)
    def v(id: Long, f: Int, i: Int): Long =
      ((id * 2 + (if (f >= 3) 1 else 0)) * 131 + (i + f) * 7) % 256
    def sad(id: Long, f: Int): Long =
      (0 until 144).map(i => math.abs(v(id, f, i) - v(id, f - 1, i))).sum
    val want = for (id <- Seq(7L, 8L); f <- 1 to 5)
      yield (id, f, sad(id, f), sad(id, f) > 40L * 144)
    assert(got == want)
    // the hard cut is exactly the scene switch, nowhere else
    assert(got.filter(_._4).map(_._2).toSet == Set(3))
  }

  test("perceptualHash: deterministic bits, identical payloads collide, near payloads near") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // identical
      (3L, "The quick brown fox jumps over the lazy dog again and again"), // 1 byte off
      (4L, "zzzzzz completely different high bytes zzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(texts)
    val h = Multimodal.perceptualHash(media, dim = 32).collect()
      .map(r => r.media_id -> r.phash).toMap
    assert(h(1L) == h(2L)) // identical bytes → identical hash
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <=
      java.lang.Long.bitCount(h(1L) ^ h(4L))) // near < far
    // empty payload hashes to 0, not an error
    val empty = Multimodal.perceptualHash(
      Multimodal.mediaFromDocuments(Seq((9L, "")).toDF("doc_id", "text")))
      .collect().head
    assert(empty.phash == 0L)
    // pair pipeline finds the identical pair with hamming 0 and is
    // symmetric-free (id_a < id_b)
    val pairs = Multimodal.phashNearDupPairs(media, dim = 32, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("count-min sketch: est >= true always; exact when no collision") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.CountMin
    val df = (Seq.fill(40)(7L) ++ Seq.fill(25)(13L) ++
      (100L until 160L)).toDF("k")
    val sketch = CountMin.build(df, col("k"), d = 4, w = 32)
    // sketch is bounded: at most d*w counter rows
    assert(sketch.count() <= 4 * 32)
    val est = CountMin.estimate(sketch, df.select("k"), "k", d = 4, w = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) => assert(est(k) >= t, s"key $k") }
    // the two heavy keys dominate their buckets: est within n_tail slack
    assert(est(7L) >= 40L && est(13L) >= 25L)
  }

  test("VAD: frame energies and run-lengths match the PCM formula") {
    import spark.implicits._
    val docs = Seq((7L, "x"), (11L, "x")).toDF("doc_id", "text")
    val out = graft.multimodal.Vad.energySegments(
        Multimodal.syntheticAudio(docs)) // 256 samples → 8 frames of 32
      .collect().map(v => v.media_id -> v).toMap
    for (id <- Seq(7L, 11L)) {
      // replay the generator: voiced = frame sum|s| >= 16384*32
      val voiced = (0 until 8).map { f =>
        val e = (f * 32 until (f + 1) * 32).map { i =>
          math.abs((((id * 37L + i * 2654435761L) % 65536L) - 32768L))
        }.sum
        e >= 16384L * 32
      }
      var segs = 0L; var run = 0L; var longest = 0L
      voiced.foreach { v =>
        if (v) { run += 1; if (run == 1) segs += 1
          if (run > longest) longest = run }
        else run = 0
      }
      val o = out(id)
      assert(o.n_frames == 8L, s"id=$id")
      assert(o.n_voiced == voiced.count(identity).toLong, s"id=$id")
      assert(o.n_segments == segs && o.longest_run == longest, s"id=$id")
    }
  }

  test("VAD: all-silent and all-voiced edges behave") {
    import spark.implicits._
    val docs = Seq((3L, "x")).toDF("doc_id", "text")
    val audio = Multimodal.syntheticAudio(docs)
    // threshold 0 → every frame voiced, one segment spanning the clip
    val allV = graft.multimodal.Vad.energySegments(audio,
      meanAbsThreshold = 0L).collect().head
    assert(allV.n_voiced == 8L && allV.n_segments == 1L &&
      allV.longest_run == 8L)
    // impossible threshold → nothing voiced, zero segments
    val none = graft.multimodal.Vad.energySegments(audio,
      meanAbsThreshold = 40000L).collect().head
    assert(none.n_voiced == 0L && none.n_segments == 0L &&
      none.longest_run == 0L)
  }
}
