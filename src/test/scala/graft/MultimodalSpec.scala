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

  test("stub decode is deterministic and batch-shaped") {
    val f1 = Multimodal.decodeFeatures(media, dim = 8).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.head.features.length == 8)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.byte_entropy == b.byte_entropy && a.features.sameElements(b.features) })
    assert(f1.forall(f => f.byte_entropy >= 0 && f.byte_entropy <= 8))
    assert(f1.forall(f => f.features.forall(v => v >= 0f && v <= 1f)))
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
}
