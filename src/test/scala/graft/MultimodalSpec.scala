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
}
