package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.similarity.Ann

/** Algebraic laws of the embedding pre-index kernels (VERDICT r4 item 8):
  * the normalizer emits unit (or exactly-zero) vectors, and SQ8
  * quantization round-trips within one quantization step per dimension.
  * Vector sets are arbitrary — dims, magnitudes, and constant/zero
  * columns all vary — so the laws hold beyond the fixture corpus. */
object AnnProps extends Properties("Ann") {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  // small corpora of same-dim vectors; components span magnitudes and
  // include exact zeros (zero vectors + constant dims both appear)
  private val corpusGen: Gen[(Int, List[Array[Float]])] = for {
    dim <- Gen.choose(1, 24)
    n <- Gen.choose(1, 30)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim,
      Gen.frequency(
        5 -> Gen.choose(-1e3f, 1e3f),
        2 -> Gen.choose(-1e-3f, 1e-3f),
        1 -> Gen.const(0.0f))).map(_.toArray))
  } yield (dim, vecs)

  property("l2Normalize: output norm is 0 (zero vector) or within 1e-6 of 1") =
    forAll(corpusGen) { case (_, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val norms = Ann.l2Normalize(df)
        .select(graft.functions.native.vec_norm(col("embedding_unit")))
        .as[Double].collect()
      norms.forall(n => n == 0.0 || math.abs(n - 1.0) <= 1e-6)
    }

  property("int8Quantize: dequantized value within one step of the input, codes in [-127,127]") =
    forAll(corpusGen) { case (dim, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val rows = Ann.int8Quantize(df).select("embedding", "codes")
        .as[(Array[Float], Array[Int])].collect()
      val lo = (0 until dim).map(d => vecs.map(_(d).toDouble).min)
      val hi = (0 until dim).map(d => vecs.map(_(d).toDouble).max)
      rows.forall { case (vec, codes) =>
        codes.forall(c => c >= -127 && c <= 127) &&
        (0 until dim).forall { d =>
          val step = (hi(d) - lo(d)) / 254.0
          val deq = lo(d) + (codes(d) + 127) * step
          // half a step of true error + float32 input rounding headroom
          math.abs(deq - vec(d)) <= step / 2 + 1e-6 * math.max(1.0, math.abs(vec(d)))
        }
      }
    }
}
