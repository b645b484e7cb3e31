package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.similarity.Ann

/** Similarity search: exact top-k correctness + LSH recall sanity. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mkVec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
  }

  private def corpus = (0 until 50).map(i => (i.toLong, mkVec(i)))
    .toDF("vec_id", "embedding")

  test("brute-force top-k returns k neighbors ranked by cosine desc") {
    val qs = Ann.selfQueries(corpus, 3)
    val got = Ann.bruteForceTopK(corpus, qs, k = 5).collect()
    assert(got.length == 15) // 3 queries x 5
    val perQuery = got.groupBy(_.getLong(0))
    perQuery.foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to 5L))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    // no self matches
    assert(got.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("exact top-1 of a duplicated vector is its twin with cosine ~1") {
    val withTwin = corpus.union(Seq((999L, mkVec(7))).toDF("vec_id", "embedding"))
    val qs = withTwin.filter($"vec_id" === 999L)
      .selectExpr("vec_id AS query_id", "embedding AS query_vec")
    val top = Ann.bruteForceTopK(withTwin, qs, k = 1).collect()(0)
    assert(top.getLong(2) == 7L)
    assert(math.abs(top.getDouble(3) - 1.0) < 1e-5)
  }

  test("lsh buckets are deterministic and lshTopK returns subset of exact results") {
    val b1 = Ann.withLshBucket(corpus, "embedding", planes = 6).select("lsh_bucket")
      .as[Long].collect()
    val b2 = Ann.withLshBucket(corpus, "embedding", planes = 6).select("lsh_bucket")
      .as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 64))

    val qs = Ann.selfQueries(corpus, 5)
    val approx = Ann.lshTopK(corpus, qs, k = 3, planes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactAll = Ann.bruteForceTopK(corpus, qs, k = 49)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exactAll)) // approx never invents pairs
  }

  test("recallAtK reaches 1.0 when exact has fewer than k neighbors") {
    // corpus of 4 → each query has only 3 true neighbors; a perfect
    // approx result must score recall 1.0, not 3/5
    val tiny = corpus.filter(col("vec_id") < 4)
    val qs = Ann.selfQueries(tiny, 2)
    val exact = Ann.bruteForceTopK(tiny, qs, k = 5)
    val rec = Ann.recallAtK(exact, exact, qs, k = 5)
      .orderBy("query_id")
      .select("n_hit", "recall_at_5").as[(Long, Double)].collect().toSeq
    assert(rec == Seq((3L, 1.0), (3L, 1.0)))
    // an empty approx result scores 0, and queries stay visible
    val none = exact.filter(col("rank") > 100)
    val rec0 = Ann.recallAtK(exact, none, qs, k = 5)
      .select("recall_at_5").as[Double].collect().toSeq
    assert(rec0 == Seq(0.0, 0.0))
  }

  test("l2Normalize: unit norms, dot of units ~ cosine, zero vector stays zero") {
    import graft.functions.native
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
      .limit(50)
    val unit = graft.similarity.Ann.l2Normalize(emb)
    val norms = unit.select(native.vec_norm(col("embedding_unit")))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-6)) // float elements
    // dot of unit vectors approximates the raw cosine
    val a = unit.select(col("vec_id").as("ida"),
      col("embedding").as("va"), col("embedding_unit").as("ua"))
    val b = unit.select(col("vec_id").as("idb"),
      col("embedding").as("vb"), col("embedding_unit").as("ub"))
    val both = a.join(b, col("ida") < col("idb")).limit(200)
      .select(native.vec_dot(col("ua"), col("ub")),
        native.vec_cosine(col("va"), col("vb")))
      .as[(Double, Double)].collect()
    assert(both.forall { case (d, c) => math.abs(d - c) < 1e-5 })
    val z = Seq((1L, Array.fill(4)(0f))).toDF("vec_id", "embedding")
    val zu = graft.similarity.Ann.l2Normalize(z)
      .select(col("embedding_unit")).as[Seq[Float]].collect().head
    assert(zu.forall(_ == 0.0f))
  }

  test("int8 quantization: codes in [-127,127], roundtrip within half a step per dim") {
    import org.apache.spark.sql.functions._
    val q = Ann.int8Quantize(corpus)
    val rows = q.select("embedding", "codes")
      .as[(Array[Float], Array[Int])].collect()
    assert(rows.forall(_._2.forall(c => c >= -127 && c <= 127)))
    // per-dim lo/hi from the same corpus to check the dequantized bound
    val dim = 64
    val all = rows.map(_._1)
    val lo = (0 until dim).map(i => all.map(_(i)).min.toDouble)
    val hi = (0 until dim).map(i => all.map(_(i)).max.toDouble)
    rows.foreach { case (vec, codes) =>
      (0 until dim).foreach { i =>
        val step = (hi(i) - lo(i)) / 254.0
        val deq = lo(i) + (codes(i) + 127) * step
        assert(math.abs(deq - vec(i)) <= step / 2 + 1e-9,
          s"dim $i: |$deq - ${vec(i)}| > ${step / 2}")
      }
    }
    // extremes map to the extreme codes
    (0 until dim).foreach { i =>
      val minRow = rows.minBy(_._1(i))
      val maxRow = rows.maxBy(_._1(i))
      assert(minRow._2(i) == -127 && maxRow._2(i) == 127)
    }
  }

  test("rrfFuse: both-list docs sum both reciprocal terms, single-list docs one") {
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "lex_rank")
    val vec = Seq((10L, 3L), (30L, 1L)).toDF("doc_id", "vec_rank")
    val got = Ann.rrfFuse(lex, vec, kRrf = 60, topk = 10)
      .select("doc_id", "rrf").as[(Long, Double)].collect().toMap
    def r(x: Long) = 1.0 / (60 + x)
    assert(math.abs(got(10L) - (r(1) + r(3))) < 1e-6)
    assert(math.abs(got(20L) - r(2)) < 1e-6)
    assert(math.abs(got(30L) - r(1)) < 1e-6)
  }

  test("rrfFuse: ordered by fused score desc, doc_id tiebreak, topk cap") {
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "lex_rank")
    val vec = Seq((2L, 1L), (4L, 2L), (5L, 3L)).toDF("doc_id", "vec_rank")
    val got = Ann.rrfFuse(lex, vec, kRrf = 60, topk = 3)
      .select("doc_id").as[Long].collect().toSeq
    // doc 2 is in both lists -> highest; then doc 1 (rank 1) beats
    // doc 4 (rank 2); ties impossible here, cap drops docs 3 and 5
    assert(got == Seq(2L, 1L, 4L))
    // same-score tie between docs 1 and 4 at identical ranks: id wins
    val tie = Ann.rrfFuse(
      Seq((7L, 1L)).toDF("doc_id", "lex_rank"),
      Seq((4L, 1L)).toDF("doc_id", "vec_rank"), kRrf = 60, topk = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(tie == Seq(4L, 7L))
  }

  test("jlProject: one-hot input isolates one sign row; scale is 1/sqrt(dimOut)") {
    // projecting e_i yields s(i,j)/4 per output dim j: |value| = 0.25
    // with the sign equal to the hash32(i*131+j) parity
    def h32(x: Long): Long = {
      val a = ((x % 4294967296L) + 4294967296L) % 4294967296L
      val lo = (a % 65536L) * 2654435761L
      val hi = (((a >> 16) * 2654435761L) % 65536L) << 16
      (lo + hi) % 4294967296L
    }
    val i = 5
    val oneHot = Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
    val df = Seq((0L, oneHot)).toDF("vec_id", "embedding")
    val got = Ann.jlProject(df).select("embedding_proj")
      .collect().head.getSeq[Double](0)
    assert(got.length == 16)
    got.zipWithIndex.foreach { case (v, j) =>
      val sign = 1.0 - 2.0 * (h32(i * 131L + j) % 2)
      assert(v == sign * 0.25, s"dim $j")
    }
  }

  test("mmrRerank: penalizes redundancy, keeps relevance order otherwise") {
    // id 2 is nearly identical to id 1 (sim 1.0): with lambda 0.7/0.3 its
    // marginal score 0.7*0.9-0.3*1.0 = 0.33 loses to the diverse id 3's
    // 0.7*0.5 = 0.35 despite higher raw relevance
    val cands = Seq((1L, 0.99), (2L, 0.9), (3L, 0.5)).toDF("id", "rel")
    val sims = Seq((1L, 2L, 1.0), (1L, 3L, 0.0), (2L, 3L, 0.0))
      .toDF("id_a", "id_b", "sim")
    val got = Ann.mmrRerank(cands, sims, k = 3).orderBy("rank")
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("mmrRerank: k beyond candidate count selects all; ties break on lower id") {
    val cands = Seq((7L, 0.8), (4L, 0.8)).toDF("id", "rel")
    val sims = Seq((4L, 7L, 0.2)).toDF("id_a", "id_b", "sim")
    val got = Ann.mmrRerank(cands, sims, k = 10).orderBy("rank")
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (2L, 7L))) // equal rel -> lower id first
  }

  test("meanByGroup: exact means, invariant to input row order") {
    val rows = Seq(
      (1L, 0, Array(1.0f, 2.0f)),
      (2L, 0, Array(3.0f, 4.0f)),
      (3L, 1, Array(10.0f, 20.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = graft.similarity.Pooling
      .meanByGroup(df, "label", "embedding", "vec_id")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(got == Map(0 -> Seq(2.0f, 3.0f), 1 -> Seq(10.0f, 20.0f)))
    // reversed input order folds to the identical bits (secondary sort)
    val rev = graft.similarity.Pooling
      .meanByGroup(rows.reverse.toDF("vec_id", "label", "embedding"),
        "label", "embedding", "vec_id")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(rev == got)
  }

  test("meanByGroup: empty input yields empty frame; ragged dims take max") {
    val empty = Seq.empty[(Long, Int, Array[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(graft.similarity.Pooling
      .meanByGroup(empty, "label", "embedding", "vec_id").count() == 0)
    // ragged vectors: output width is the MAX length (deterministic),
    // not whichever row an arbitrary first() happened to return
    val ragged = Seq(
      (1L, 0, Array(2.0f)),
      (2L, 0, Array(4.0f, 8.0f))).toDF("vec_id", "label", "embedding")
    val m = graft.similarity.Pooling
      .meanByGroup(ragged, "label", "embedding", "vec_id")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(m(0) == Seq(3.0f, 4.0f)) // dim0: (2+4)/2; dim1: 8/2 over n=2
  }

  test("ndcgAtK: perfect=1 exactly, reversed matches hand fold, miss=0") {
    val k = 3
    val qs = Seq(Tuple1(1L)).toDF("query_id")
    def ranking(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (n, i) => (1L, (i + 1).toLong, n) }
      .toDF("query_id", "rank", "neighbor_id")
    val exact = ranking(Seq(10L, 11L, 12L))
    def ndcg(approx: org.apache.spark.sql.DataFrame) =
      Ann.ndcgAtK(exact, approx, qs, k).collect().head.getDouble(2)
    // identical ranking: dcg and idcg are the SAME fold → exactly 1.0
    assert(ndcg(ranking(Seq(10L, 11L, 12L))) === 1.0)
    // reversed: rel (1,2,3) against weights, hand-folded in rank order
    val w = Ann.discountWeights(k)
    val expect = ((0.0 + 1.0 * w(0)) + 2.0 * w(1)) + 3.0 * w(2)
    assert(ndcg(ranking(Seq(12L, 11L, 10L))) === expect / Ann.idealDcg(k))
    // all-miss ranking scores zero
    assert(ndcg(ranking(Seq(20L, 21L, 22L))) === 0.0)
    // monotonic discounts, and idcg equals the perfect fold by formula
    assert(w(0) === 1.0 && w(0) > w(1) && w(1) > w(2))
  }
}
