package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.native

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a training-data pipeline needs both:
  *  - `bruteForceTopK`: exact cosine top-k. The query set is broadcast
  *    (it is small by construction); the corpus streams through a single
  *    narrow map + per-query top-k — no shuffle of the corpus, and the
  *    top-k is a TakeOrdered per query key, not a global sort. This is the
  *    correctness baseline and is already the right *shape* for 100 TB
  *    (corpus-side work is embarrassingly parallel).
  *  - `lshTopK` / `withLshBucket`: random-hyperplane LSH. Corpus is
  *    bucketed once (a cheap narrow map — `planes` dot products per row);
  *    queries probe only their bucket → the candidate set per query is
  *    ~corpus/2^planes. This is the scale path: at 100 TB you materialize
  *    the bucketed corpus (partitioned/bucketed by `lsh_bucket` on disk)
  *    and every query touches a tiny slice.
  *
  * Dot products use the native codegen'd `vec_dot` expression — the hot
  * loop is a primitive float loop inside WholeStageCodegen.
  */
object Ann {

  /** Rank `scored(query_id, neighbor_id, cosine)` to the per-query top-k as
    * (query_id, rank, neighbor_id, cosine) — two-stage: the typed TopK
    * Aggregator keeps a k-bounded buffer per (query × map task), so the
    * shuffle carries |partitions| × k rows per query instead of every
    * scored candidate (a Window.partitionBy(query_id) would sort the whole
    * candidate set in |queries| reducers — with 10 queries that is 10 tasks
    * each sorting the corpus; at 100 TB that window is the job). */
  private[similarity] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopK(k),
      Encoders.product[graft.functions.Scored])
    scored.groupBy("query_id")
      .agg(topk(col("cosine"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.cosine").as("cosine"))
  }

  /** Recall@k of an approximate ANN result against the exact brute-force
    * answer — the evaluation metric that justifies an index's
    * speed/recall trade. Both inputs are (query_id, neighbor_id [, ...])
    * top-k frames; output is per-query hit count and recall. Left join
    * from the query set keeps zero-hit queries visible (an index that
    * misses everything should score 0, not vanish). */
  def recallAtK(exact: DataFrame, approx: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    // denominator = what the exact answer actually contains for this
    // query, capped at k: a corpus smaller than k+1 has < k true
    // neighbors, and dividing by the constant k would understate recall
    // (it could never reach 1.0). A query with NO exact neighbors scores
    // 0 rather than null/NaN.
    val nExact = exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
    queries.select(col("query_id"))
      .join(hits, Seq("query_id"), "left")
      .join(nExact, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_exact"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("n_hit"), lit(0L)).cast(DoubleType)
            / least(lit(k.toLong), col("n_exact")))
          .as(s"recall_at_$k"))
  }

  /** Per-query reciprocal rank of an approximate top-k list against the
    * exact relevant set: rr = 1/rank of the FIRST approx result that is a
    * true neighbor, 0 when the list misses entirely. Complements
    * recallAtK (recall counts hits anywhere; rr rewards putting one at
    * the top — the metric behind MRR). Emitted per query, not averaged:
    * the mean is one trivial aggregate away, and per-query rows keep the
    * comparison engine-exact (1/rank is a single correctly-rounded
    * division of small ints; a mean would sum doubles in partition
    * order). `approx` must carry (query_id, rank, neighbor_id). */
  def reciprocalRank(exact: DataFrame, approx: DataFrame,
      queries: DataFrame): DataFrame = {
    val firstHit = approx.select(col("query_id"), col("rank"),
        col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(min(col("rank")).as("first_rank"))
    queries.select(col("query_id"))
      .join(firstHit, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"),
        when(col("first_rank").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_rank").cast(DoubleType))
          .as("rr"))
  }

  /** Per-query nDCG@k of an approximate top-k against the exact ranking
    * (Järvelin & Kekäläinen 2002) — the graded metric that, unlike
    * recall/MRR, rewards putting the BEST neighbors highest: relevance
    * of an approx result at exact rank e is k+1−e (0 if outside the
    * exact top-k), DCG = Σ rel_r·w_r with w_r = 1/log2(r+1), and the
    * ideal DCG is the same sum over the perfect ordering.
    *
    * Determinism contract: log2 is NOT correctly rounded and varies by
    * libm, so the k discount weights are computed ONCE here and ride
    * the plan as literals — an oracle twin embeds the same decimal
    * literals (Double.toString round-trips exactly), making the metric
    * engine-exact. The per-query DCG sum is an ordered fold over the
    * ≤k collected ranks, the PageRank contract.
    *
    * Scale shape: one equi-join of two top-k frames (both k·|queries|
    * rows) + one hash aggregate; never touches the corpus. */
  def ndcgAtK(exact: DataFrame, approx: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = discountWeights(k)
    val idcg = idealDcg(k)
    val rel = approx.select(col("query_id"), col("rank"),
        col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id"),
          col("rank").as("exact_rank")),
        Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("rank"),
        (coalesce(lit(k.toLong + 1L) - col("exact_rank"), lit(0L))
          .cast(DoubleType) *
          element_at(lit(w.toArray), col("rank").cast(IntegerType)))
          .as("g"))
    val dcg = rel.groupBy("query_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("rank"), col("g")))),
        lit(0.0), (acc, x) => acc + x.getField("g")).as("dcg"))
    queries.select(col("query_id"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        (coalesce(col("dcg"), lit(0.0)) / lit(idcg)).as("ndcg"))
  }

  /** The k DCG discount weights 1/log2(r+1), r = 1..k — computed once
    * so both the plan and any oracle share identical doubles. */
  def discountWeights(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Ideal DCG at k: Σ_{r=1..k} (k+1−r)·w_r, left-to-right. */
  def idealDcg(k: Int): Double = {
    val w = discountWeights(k)
    var s = 0.0
    var r = 1
    while (r <= k) { s += (k + 1 - r).toDouble * w(r - 1); r += 1 }
    s
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * a lexical and a vector rank list — the standard hybrid-retrieval
    * merge: score(d) = Σ 1/(kRrf + rank_list(d)), with a list the doc is
    * absent from contributing 0. Inputs are (doc_id, lex_rank) and
    * (doc_id, vec_rank) top-k lists, so both sides are bounded by their
    * own k BY CONSTRUCTION — the full-outer join is tiny-on-tiny no
    * matter the corpus size; all the heavy lifting happened in the
    * upstream BM25 / ANN top-k operators, which are the distributed
    * part. The fused score is one fixed-shape double expression
    * (coalesce-per-list, left-to-right sum) so an oracle replays it
    * bit-for-bit. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, kRrf: Int = 60,
      topk: Int = 20): DataFrame =
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("vec_rank")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(topk)

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick k results maximizing
    * `lambdaRel * rel(c) - lambdaDiv * max_{s in selected} sim(c, s)` —
    * the standard redundancy-removal pass over a retrieval result list.
    *
    * Inputs are BOUNDED BY CONSTRUCTION: `candidates(id, rel)` is an
    * upstream top-N list (the distributed part — brute-force or ANN
    * top-k over the corpus) and `sims(id_a, id_b, sim)` its N² pairwise
    * similarity matrix (a tiny broadcast self-join of N rows). The
    * greedy selection itself is inherently sequential and runs on ≤ N
    * driver rows — the same bounded-collect class as Ivf's k centroids,
    * not a data-sized collect. Ties break on the lower id; `lambdaDiv`
    * is an explicit constant (NOT computed as `1 - lambdaRel`, whose
    * float value engines would have to agree on). */
  def mmrRerank(candidates: DataFrame, sims: DataFrame, k: Int,
      lambdaRel: Double = 0.7, lambdaDiv: Double = 0.3,
      maxCandidates: Int = 1024): DataFrame = {
    // limit() takes an Int: 46341² overflows, silently truncating the
    // sims collect (wrong ranking, no error) — cap where the square fits
    require(maxCandidates >= 1 && maxCandidates <= 46340,
      s"maxCandidates must be in [1, 46340], got $maxCandidates")
    val spark = candidates.sparkSession
    import spark.implicits._
    // explicit casts (a FloatType/IntegerType input would otherwise
    // throw ClassCastException mid-collect) and a loud bound check: the
    // contract is a top-N candidate list, not a corpus — fail before
    // collecting an unbounded sims matrix to the driver
    val cand = candidates
      .select(col("id").cast("long"), col("rel").cast("double"))
      .limit(maxCandidates + 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    require(cand.length <= maxCandidates,
      s"mmrRerank expects a bounded top-N candidate list (<= " +
        s"$maxCandidates rows) — got more; run the distributed top-k " +
        "first and rerank its result")
    val simRows = sims
      .select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("sim").cast("double"))
      .limit(maxCandidates * maxCandidates + 1)
      .collect()
    require(simRows.length <= maxCandidates.toLong * maxCandidates,
      s"mmrRerank sims matrix exceeds $maxCandidates^2 rows — pass the " +
        "pairwise similarities of the bounded candidate list only")
    val simMap = simRows
      .flatMap { r =>
        val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b) -> s, (b, a) -> s)
      }.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(cand: _*)
    while (selected.size < k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.foreach { case (id, rel) =>
        val score =
          if (selected.isEmpty) rel
          else {
            val maxSim = selected.iterator
              .map(s => simMap.getOrElse((id, s._1), 0.0)).max
            lambdaRel * rel - lambdaDiv * maxSim
          }
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestScore = score; bestId = id
        }
      }
      selected += ((bestId, remaining(bestId)))
      remaining.remove(bestId)
    }
    selected.zipWithIndex
      .map { case ((id, rel), i) => (i + 1L, id, rel) }.toSeq
      .toDF("rank", "doc_id", "relevance")
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * near-misses that teach an embedding model the most. Same scale shape
    * as brute-force top-k (broadcast query set, narrow scoring, k-bounded
    * partial+final TopK aggregation); the label-mismatch predicate rides
    * in the broadcast join condition so same-label pairs are never
    * scored. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      labelCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.join(broadcast(queries),
        col(labelCol) =!= col("query_label") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col(vecCol)), 6).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Deterministic random hyperplanes (seed fixed): planes x dim floats. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** Sign-bit LSH bucket id for each row's vector. */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(planes, dim, seed)
    val bucket = ps.zipWithIndex.map { case (p, i) =>
      when(native.vec_dot(col(vecCol), typedlit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("lsh_bucket", bucket)
  }

  /** Exact cosine top-k neighbors for each query vector.
    * `queries(query_id, query_vec)` is broadcast against the corpus. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col(vecCol)), 6).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Approximate top-k: probe only the query's LSH bucket. Recall depends on
    * `planes` (fewer planes → bigger buckets → higher recall, more work). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 8, dim: Int = 64): DataFrame = {
    val bc = withLshBucket(corpus, vecCol, planes, dim)
    val bq = withLshBucket(queries, "query_vec", planes, dim)
    val scored = bc.join(broadcast(bq), Seq("lsh_bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col(vecCol)), 6).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Scalar int8 quantization of an embedding column — the standard 4×
    * memory/IO compression before a vector index is built (FAISS SQ8).
    * Per-dimension affine codes: code_i = round((x_i - lo_i) * 254 /
    * (hi_i - lo_i)) - 127 ∈ [-127, 127], with lo/hi the corpus-wide
    * per-dimension min/max.
    *
    * Scale shape: the range pass is posexplode → groupBy(dim) min/max —
    * map-side combine reduces each partition to `dim` rows before the
    * shuffle, so the shuffle carries partitions × dim values regardless of
    * corpus size; the collected ranges are dim-bounded (like IVF
    * centroids) and re-enter the encode pass as broadcast literals inside
    * one narrow codegen'd projection. A constant dimension (hi = lo)
    * encodes as 0.
    *
    * Returns the input plus `codes: array<int>`. Dequantize with
    * `lo_i + (code_i + 127) * (hi_i - lo_i) / 254` (max error: half a
    * step, (hi_i-lo_i)/508).
    */
  /** L2-normalize the embedding column (unit vectors) — the standard
    * pre-index step that turns cosine ranking into plain dot products.
    * One narrow projection: per-element double division by the native
    * index-order vec_norm, rounded back to FLOAT (divide and both casts
    * are correctly rounded, so the unit vectors are engine-bit-exact).
    * Float output keeps the column compatible with every other vector
    * kernel and store here (they are all float-array-typed); the all-zero
    * vector stays all-zero instead of dividing by zero. */
  /** Johnson–Lindenstrauss random projection to `dimOut` dimensions with
    * a ±1 sign matrix (Achlioptas 2003's database-friendly projection),
    * DERANDOMIZED from the two-limb Knuth hash of the (row, column)
    * index: s(i,j) = 1 - 2·(hash32(i·131 + j) mod 2). No projection
    * matrix is stored or shuffled — each executor recomputes signs from
    * the indices, so the operator is a pure narrow map at any corpus
    * size, and engines replay it exactly (the twin rebuilds the same
    * signs from the same hash). Each output dim is an in-index-order
    * fold of x_i·s(i,j) (float adds are non-associative; the pinned
    * order is what makes the output bit-stable), scaled by
    * 1/sqrt(dimOut). */
  def jlProject(corpus: DataFrame, dimIn: Int = 64, dimOut: Int = 16,
      vecCol: String = "embedding"): DataFrame = {
    val sign = (i: Column, j: Column) =>
      lit(1.0) - lit(2.0) *
        pmod(graft.functions.Profile.hash32(i * 131 + j), lit(2L))
          .cast(DoubleType)
    val projected = transform(sequence(lit(0), lit(dimOut - 1)), j =>
      aggregate(
        sequence(lit(0), lit(dimIn - 1)),
        lit(0.0),
        (acc, i) => acc +
          element_at(col(vecCol), (i + 1).cast(IntegerType))
            .cast(DoubleType) * sign(i, j),
        acc => acc / sqrt(lit(dimOut.toDouble))))
    corpus.withColumn(vecCol + "_proj", projected)
  }

  def l2Normalize(corpus: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val n = graft.functions.native.vec_norm(col(vecCol))
    corpus.withColumn(vecCol + "_unit",
      when(n === 0.0, transform(col(vecCol), x => lit(0.0f)))
        .otherwise(transform(col(vecCol),
          x => (x.cast(DoubleType) / n).cast(FloatType))))
  }

  def int8Quantize(corpus: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val ranges = corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast(DoubleType)).as("lo"),
        max(col("x").cast(DoubleType)).as("hi"))
      .orderBy("pos")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val lo = ranges.map(_._1).toSeq
    val hi = ranges.map(_._2).toSeq
    val codes = transform(col(vecCol), (x, i) => {
      val l = element_at(typedlit(lo), i + 1)
      val h = element_at(typedlit(hi), i + 1)
      when(h === l, lit(0)).otherwise(
        (round((x.cast(DoubleType) - l) * 254.0 / (h - l)) - 127)
          .cast(IntegerType))
    })
    corpus.withColumn("codes", codes)
  }

  /** Convenience: use the first `nQueries` corpus vectors as the query set. */
  def selfQueries(corpus: DataFrame, nQueries: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
}
