package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.native

/** Product quantization (PQ) — the third ANN scale path next to
  * hyperplane LSH (Ann) and IVF (Ivf), and the standard memory lever for
  * billion-vector search (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each d-dim vector into `m`
  * subvectors, train a small codebook per subspace, and store each vector
  * as `m` one-byte codes — a 64-dim float32 embedding (256 bytes) becomes
  * m=4 bytes, a 64× compression that turns a 100 TB embedding store into
  * a broadcast-friendly sub-2-TB code table.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * full-precision and its dot product against a stored vector is
  * approximated by the sum of per-subspace dots against the CODE's
  * centroid — m array lookups + m small dots per candidate instead of a
  * d-dim scan.
  *
  * Training reuses [[Ivf.train]] per subspace, so codebooks inherit its
  * bit-deterministic ordered-fold Lloyd iteration — which is what lets
  * q_ann_pq carry a full DuckDB twin of training, encoding AND search.
  *
  * Scale shape: training touches the corpus m times narrowly (the slice
  * is a projection, Lloyd shuffles only (sum,count) accumulators);
  * encoding is ONE narrow projection (m nearest-centroid argmaxes over
  * driver-resident codebooks, k·m centroids total — bounded by
  * construction, never by data); ADC search broadcasts the query set and
  * scans codes, no shuffle until the top-k partial aggregate. */
object Pq {

  /** Per-subspace codebooks: slice the corpus into m contiguous subspaces
    * and run the deterministic Lloyd trainer on each. Returns m codebooks
    * of k (centroid_id, subvector) pairs, id-sorted — driver-sized (m·k
    * rows) by construction. */
  def trainCodebooks(corpus: DataFrame, m: Int, k: Int, dim: Int,
      iters: Int = 1, idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Array[(Int, Seq[Float])]] = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split evenly into m=$m")
    val sub = dim / m
    (0 until m).map { mi =>
      val sliced = corpus.select(col(idCol),
        slice(col(vecCol), mi * sub + 1, sub).as(vecCol))
      Ivf.collectCentroids(
        Ivf.train(sliced, k, iters, idCol, vecCol, dim = sub))
    }
  }

  /** Nearest-codebook-entry argmax for one subspace slice — the same
    * cosine DESC / centroid_id ASC struct trick as [[Ivf.assignTo]]. */
  private def nearestCode(cb: Array[(Int, Seq[Float])], sv: Column): Column = {
    val scores = Ivf.centroidScores(cb.sortBy(_._1), sv)
    val top = if (scores.length == 1) scores.head else greatest(scores.toSeq: _*)
    (-top.getField("neg_id")).cast(IntegerType)
  }

  /** Encode the corpus: one narrow projection producing the m code
    * columns `code_0..code_{m-1}` — this projection IS the compressed
    * store (write it instead of the embeddings). */
  def encode(corpus: DataFrame, codebooks: Seq[Array[(Int, Seq[Float])]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = codebooks.head.head._2.length
    val codeCols = codebooks.zipWithIndex.map { case (cb, mi) =>
      nearestCode(cb, slice(col(vecCol), mi * sub + 1, sub)).as(s"code_$mi")
    }
    corpus.select(col(idCol) +: codeCols: _*)
  }

  /** ADC top-k over an encoded corpus: per candidate, the approximate dot
    * is the sum over subspaces of dot(query slice, centroid-of-code) — m
    * element_at lookups into the broadcast codebooks. Queries are
    * (query_id, query_vec) at full precision; result is
    * (query_id, rank, neighbor_id, adc_dot). The sum is a fixed
    * left-to-right chain of IEEE doubles, so it is bit-identical across
    * engines and the score can be oracle-checked exactly. */
  def adcTopK(codes: DataFrame, queries: DataFrame,
      codebooks: Seq[Array[(Int, Seq[Float])]], k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val sub = codebooks.head.head._2.length
    val approx = codebooks.zipWithIndex.map { case (cb, mi) =>
      val centArr = typedlit(cb.sortBy(_._1).map(_._2))
      native.vec_dot(
        slice(col("query_vec"), mi * sub + 1, sub),
        element_at(centArr, col(s"code_$mi") + 1))
    }.reduce(_ + _)
    val scored = codes.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(approx, 6).as("cosine"))
    Ann.topKPerQuery(scored, k).withColumnRenamed("cosine", "adc_dot")
  }

  /** IVFADC (Jégou et al. 2011 §IV) — IVF pruning composed with ADC
    * ranking, the standard billion-vector search shape: the probe set
    * bounds WHICH inverted lists are scanned (~nprobe/k of the corpus)
    * and the PQ codes bound WHAT is scanned per candidate (m bytes
    * instead of d floats). Non-residual variant: codes quantize the raw
    * vectors, so IVF centroids and PQ codebooks train independently —
    * both stages stay bit-deterministic and the whole path carries a
    * full DuckDB twin (training, probe selection, encoding, ADC).
    *
    * Scale shape: the compressed store is (id, centroid_id, m codes) —
    * at 100 TB of raw embeddings this is the table you persist
    * (centroid-partitioned, like [[Ivf.writeAssignedStore]]); the probe
    * join broadcasts queries into only the probed lists, and ranking is
    * the same partial+final TopK aggregate as every other ANN path. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: Seq[Array[(Int, Seq[Float])]], k: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = Ivf.collectCentroids(centroids)
    val store = Ivf.assignTo(cents, corpus, idCol, vecCol)
      .select(col(idCol), col("centroid_id"))
      .join(encode(corpus, codebooks, idCol, vecCol), idCol)
    val qScores = array(Ivf.centroidScores(cents, col("query_vec")).toSeq: _*)
    val probes = queries.select(col("query_id"), col("query_vec"),
        explode(slice(sort_array(qScores, asc = false), 1, nprobe)).as("pc"))
      .select(col("query_id"), col("query_vec"),
        (-col("pc.neg_id")).cast(IntegerType).as("centroid_id"))
    val sub = codebooks.head.head._2.length
    val approx = codebooks.zipWithIndex.map { case (cb, mi) =>
      val centArr = typedlit(cb.sortBy(_._1).map(_._2))
      native.vec_dot(
        slice(col("query_vec"), mi * sub + 1, sub),
        element_at(centArr, col(s"code_$mi") + 1))
    }.reduce(_ + _)
    val scored = store.join(broadcast(probes), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(approx, 6).as("cosine"))
    Ann.topKPerQuery(scored, k).withColumnRenamed("cosine", "adc_dot")
  }
}
