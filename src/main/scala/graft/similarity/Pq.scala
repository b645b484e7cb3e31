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

  /** Per-subspace codebooks, ALL m TRAINED IN ONE PASS per Lloyd
    * iteration: the seed centroids are one k-row collect of the
    * lowest-id vectors (sliced per subspace on the driver), and the m
    * per-subspace assignments ride ONE exploded projection into ONE
    * (subspace, centroid)-keyed ordered fold — where the former shape
    * ran m independent `Ivf.train` calls (m seed jobs + m fold jobs + m
    * corpus scans per iteration; guide §1.2: don't pass over the data
    * once per model piece when one pass trains them all). Bit-identical
    * to the per-subspace trainer: the seed rows are the same k lowest
    * ids, and each (subspace, centroid) group still sums its subvectors
    * in ascending-id order within one partition — the same
    * double-addition order `Ivf.train`'s fold pins (PqSpec asserts the
    * shapes; the PQ contract queries hash-check the values). Returns m
    * codebooks of k (centroid_id, subvector) pairs, id-sorted —
    * driver-sized (m·k rows) by construction. */
  def trainCodebooks(corpus: DataFrame, m: Int, k: Int, dim: Int,
      iters: Int = 1, idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Array[(Int, Seq[Float])]] = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split evenly into m=$m")
    require(iters > 0, s"iters must be positive, got $iters")
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val slim = corpus.select(col(idCol), col(vecCol))
    // seed: the k lowest-id vectors (Ivf.initCentroids' rule), sliced per
    // subspace on the DRIVER — one bounded TakeOrdered job for all m
    val seed = slim.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).as[Array[Float]].collect()
    var books: Seq[Array[(Int, Seq[Float])]] = (0 until m).map { mi =>
      seed.zipWithIndex.map { case (v, i) =>
        (i, v.slice(mi * sub, mi * sub + sub).toSeq)
      }.toArray
    }
    for (_ <- 0 until iters) {
      val entries = array((0 until m).map { mi =>
        val sv = slice(col(vecCol), mi * sub + 1, sub)
        struct(lit(mi).as("mi"), nearestCode(books(mi), sv).as("cid"),
          sv.as("sv"))
      }: _*)
      val folded = slim
        .select(col(idCol).as("vid"), explode(entries).as("e"))
        .select(col("e.mi").as("mi"), col("e.cid").as("cid"), col("vid"),
          col("e.sv").as("sv"))
        .repartition(col("mi"), col("cid"))
        .sortWithinPartitions(col("mi"), col("cid"), col("vid"))
        .as[(Int, Int, Long, Array[Float])]
        .mapPartitions { it =>
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[(Int, Int), (Array[Double], Array[Long])]
          it.foreach { case (mi, cid, _, v) =>
            val (sums, n) = acc.getOrElseUpdate((mi, cid),
              (new Array[Double](sub), new Array[Long](1)))
            var d = 0
            while (d < math.min(sub, v.length)) { sums(d) += v(d); d += 1 }
            n(0) += 1
          }
          acc.iterator.map { case ((mi, cid), (sums, n)) =>
            (mi, cid, sums.map(sv => (sv / n(0)).toFloat).toSeq)
          }
        }
        .collect() // m·k codebook rows, bounded by construction
      books = (0 until m).map { mi =>
        folded.collect { case (`mi`, cid, v) => (cid, v) }.sortBy(_._1).toArray
      }
    }
    books
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

  /** (id, centroid_id, code_0..code_{m-1}) in ONE narrow projection:
    * the coarse assignment and the m subspace codes are all per-row
    * argmaxes over driver-resident literals, so computing them together
    * removes the corpus-wide equi-join on `idCol` the previous shape
    * paid (assignTo.join(encode) — a full shuffle of two corpus
    * projections against each other at 100 TB, for columns that were
    * derivable side by side; guide §2.4 "remove shuffles outright").
    * Row-for-row identical to the join by construction: both sides were
    * one row per id over the same (id, vector) corpus. */
  private def encodedAssign(corpus: DataFrame,
      cents: Array[(Int, Seq[Float])],
      codebooks: Seq[Array[(Int, Seq[Float])]],
      idCol: String, vecCol: String): DataFrame = {
    val sub = codebooks.head.head._2.length
    val codeCols = codebooks.zipWithIndex.map { case (cb, mi) =>
      nearestCode(cb, slice(col(vecCol), mi * sub + 1, sub)).as(s"code_$mi")
    }
    Ivf.assignTo(cents, corpus, idCol, vecCol)
      .select(col(idCol) +: col("centroid_id") +: codeCols: _*)
  }

  /** The ADC approximate-dot expression: the sum over subspaces of
    * dot(query slice, centroid-of-code) — m element_at lookups into the
    * codebook literals. A fixed left-to-right chain of IEEE doubles, so
    * it is bit-identical across engines and every caller ([[adcTopK]],
    * [[ivfAdcTopK]], [[ivfAdcTopKFromStore]]) scores the same — ONE body
    * so the three paths can never drift. */
  private def adcDot(codebooks: Seq[Array[(Int, Seq[Float])]],
      queryVec: Column): Column = {
    val sub = codebooks.head.head._2.length
    codebooks.zipWithIndex.map { case (cb, mi) =>
      val centArr = typedlit(cb.sortBy(_._1).map(_._2))
      native.vec_dot(
        slice(queryVec, mi * sub + 1, sub),
        element_at(centArr, col(s"code_$mi") + 1))
    }.reduce(_ + _)
  }

  /** ADC top-k over an encoded corpus: queries stay full-precision
    * (query_id, query_vec); result is (query_id, rank, neighbor_id,
    * adc_dot). */
  def adcTopK(codes: DataFrame, queries: DataFrame,
      codebooks: Seq[Array[(Int, Seq[Float])]], k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val approx = adcDot(codebooks, col("query_vec"))
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
    val store = encodedAssign(corpus, cents, codebooks, idCol, vecCol)
    val probes = Ivf.probeSelection(queries, cents, nprobe)
    val scored = store.join(broadcast(probes), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(adcDot(codebooks, col("query_vec")), 6).as("cosine"))
    Ann.topKPerQuery(scored, k).withColumnRenamed("cosine", "adc_dot")
  }

  /** Codebooks as a PARQUET table (subspace, centroid_id, centroid) —
    * m·k rows, driver-sized by construction. FLOAT columns round-trip
    * parquet bit-exactly, so a probe from re-read codebooks scores
    * identically to the in-memory codebooks (the q_kn_score_stored
    * trade, applied to the PQ model). */
  def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
      codebooks: Seq[Array[(Int, Seq[Float])]], path: String): Unit = {
    import spark.implicits._
    graft.sources.Sinks.writeParquet(
      codebooks.zipWithIndex.flatMap { case (cb, mi) =>
        cb.map { case (cid, v) => (mi, cid, v) }
      }.toDF("subspace", "centroid_id", "centroid"), path)
  }

  /** Read [[writeCodebooks]] output back into the driver-resident shape
    * every PQ entry point takes — one bounded collect of m·k rows. */
  def readCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Array[(Int, Seq[Float])]] =
    spark.read.parquet(path)
      .select(col("subspace").cast(IntegerType),
        col("centroid_id").cast(IntegerType), col("centroid"))
      .collect() // bounded: m·k codebook rows by construction
      .map(r => (r.getInt(0), (r.getInt(1), r.getSeq[Float](2))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).sortBy(_._1).toArray)

  /** The memory-compressed serving store: (id, centroid_id,
    * code_0..code_{m-1}) hive-partitioned by centroid_id — at 100 TB of
    * raw embeddings THIS is the table you persist (m bytes of code per
    * vector instead of d floats; ~64x smaller at m=4, d=64), probed by
    * [[ivfAdcTopKFromStore]] with the same partition pruning as
    * [[Ivf.writeAssignedStore]]. Rows are range-clustered on
    * (centroid_id, id) before the partitioned write for the same
    * balanced-files-per-cell reason (Ivf.writeAssignedStore's scaladoc:
    * hash-per-cell turns cell-size imbalance into probe-task skew). */
  def writeIvfAdcStore(corpus: DataFrame, centroids: DataFrame,
      codebooks: Seq[Array[(Int, Seq[Float])]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = Ivf.collectCentroids(centroids)
    graft.sources.Sinks.writeParquet(
      encodedAssign(corpus, cents, codebooks, idCol, vecCol)
        .repartitionByRange(col("centroid_id"), col(idCol)),
      path, partitionCols = Seq("centroid_id"))
  }

  /** IVFADC from DISK — completes the stored serving triple (centroids ✓
    * and inverted lists ✓ in q_ann_stored_index; codebooks + codes here):
    * the probe set becomes an IN filter on the partition column so the
    * scan lists and reads ONLY the probed code directories, and ADC
    * ranking is [[adcDot]] verbatim — integer codes and float codebooks
    * are parquet-exact, so the disk probe equals [[ivfAdcTopK]] over the
    * same models and SHARES its full DuckDB twin. */
  def ivfAdcTopKFromStore(storePath: String, queries: DataFrame,
      centroids: DataFrame, codebooks: Seq[Array[(Int, Seq[Float])]],
      k: Int, nprobe: Int = 2, idCol: String = "vec_id"): DataFrame = {
    val spark = queries.sparkSession
    val cents = Ivf.collectCentroids(centroids)
    // localize, don't persist: probes are |queries| x nprobe rows
    // (driver-bounded by the query-set contract), so the probe-id
    // collect and the broadcast run off a LocalRelation — no cluster
    // job, no cache entry leaked per probe call (Ivf.ivfTopKFromStore's
    // rationale)
    val probes = Ivf.localizeCentroids(
      Ivf.probeSelection(queries, cents, nprobe))
    val probeIds = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)) // bounded by the centroid count
    val codes = spark.read.parquet(storePath)
      .filter(col("centroid_id").isin(probeIds.map(Int.box): _*))
    val scored = codes.join(broadcast(probes), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(adcDot(codebooks, col("query_vec")), 6).as("cosine"))
    Ann.topKPerQuery(scored, k).withColumnRenamed("cosine", "adc_dot")
  }
}
