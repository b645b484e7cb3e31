package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.native

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to hyperplane LSH (Ann.scala).
  *
  * Train: distributed Lloyd iterations — assign each vector to its nearest
  * centroid with a NARROW per-row argmax over the driver-resident centroid
  * set (k rows by construction — the one part of IVF that is intentionally
  * driver-sized), then recompute centroids with a deterministic
  * secondary-sort fold (see train). The corpus shuffles once per
  * iteration, partitioned by centroid; each task keeps one (sum, count)
  * accumulator per centroid.
  *
  * Search: a query probes its `nprobe` nearest centroids and scores only
  * those inverted lists — corpus work per query drops from O(n) to
  * O(n * nprobe / k). At 100 TB the assigned corpus is written partitioned
  * by centroid_id so a probe reads only matching partitions (partition
  * pruning does the list lookup).
  */
object Ivf {

  /** Initial centroids: deterministic corpus sample (lowest ids). The k
    * seeds are numbered on the DRIVER — the centroid set is driver-sized
    * by construction, and an unpartitioned row_number window here would
    * put a single-partition WindowExec in every training plan. */
  private def initCentroids(corpus: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).as[Array[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
  }

  /** Re-create a trained centroid frame as a DRIVER-LOCAL relation (one
    * bounded collect — k rows by construction): downstream per-batch /
    * per-stage uses must not re-run the training lineage. ONE home for
    * the localize idiom (recallDrift, writeVersionedIndex, and the
    * SparkEntry stream-store builder all need it). */
  private[graft] def localizeCentroids(trained: DataFrame): DataFrame = {
    val rows = trained.collect() // k centroid rows, driver-sized
    trained.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), trained.schema)
  }

  /** The store write every layout variant shares: range-cluster the
    * assigned rows on (centroid_id, id) — the skew rationale documented
    * on [[writeAssignedStore]] — and write hive-partitioned by
    * centroid_id. ONE body so the base, append, batch-keyed, and
    * compacted layouts can never diverge. */
  private def clusteredStoreWrite(assigned: DataFrame, path: String,
      idCol: String,
      mode: org.apache.spark.sql.SaveMode =
        org.apache.spark.sql.SaveMode.Overwrite): Unit =
    graft.sources.Sinks.writeParquet(
      assigned.repartitionByRange(col("centroid_id"), col(idCol)),
      path, partitionCols = Seq("centroid_id"), mode = mode)

  /** Materialize the centroid set on the driver: k (id, vector) pairs —
    * bounded by k, never by data scale. */
  private[similarity] def collectCentroids(centroids: DataFrame): Array[(Int, Seq[Float])] =
    centroids.select(col("centroid_id").cast(IntegerType), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)

  /** Per-row array of (cosine, -centroid_id) structs against every centroid
    * — struct ordering gives cosine DESC then centroid_id ASC, so
    * `greatest` is the argmax and a descending sort ranks probes. */
  private[similarity] def centroidScores(cents: Array[(Int, Seq[Float])],
      vec: Column): Array[Column] =
    cents.map { case (cid, cvec) =>
      struct(native.vec_cosine(vec, typedlit(cvec)).as("cos"),
        lit(-cid).as("neg_id"))
    }

  /** Above this k, assign via the native NearestCentroid kernel instead of
    * the `greatest` literal tree: the tree's generated code grows
    * O(k·dim), which blows past the JIT/64KB method limits at
    * IVF-realistic k (≥4096) and silently falls back to interpreted eval
    * per row × per centroid. The kernel loops over ONE array literal —
    * constant codegen size at any k. Both formulations are
    * bitwise-identical (IvfSpec asserts parity). */
  private[similarity] val GreatestMaxK = 64

  /** Assign each vector its nearest centroid by cosine — ONE narrow
    * projection, zero shuffle. Small k: greatest over k scored structs
    * (struct ordering = cosine DESC, centroid_id ASC). Large k: the
    * NearestCentroid kernel over an array literal (same semantics, O(1)
    * codegen). The previous formulation (crossJoin +
    * Window.partitionBy(vec_id) + row_number) shuffled and sorted n×k
    * scored rows per Lloyd iteration and per probe. */
  def assign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignTo(collectCentroids(centroids), corpus, idCol, vecCol)

  private[graft] def assignTo(cents: Array[(Int, Seq[Float])], corpus: DataFrame,
      idCol: String, vecCol: String,
      useKernel: Option[Boolean] = None): DataFrame = {
    // id-ascending order is the tie-break contract shared by both paths
    val sorted = cents.sortBy(_._1)
    val best =
      if (useKernel.getOrElse(sorted.length > GreatestMaxK))
        native.nearest_centroid(col(vecCol), typedlit(sorted.toSeq))
      else {
        val scores = centroidScores(sorted, col(vecCol))
        val top = if (scores.length == 1) scores.head else greatest(scores.toSeq: _*)
        -top.getField("neg_id")
      }
    corpus.select(col(idCol), col(vecCol),
      best.cast(IntegerType).as("centroid_id"))
  }

  /** Lloyd iterations; returns final centroids (centroid_id, centroid).
    * Centroid recomputation is a DETERMINISTIC secondary-sort fold:
    * repartition by centroid, sort each partition by (centroid, vec_id),
    * and sum every dimension left-to-right in id order. Double addition is
    * not associative, so a partial-buffer aggregator's merge order would
    * make the trained centroids (and thus every downstream ANN result)
    * vary run-to-run; the ordered fold pins the result bit-for-bit across
    * runs, partitionings, AND engines — which is what lets q_ann_ivf carry
    * a full DuckDB twin of the training loop. Memory stays flat: one
    * (sum, count) accumulator per centroid per task, never the vectors. */
  def train(corpus: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val slim = corpus.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dim <= 0 → infer from the first vector (a 1-row collect, bounded):
    // a hardcoded default silently truncated centroids of wider embeddings
    // to the first 64 dimensions.
    val vecDim = if (dim > 0) dim
      else slim.select(size(col(vecCol))).first().getInt(0)
    var cents = initCentroids(slim, k, idCol, vecCol)
    for (_ <- 0 until iters) {
      val assigned = assign(slim, cents, idCol, vecCol)
      cents = assigned
        .select(col("centroid_id"), col(idCol).as("vid"),
          col(vecCol).as("vec"))
        .repartition(col("centroid_id"))
        .sortWithinPartitions(col("centroid_id"), col("vid"))
        .as[(Int, Long, Array[Float])]
        .mapPartitions { it =>
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[Int, (Array[Double], Array[Long])]
          it.foreach { case (cid, _, v) =>
            val (sums, n) = acc.getOrElseUpdate(cid,
              (new Array[Double](vecDim), new Array[Long](1)))
            var d = 0
            while (d < math.min(vecDim, v.length)) { sums(d) += v(d); d += 1 }
            n(0) += 1
          }
          acc.iterator.map { case (cid, (sums, n)) =>
            (cid, sums.map(sv => (sv / n(0)).toFloat))
          }
        }
        .toDF("centroid_id", "centroid")
    }
    cents
  }

  /** Write the assigned corpus as a CENTROID-PARTITIONED parquet store —
    * the 100 TB layout the probe path wants: one hive directory per
    * inverted list, written once per (re)train. The assigned rows are
    * CLUSTERED before the partitioned write (the standard
    * repartition-before-partitionBy): without it every write task emits
    * one file per cell it holds — tasks × cells small files (measured:
    * 32 × 782 ≈ 25k files at the 100× stress scale), a file-listing and
    * object-store-metadata tax on every probe. Clustering is
    * RANGE-based on (centroid_id, id), not hash-on-centroid alone:
    * hash clustering writes exactly one file per cell, which makes
    * probe-read task granularity equal CELL SIZE and turns cell-size
    * imbalance directly into record skew (the 10× ContractStress gate
    * caught 7.7× on the incremental-store probe); the range partitioner's
    * weighted sampling gives oversized cells several balanced files and
    * lets small cells share write tasks, while directory-level pruning —
    * a hive-partitionBy property — is untouched. */
  def writeAssignedStore(corpus: DataFrame, centroids: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    clusteredStoreWrite(assign(corpus, centroids, idCol, vecCol), path, idCol)

  /** Incremental index maintenance: assign a NEW batch of vectors to the
    * FROZEN centroid set and APPEND it to an existing
    * [[writeAssignedStore]] layout — no retrain, no rewrite of the
    * resident lists. This is the daily-corpus-append path a real
    * pipeline needs: assignment is a narrow per-row argmax (zero
    * shuffle), and the hive append only touches the partition
    * directories the batch actually lands in. Because assignment is a
    * deterministic per-row function of (vector, centroids), the merged
    * store is BIT-IDENTICAL to a full rebuild of the union corpus under
    * the same centroids (IvfSpec asserts it; q_ann_incremental's DuckDB
    * twin replays it) — recall drifts only as far as the frozen
    * centroids drift from the true cluster structure, the standard IVF
    * reindex-cadence trade. */
  def appendToStore(newVectors: DataFrame, centroids: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    clusteredStoreWrite(assign(newVectors, centroids, idCol, vecCol), path,
      idCol, mode = org.apache.spark.sql.SaveMode.Append)

  /** The nightly-retrain base layer of an INGEST-KEYED store: the same
    * clustered centroid-partitioned layout as [[writeAssignedStore]], but
    * nested under `ingest=base` of the root so streamed micro-batches can
    * land next to it under their own `ingest=b<batchId>` keys
    * ([[writeBatchToStore]]). Reading the root recovers one dataset with
    * (ingest, centroid_id) as hive partition columns — probe-time
    * partition pruning on centroid_id is untouched by the extra level
    * (directory pruning matches any partition column), so
    * [[ivfTopKFromStore]] works on this layout unchanged. */
  def writeIngestStore(corpus: DataFrame, centroids: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    writeAssignedStore(corpus, centroids, s"$path/ingest=base", idCol, vecCol)

  /** IDEMPOTENT per-micro-batch append to an ingest-keyed store: the
    * batch's assigned rows OVERWRITE its own `ingest=b<batchId>`
    * directory. A micro-batch replayed after a crash (source offsets are
    * in the streaming checkpoint; the last batch may re-fire) rewrites
    * byte-identical content instead of duplicating rows — assignment is a
    * deterministic per-row function of (vector, centroids), so replay
    * converges. This is the `parquetSinkExactlyOnce` recipe
    * (offsets-in-checkpoint + idempotent-by-batchId) adapted to keep
    * centroid_id a hive partition column underneath the batch key; a raw
    * hive append into the shared lists — the previous shape — was
    * at-least-once. */
  def writeBatchToStore(newVectors: DataFrame, centroids: DataFrame,
      path: String, batchId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    clusteredStoreWrite(assign(newVectors, centroids, idCol, vecCol),
      s"$path/ingest=b$batchId", idCol)

  /** Compact an INGEST-KEYED store ([[writeIngestStore]] base +
    * streamed [[writeBatchToStore]] layers) into a fresh single-base
    * root at `dstPath` — the table-maintenance step of the always-on
    * ingest lifecycle: every micro-batch adds ~one file per touched
    * cell, so an unbounded feed means unbounded file counts and
    * probe-time listing/footer cost (the Sinks.compact rationale,
    * applied to the index store). Rows are ALREADY assigned — the
    * rewrite is one read + one range-clustered partitioned write, no
    * centroid work — and carries every layer, so the compacted store
    * answers probes identically to the layered one (IvfSpec asserts it;
    * q_stream_index_compact hash-checks it). Like Sinks.compact, the
    * rewrite is a fresh dataset: a production deployment swaps it in
    * via its manifest/metastore pointer, which also gives the swap
    * atomicity that in-place deletion could not. Returns
    * (filesBefore, filesAfter). */
  def compactIngestStore(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Int, Int) = {
    def countFiles(p: String): Int = {
      val path = new org.apache.hadoop.fs.Path(s"$p/ingest=*/centroid_id=*/part-*")
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .globStatus(path).length
    }
    val before = countFiles(srcPath)
    clusteredStoreWrite(
      spark.read.parquet(srcPath)
        .select(col(idCol), col(vecCol), col("centroid_id")),
      s"$dstPath/ingest=base", idCol)
    (before, countFiles(dstPath))
  }

  /** IVF top-k against a [[writeAssignedStore]] layout: the probe set (the
    * union of every query's nprobe nearest centroids — at most k ids,
    * driver-sized by construction) becomes an IN filter on the partition
    * column, so the scan lists and reads ONLY the probed inverted-list
    * directories (PartitionFilters — file-listing-time pruning, the same
    * lever as q_partitioned_scan). Result is identical to [[ivfTopK]]
    * over the same centroids, which is how q_ann_ivf_pruned shares
    * q_ann_ivf's full DuckDB twin. */
  /** Probe selection shared by every IVF-family search path: each query's
    * nprobe nearest centroids. Returns (query_id, query_vec,
    * centroid_id), one row per probe. ONE body ([[ivfTopK]],
    * [[ivfTopKFromStore]], Pq.ivfAdcTopK, Pq.ivfAdcTopKFromStore) so the
    * in-memory and stored probes can never drift.
    *
    * Same two formulations as [[assignTo]], same switch: small k sorts a
    * per-row array of k scored-struct literals and explodes the first
    * nprobe — narrow, no shuffle, no join. Past [[GreatestMaxK]] that
    * literal array is O(k·dim) generated code (782 cells × 64 dims ≈ 50k
    * constants — compile-time and JIT death, the exact bound the
    * NearestCentroid kernel removed from assignment), so large k scores
    * a broadcast centroid TABLE (k driver-local rows) against the query
    * set and ranks with the k-bounded TopK aggregate — no window over
    * the query set, |partitions|×nprobe rows shuffled per query. The
    * TopK comparator (cosine DESC, id ASC) is the struct ordering, so
    * both paths pick identical probes (IvfSpec asserts parity).
    * PRECONDITION: query_id uniquely identifies a query row (true for
    * every caller — Ann.selfQueries and the stored probes) — the
    * aggregate path groups scores BY query_id, so duplicate ids with
    * different vectors would merge their probe sets where the literal
    * path scores each row independently. */
  private[graft] def probeSelection(queries: DataFrame,
      cents: Array[(Int, Seq[Float])], nprobe: Int,
      useAggregate: Option[Boolean] = None): DataFrame = {
    val sorted = cents.sortBy(_._1)
    if (useAggregate.getOrElse(sorted.length > GreatestMaxK)) {
      val spark = queries.sparkSession
      import spark.implicits._
      val centsDf = sorted.toSeq.map { case (cid, v) => (cid.toLong, v) }
        .toDF("cent_id", "centroid")
      val scored = queries.crossJoin(broadcast(centsDf))
        .select(col("query_id"),
          native.vec_cosine(col("query_vec"), col("centroid")).as("cosine"),
          col("cent_id").as("neighbor_id"))
      Ann.topKPerQuery(scored, nprobe)
        .select(col("query_id"),
          col("neighbor_id").cast(IntegerType).as("centroid_id"))
        .join(queries.select(col("query_id"), col("query_vec")), "query_id")
        .select(col("query_id"), col("query_vec"), col("centroid_id"))
    } else {
      val qScores = array(centroidScores(sorted, col("query_vec")).toSeq: _*)
      queries.select(col("query_id"), col("query_vec"),
          explode(slice(sort_array(qScores, asc = false), 1, nprobe)).as("pc"))
        .select(col("query_id"), col("query_vec"),
          (-col("pc.neg_id")).cast(IntegerType).as("centroid_id"))
    }
  }

  def ivfTopKFromStore(storePath: String, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      rowFilter: Option[Column] = None): DataFrame = {
    val spark = queries.sparkSession
    val cents = collectCentroids(centroids)
    val probes = probeSelection(queries, cents, nprobe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeIds = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)) // bounded by k, never by data scale
    // rowFilter (e.g. sampledAudit's hash-bucket sample) COMPOSES with
    // the partition-pruning IN filter: the scan still lists and reads
    // only the probed inverted-list directories
    val assigned = rowFilter.foldLeft(
      spark.read.parquet(storePath)
        .filter(col("centroid_id").isin(probeIds.map(Int.box): _*)))(_.filter(_))
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col(vecCol)), 6).as("cosine"))
    Ann.topKPerQuery(scored, k)
  }

  /** Approximate top-k: probe the query's `nprobe` nearest centroids.
    * Probe selection is narrow too: sort the per-row centroid-score array
    * and explode the first nprobe — no window over the query set. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    val assigned = assignTo(cents, corpus, idCol, vecCol)
    val probes = probeSelection(queries, cents, nprobe)
    // score only the probed lists
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col(vecCol)), 6).as("cosine"))
    Ann.topKPerQuery(scored, k)
  }

  /** k-NN graph construction, cluster-blocked: every vector's exact
    * top-k cosine neighbors WITHIN its coarse-quantizer cell. This is the
    * all-pairs analogue of [[ivfTopK]] (query set = the whole corpus) and
    * the first stage of graph-index builds (NN-Descent seeding, HNSW base
    * layer) and of SemDeDup-style curation. Blocking by the trained
    * centroid turns the O(n²) all-pairs cosine into O(Σ cᵢ²) over cell
    * sizes — the same contract Dedup.semanticNearDupPairs relies on —
    * and each cell's self-join is an equi-join on centroid_id, so the
    * plan shuffles each vector once and never goes cartesian. Per-query
    * results come from the k-bounded TopK partial+final aggregate:
    * ≤ partitions×k rows shuffle per query, not the full candidate set.
    *
    * Scale bound: at a FIXED centroid count the blocked pair volume is
    * Θ(n²/cells), i.e. quadratic in corpus growth — the same superlinear
    * term the minhash 100× stress caught in hot buckets. Size the cell
    * count to the corpus ([[knnGraphAuto]] does it and prices the join
    * before committing), not to a constant. */
  def knnGraph(corpus: DataFrame, centroids: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(corpus, centroids, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    knnGraphOfAssigned(assigned, k, idCol, vecCol)
  }

  /** The self-join + top-k body of [[knnGraph]] over an already-assigned
    * corpus (vec_id, embedding, centroid_id) — shared by the fixed-k and
    * budget-gated paths so both compute the identical graph. */
  private def knnGraphOfAssigned(assigned: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val l = assigned.select(col("centroid_id"),
      col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val r = assigned.select(col("centroid_id"),
      col(idCol).as("neighbor_id"), col(vecCol).as("nbr_vec"))
    val scored = l.join(r, "centroid_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col("nbr_vec")), 6)
          .as("cosine"))
    Ann.topKPerQuery(scored, k)
  }

  /** Price the cluster-blocked all-pairs volume of an assignment in ONE
    * slim aggregate: (ordered candidate pairs Σ cᵢ·(cᵢ−1), largest cell).
    * This is the ANN analogue of Dedup.chooseBucketCap's rung pricing —
    * the estimate-before-you-join pre-flight that costs one scan of the
    * (id, centroid) projection and nothing else. */
  def cellCost(assigned: DataFrame): (Long, Long) = {
    val row = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") * (col("n") - 1)), lit(0L)).cast(LongType),
        coalesce(max(col("n")), lit(0L)).cast(LongType))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** [[knnGraph]] with the centroid count chosen FROM THE CORPUS and the
    * blocked pair volume priced before the self-join — the closed-loop
    * shape of the fixed-k graph build (the q_dedup_autocap pattern):
    *
    *   cells = max(minCells, ceil(n / targetCellSize))
    *
    * keeps expected cell size — and so expected pair volume
    * Θ(n · targetCellSize) — LINEAR in the corpus where a constant cell
    * count grows it quadratically. After training, the actual assignment
    * is priced with [[cellCost]] and the build REFUSES loudly if skewed
    * cells (a mass of near-identical vectors collapsing into one cell —
    * the embedding-space analogue of boilerplate-hot minhash buckets)
    * push the candidate volume past `pairBudget`: that corpus wants
    * exact/semantic dedup before a graph build, not a bigger join.
    * At the contract gate scale the auto-chosen cell count equals
    * q_knn_graph's literal k, so the DuckDB twin is shared verbatim —
    * the same oracle trade q_dedup_autocap makes. */
  def knnGraphAuto(corpus: DataFrame, k: Int, targetCellSize: Int = 256,
      minCells: Int = 8, pairBudget: Long = 100000000L, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(targetCellSize > 0, s"targetCellSize must be positive: $targetCellSize")
    require(pairBudget > 0, s"pairBudget must be positive: $pairBudget")
    val n = corpus.count() // one bounded scalar, the sizing input
    val cells = math.max(minCells.toLong,
      (n + targetCellSize - 1) / targetCellSize).toInt
    val cents = train(corpus, cells, iters, idCol, vecCol)
    val assigned = assign(corpus, cents, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (pairs, maxCell) = cellCost(assigned.select(col(idCol), col("centroid_id")))
    if (pairs > pairBudget) {
      // the refusal path must not leak the cached assignment: cellCost has
      // already materialized it, and this JVM may host hundreds more
      // queries after the throw (ADVICE r9)
      assigned.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"requirement failed: cluster-blocked graph build over $n vectors " +
          s"in $cells cells admits $pairs candidate pairs (largest cell " +
          s"$maxCell, > budget $pairBudget): the corpus is collapse-skewed " +
          "— near-dup dedup it first, raise targetCellSize pressure via " +
          "more cells, or raise the budget explicitly")
    }
    knnGraphOfAssigned(assigned, k, idCol, vecCol)
  }

  /** Recall-vs-appended-fraction drift audit — the TIME-axis analogue of
    * [[cellCost]]'s pair budget. A frozen-centroid index degrades as the
    * appended fraction grows: new vectors land in increasingly wrong
    * cells as the corpus distribution shifts away from what the coarse
    * quantizer was trained on, and the probe misses them. This measures
    * it: centroids are trained ONCE on the resident corpus (collected to
    * k driver rows so later stages never re-run the training lineage),
    * then for each PREFIX of the appended waves — stage 0 = resident
    * only, stage i = resident + waves 1..i — recall@k of the
    * frozen-centroid IVF probe is computed against the exact brute-force
    * answer over the SAME stage corpus. Everything downstream of the
    * bit-deterministic trainer is deterministic, so the whole curve
    * hash-checks against a full SQL twin (q_ann_drift).
    *
    * Output: one row per (stage, query) — (stage, query_id, n_hit,
    * recall_at_k). Gate the last stage with [[requireFreshIndex]]; at
    * scale, run the audit on a query sample per append epoch and retrain
    * when the floor trips (the nightly-retrain trigger). */
  def recallDrift(resident: DataFrame, waves: Seq[DataFrame],
      queries: DataFrame, k: Int, nprobe: Int = 2, kCents: Int = 8,
      iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // slim every input to (id, vector): the audit needs nothing else and
    // callers' side columns must not constrain the union
    val slim = (df: DataFrame) => df.select(col(idCol), col(vecCol))
    val cents = localizeCentroids(
      train(slim(resident), kCents, iters, idCol, vecCol))
    (0 to waves.size).map { stage =>
      val corpus = (slim(resident) +: waves.take(stage).map(slim))
        .reduce(_ unionByName _)
      val exact = Ann.bruteForceTopK(corpus, queries, k, idCol, vecCol)
      val approx = ivfTopK(corpus, queries, cents, k, nprobe, idCol, vecCol)
      Ann.recallAtK(exact, approx, queries, k)
        .select(lit(stage).as("stage"), col("*"))
    }.reduce(_ unionByName _)
  }

  /** Newest COMMITTED version of a VERSIONED index root
    * (`root/v=N/{centroids, store}`) — 0 when nothing was ever
    * committed. The version layout is the cdcApply snapshot pattern
    * applied to the index lifecycle: a retrain builds v=N+1 COMPLETELY
    * while v=N keeps serving, and probe-time version resolution IS the
    * atomic swap (no in-place mutation of a serving index anywhere).
    *
    * Resolution reads the `_latest` manifest — ONE tiny commit object —
    * never the directory listing: a version directory is INVISIBLE
    * until the manifest names it, so a half-built v=N+1 (crash
    * mid-build) can never be resolved, and the protocol stays correct
    * on object stores where directory rename is copy+delete rather
    * than atomic (the r10 VERDICT gap). On S3/GCS the manifest commit
    * maps to one small-object PUT (atomic by store contract); on
    * HDFS/POSIX it is implemented as a tmp-file write + atomic
    * same-directory file rename ([[commitVersion]]). */
  def indexVersion(spark: org.apache.spark.sql.SparkSession,
      root: String): Long = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val p = new org.apache.hadoop.fs.Path(rootPath, "_latest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // version directories WITHOUT a manifest mean a lost/deleted
      // commit object (or a root from a foreign layout) — resolving 0
      // here would make the next publish build v=1 and DELETE the live
      // v=1 data (buildVersionDir clears its target). Refuse loudly:
      // silent data loss is never the right reading of a missing
      // manifest (self-review r11).
      val orphaned = fs.exists(rootPath) &&
        fs.listStatus(rootPath).exists(_.getPath.getName.startsWith("v="))
      require(!orphaned, s"index root $root has version directories but " +
        "no _latest manifest — the commit object was lost or this root " +
        "predates the manifest protocol; restore the manifest (a file " +
        "naming the newest complete version) instead of republishing")
      0L
    } else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Commit `v` as the newest version of `root`: write the `_latest`
    * manifest via a tmp file + ONE same-directory file rename — the
    * only mutation readers can observe, and the only step that needs
    * atomicity. Directory contents are immutable once referenced
    * (ingest layers append under fresh `ingest=b*` keys, never rewrite
    * referenced files), so every other write in the protocol is to
    * paths no reader resolves yet. On an object store this commit is
    * one conditional PUT of the manifest object; everything else is
    * already safe there. Single WRITER per root assumed (standard for
    * index maintenance) — the manifest protects readers from partial
    * builds; two concurrent builders would need the conditional-put /
    * lock the object store provides. */
  private[graft] def commitVersion(
      spark: org.apache.spark.sql.SparkSession, root: String,
      v: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s"._latest_tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val qual = fs.makeQualified(rootPath)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(qual.toUri, conf)
    fc.rename(new org.apache.hadoop.fs.Path(qual, "._latest_tmp"),
      new org.apache.hadoop.fs.Path(qual, "_latest"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Build (but do NOT commit) version `v`'s directory: centroids as
    * parquet plus the ingest-keyed list store. Deletes any partial
    * build left by a crashed prior attempt at the same version first —
    * [[writeVersionedIndex]] always builds at committed+1, so a crashed
    * attempt's orphan is always at the version the retry rebuilds.
    * Exposed for the IvfSpec crash-injection tests, which call this
    * WITHOUT [[commitVersion]] to prove an uncommitted build is
    * invisible to every reader. */
  private[graft] def buildVersionDir(corpus: DataFrame, k: Int,
      root: String, v: Long, iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
    val cents = localizeCentroids(train(corpus, k, iters, idCol, vecCol))
    graft.sources.Sinks.writeParquet(cents, s"$root/v=$v/centroids")
    writeIngestStore(corpus, cents, s"$root/v=$v/store", idCol, vecCol)
  }

  /** Train on `corpus` and publish a COMPLETE new index version under
    * `root/v=<committed+1>`: build the version directory
    * ([[buildVersionDir]] — invisible until committed, because
    * [[indexVersion]] resolves ONLY the `_latest` manifest), then
    * commit it with [[commitVersion]]'s one-object manifest write. A
    * crash anywhere before the commit leaves the old version serving
    * and a garbage directory the retry deletes and rebuilds — the
    * IvfSpec crash-injection tests drive exactly that schedule. Old
    * versions are kept for rollback until [[vacuumVersions]] retires
    * them. Returns the new version. Training is the bit-deterministic
    * [[train]], so the written index is a pure function of the corpus
    * CONTENT (row order and partitioning are irrelevant — the
    * ordered-fold guarantee), which is what lets q_ann_reindex retrain
    * from the store's own rows and still share q_ann_ivf's full twin. */
  def writeVersionedIndex(corpus: DataFrame, k: Int, root: String,
      iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val spark = corpus.sparkSession
    val v = indexVersion(spark, root) + 1
    buildVersionDir(corpus, k, root, v, iters, idCol, vecCol)
    commitVersion(spark, root, v)
    v
  }

  /** Retire old index versions: delete every committed version below
    * `newest - keepN + 1`, keeping the newest `keepN` as the rollback /
    * in-flight-prober horizon. NEVER touches versions at or above the
    * manifest's committed version other than those below the floor — in
    * particular an uncommitted build in progress (above committed) is
    * left alone, so vacuum is safe to run concurrently with a builder.
    * A prober that resolved `_latest` keeps its version directory for
    * at least keepN further publishes — the safety horizon: size keepN
    * to bound how stale an in-flight probe can be (probes re-resolve
    * per query, so keepN=2 already covers any single probe). Returns
    * the versions actually deleted, ascending. The other half of the
    * retention story falls out of the version axis: [[compactVersion]]
    * folds streamed ingest layers into the NEXT version, so the layered
    * store it superseded is retired wholesale when vacuum deletes its
    * version. */
  def vacuumVersions(spark: org.apache.spark.sql.SparkSession,
      root: String, keepN: Int): Seq[Long] = {
    require(keepN >= 1, s"vacuum must keep at least one version: $keepN")
    val committed = indexVersion(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val floor = committed - keepN + 1
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("v=")).map(_.drop(2).toLong)
        .filter(v => v <= committed && v < floor).sorted.toSeq
        .map { v =>
          fs.delete(new org.apache.hadoop.fs.Path(p, s"v=$v"), true); v
        }
    }
  }

  /** Fold the newest version's layered ingest store (`ingest=base` +
    * streamed `ingest=b*` keys) into a NEW version with a single base
    * layer and the SAME centroids — compaction as just another version
    * publish, riding [[commitVersion]]'s manifest protocol instead of
    * needing its own swap story (the r10 VERDICT ask). Rows are already
    * assigned, so the rewrite is [[compactIngestStore]]'s one read +
    * one range-clustered write (no centroid work); centroids round-trip
    * parquet bit-exactly (FLOAT columns), so probes of the compacted
    * version answer byte-identically to the layered one. Returns
    * (newVersion, filesBefore, filesAfter). The superseded layered
    * version is retired by [[vacuumVersions]], never in place. */
  def compactVersion(spark: org.apache.spark.sql.SparkSession,
      root: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): (Long, Int, Int) = {
    val v = indexVersion(spark, root)
    require(v > 0, s"no index version under $root")
    val next = v + 1
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$next"), true)
    graft.sources.Sinks.writeParquet(
      spark.read.parquet(s"$root/v=$v/centroids"),
      s"$root/v=$next/centroids")
    // the in-stream replay marker: the compacted base holds every
    // batch the source version already FOLDED (its marker) and every
    // batch-keyed LAYER this compaction absorbs — derived HERE from
    // the `ingest=b*` layer names rather than trusted to the caller,
    // so an external/nightly compaction racing a streaming
    // checkpoint's commit can never fold a layer whose batch later
    // replays undetected (self-review r11, second pass). Read before
    // the rewrite; written pre-commit so marker and version turn
    // visible together.
    val layerMax = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$root/v=$v/store"))
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("ingest=b") &&
          n.drop(8).nonEmpty && n.drop(8).forall(_.isDigit) =>
        n.drop(8).toLong } // "ingest=base" also starts with "ingest=b"
      .reduceOption(math.max(_, _))
    val carried = readFoldedThrough(spark, root, v)
    val (before, after) = compactIngestStore(spark,
      s"$root/v=$v/store", s"$root/v=$next/store", idCol, vecCol)
    (carried ++ layerMax).reduceOption(math.max(_, _))
      .foreach(b => writeFoldedThrough(spark, root, next, b))
    commitVersion(spark, root, next)
    (next, before, after)
  }

  /** The `_folded_through` replay marker of version `v` — the highest
    * streamed batchId whose rows live in this version's BASE (folded by
    * a retrain or a compaction) rather than under a replayable
    * `ingest=b*` key. ONE read/write pair for the protocol (used by
    * [[compactVersion]] and the streaming lifecycle) so the format can
    * never drift between sites. */
  private[graft] def readFoldedThrough(
      spark: org.apache.spark.sql.SparkSession, root: String,
      v: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/v=$v/_folded_through")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Write version `v`'s `_folded_through` marker (see
    * [[readFoldedThrough]]). Call BEFORE [[commitVersion]] — the
    * uncommitted directory keeps marker and version atomic together. */
  private[graft] def writeFoldedThrough(
      spark: org.apache.spark.sql.SparkSession, root: String, v: Long,
      batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/v=$v/_folded_through")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(batchId.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Number of `ingest=*` layers in version `v`'s store — the
    * compaction threshold statistic (a just-retrained/compacted store
    * is single-base and folding it is a no-op). */
  def ingestLayerCount(spark: org.apache.spark.sql.SparkSession,
      root: String, v: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$root/v=$v/store")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("ingest="))
  }

  /** Probe the NEWEST version of a versioned index root. */
  def ivfTopKFromVersioned(spark: org.apache.spark.sql.SparkSession,
      root: String, queries: DataFrame, k: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = indexVersion(spark, root)
    require(v > 0, s"no index version under $root")
    ivfTopKFromStore(s"$root/v=$v/store", queries,
      spark.read.parquet(s"$root/v=$v/centroids"), k, nprobe, idCol, vecCol)
  }

  /** The closed drift→retrain→swap loop: audit the newest version's
    * FROZEN centroids against the corpus NOW IN ITS STORE (resident +
    * every appended batch) — recall@k of the stored-index probe vs
    * exact brute force over the same rows — and, when mean recall falls
    * below `floor`, retrain on those rows and write v+1 (the swap).
    * Returns (servingVersion, measuredRecall): unchanged version on a
    * healthy audit, the new one after a retrain. Everything is
    * deterministic given the store content, and the retrained index is
    * [[writeVersionedIndex]]'s pure function of it. IvfSpec drives both
    * branches (healthy → version kept; a dimension-reversed appended
    * wave → retrain fires AND the new version's recall recovers);
    * ScaleStress's ann_drift_gate is the same audit at 30×/100×. */
  def reindexIfDrifted(spark: org.apache.spark.sql.SparkSession,
      root: String, queries: DataFrame, k: Int, nprobe: Int = 2,
      floor: Double = 0.8, kCents: Int = 8, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (Long, Double) =
    // ONE gate body: the full audit IS the samplePct=100 case (IvfSpec
    // asserts the equality) — two copies of the audit-compare-retrain
    // logic would drift (self-review r11)
    reindexIfDriftedSampled(spark, root, queries, k, nprobe, floor,
      samplePct = 100, kCents = kCents, iters = iters, idCol = idCol,
      vecCol = vecCol)

  /** Mean assignment CONFIDENCE of a vector batch against a frozen
    * centroid set: avg over rows of the max cosine to any centroid —
    * the quantization-confidence statistic an always-on ingest job can
    * afford on EVERY batch (one narrow pass, no shuffle, no ground
    * truth). An in-distribution batch scores near its family's
    * centroid (~1); a batch from a space the quantizer never saw (new
    * encoder, corrupted feed) scores ~0 against EVERY centroid — a
    * structural signal, independent of corpus density, where a
    * recall-based audit can legitimately stay green on duplicate-heavy
    * corpora (co-located copies ARE served fine by a stale index).
    * The two signals are complementary: confidence catches
    * out-of-space drift immediately and for free; the recall audit
    * ([[sampledAudit]]) catches in-space degradation on its cadence.
    * PRECONDITION: `idCol` uniquely identifies a batch row (the
    * large-k aggregate path groups by it — [[probeSelection]]'s rule). */
  def assignmentConfidence(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      useAggregate: Option[Boolean] = None): Double = {
    val cents = collectCentroids(centroids)
    require(cents.nonEmpty, "assignmentConfidence needs >= 1 centroid")
    // same switch as assignTo/probeSelection: past GreatestMaxK the
    // literal-array formulation is O(k·dim) GENERATED CODE (the JIT /
    // 64KB wall this file documents), which an every-batch signal at
    // the ~n/256 production cell count must not pay — score a
    // broadcast centroid TABLE instead (k driver-local rows)
    val row =
      if (!useAggregate.getOrElse(cents.length > GreatestMaxK)) {
        val maxCos = array_max(array(cents.map { case (_, cv) =>
          graft.functions.native.vec_cosine(col(vecCol), typedlit(cv))
        }.toSeq: _*))
        vectors.agg(avg(maxCos)).head()
      } else {
        val spark = vectors.sparkSession
        import spark.implicits._
        val centsDf = cents.toSeq.map { case (cid, v) => (cid.toLong, v) }
          .toDF("cent_id", "centroid")
        vectors.crossJoin(broadcast(centsDf))
          .groupBy(col(idCol))
          .agg(max(graft.functions.native.vec_cosine(
            col(vecCol), col("centroid"))).as("max_cos"))
          .agg(avg(col("max_cos"))).head()
      }
    require(!row.isNullAt(0),
      "assignmentConfidence needs a non-empty vector batch")
    row.getDouble(0)
  }

  /** The drift audit's measurement over a deterministic corpus SAMPLE:
    * recall@k of the frozen stored-centroid probe vs exact brute force,
    * BOTH restricted to the hash-selected `samplePct`% of the newest
    * version's store (the Profile.hashSplit idiom — selection is a pure
    * function of the id, so any engine, run, or replay draws the SAME
    * sample and the audit stays a hash-checkable contract). This bounds
    * the audit's dominant cost — exact brute force is O(|store|·|queries|)
    * — by samplePct, turning audit cost vs confidence into a tunable
    * knob: the full-store audit ([[reindexIfDrifted]]) is the
    * samplePct=100 special case, fine nightly; an always-on in-stream
    * cadence audits a slice. Returns one (query_id, n_hit, recall_at_k)
    * row per query. */
  def sampledAudit(spark: org.apache.spark.sql.SparkSession,
      root: String, queries: DataFrame, k: Int, nprobe: Int = 2,
      samplePct: Int = 100, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(samplePct >= 1 && samplePct <= 100,
      s"samplePct must be in [1, 100]: $samplePct")
    val v = indexVersion(spark, root)
    require(v > 0, s"no index version under $root")
    val corpus = spark.read.parquet(s"$root/v=$v/store")
      .select(col(idCol), col(vecCol))
    val sampleFilter =
      if (samplePct == 100) None
      else Some(graft.functions.Profile.hashBucket100(col(idCol)) < samplePct)
    val sampled = sampleFilter.foldLeft(corpus)(_.filter(_))
    val cents = spark.read.parquet(s"$root/v=$v/centroids")
    // exact ground truth must scan the whole sample by definition; the
    // approximate side keeps the stored layout's centroid_id partition
    // pruning (probed directories only) with the sample composed as a
    // row filter — the q_ann_ivf_pruned discipline (self-review r11)
    val exact = Ann.bruteForceTopK(sampled, queries, k, idCol, vecCol)
    val approx = ivfTopKFromStore(s"$root/v=$v/store", queries, cents,
      k, nprobe, idCol, vecCol, rowFilter = sampleFilter)
    Ann.recallAtK(exact, approx, queries, k)
  }

  /** [[reindexIfDrifted]] with the audit cost bounded by
    * [[sampledAudit]]'s deterministic corpus sample: measure mean
    * recall over the sample, and when it falls below `floor` retrain on
    * the store's FULL content (the repair must see everything even when
    * the audit reads a slice) and publish v+1. Same return contract as
    * the full-audit gate. */
  def reindexIfDriftedSampled(spark: org.apache.spark.sql.SparkSession,
      root: String, queries: DataFrame, k: Int, nprobe: Int = 2,
      floor: Double = 0.8, samplePct: Int = 10, kCents: Int = 8,
      iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): (Long, Double) = {
    val v = indexVersion(spark, root)
    val row = sampledAudit(spark, root, queries, k, nprobe, samplePct,
        idCol, vecCol)
      .agg(avg(col(s"recall_at_$k"))).head()
    require(!row.isNullAt(0),
      "reindexIfDriftedSampled needs a non-empty query sample: the " +
        "audit produced zero recall rows")
    val recall = row.getDouble(0)
    if (recall < floor) {
      val corpus = spark.read.parquet(s"$root/v=$v/store")
        .select(col(idCol), col(vecCol))
      (writeVersionedIndex(corpus, kCents, root, iters, idCol, vecCol),
        recall)
    } else (v, recall)
  }

  /** Retrain trigger over a [[recallDrift]] audit: the LAST stage (the
    * index's current state) must keep mean recall@k >= `floor`, else the
    * build refuses loudly and demands a coarse-quantizer retrain — the
    * same priced-refusal contract as [[knnGraphAuto]]'s pair budget, on
    * the time axis. Returns the measured mean so callers can log the
    * margin. Persist the audit frame before calling if you also return
    * it (this runs one bounded 2-row aggregate over it). */
  def requireFreshIndex(drift: DataFrame, k: Int, floor: Double): Double = {
    val rows = drift.groupBy(col("stage"))
      .agg(avg(col(s"recall_at_$k")).as("mean_recall"))
      .orderBy(col("stage").desc).limit(1).collect()
    // an empty audit frame (or an all-NULL recall column) must fail with
    // a clear message, not a NoSuchElementException/NPE deep in the
    // nightly gate — the same guard reindexIfDrifted carries (ADVICE r10)
    require(rows.nonEmpty && !rows.head.isNullAt(1),
      "requireFreshIndex needs a non-empty drift audit: the frame " +
        "produced zero recall rows (empty query sample?)")
    val row = rows.head
    val (last, mean) = (row.getInt(0), row.getDouble(1))
    if (mean < floor) throw new IllegalStateException(
      f"frozen-centroid index drifted: stage-$last mean recall@$k = " +
        f"$mean%.4f < floor $floor%.2f — the appended corpus has shifted " +
        "away from the trained coarse quantizer; retrain the centroids " +
        "and rebuild the base store")
    mean
  }
}
