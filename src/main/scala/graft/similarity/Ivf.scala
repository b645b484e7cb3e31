package graft.similarity

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.native

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to hyperplane LSH (Ann.scala).
  *
  * Train: distributed Lloyd iterations entirely in DataFrame ops — assign
  * each vector to its nearest centroid (broadcast centroids, native
  * cosine), then recompute centroids as per-dimension means (posexplode →
  * groupBy(centroid, dim) avg → re-assemble ordered arrays). No collect of
  * the corpus; only the k centroid vectors ever sit on the driver, which is
  * exactly the part that is small by construction.
  *
  * Search: a query probes its `nprobe` nearest centroids and scores only
  * those inverted lists — corpus work per query drops from O(n) to
  * O(n * nprobe / k). At 100 TB the assigned corpus is written partitioned
  * by centroid_id so a probe reads only matching partitions (partition
  * pruning does the list lookup).
  */
object Ivf {

  /** Initial centroids: deterministic corpus sample (lowest ids). */
  private def initCentroids(corpus: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame =
    corpus.orderBy(col(idCol)).limit(k)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("centroid_id"),
        col(vecCol).as("centroid"))

  /** Assign each vector its nearest centroid by cosine. */
  def assign(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        native.vec_cosine(col(vecCol), col("centroid")).as("cos"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("cos").desc, col("centroid_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** Lloyd iterations; returns final centroids (centroid_id, centroid).
    * Centroid recomputation uses the typed VectorMean Aggregator
    * (graft.functions.VectorMean): partial (sum, count) buffers combine
    * map-side, so the shuffle carries one buffer per (centroid ×
    * partition) — not the assigned vectors. */
  def train(corpus: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val slim = corpus.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = initCentroids(slim, k, idCol, vecCol)
    val vecMean = new graft.functions.VectorMean(dim).toColumn
    for (_ <- 0 until iters) {
      val assigned = assign(slim, cents, idCol, vecCol)
      cents = assigned.select(col("centroid_id"), col(vecCol))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(vecMean.name("centroid"))
        .toDF("centroid_id", "centroid")
    }
    cents
  }

  /** Approximate top-k: probe the query's `nprobe` nearest centroids. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(corpus, centroids, idCol, vecCol)
    // each query → its nprobe closest centroid ids
    val qScored = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("query_vec"), col("centroid_id"),
        native.vec_cosine(col("query_vec"), col("centroid")).as("qcos"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("centroid_id").asc)
    val probes = qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("query_vec"), col("centroid_id"))
    // score only the probed lists
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(native.vec_cosine(col("query_vec"), col(vecCol)), 6).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"), col("cosine"))
  }
}
