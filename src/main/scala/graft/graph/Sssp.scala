package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-hop single/multi-source cheapest paths (Bellman-Ford rounds)
  * over a weighted directed graph — the weighted completion of [[Bfs]]:
  * hop distance answers "how far", this answers "how cheap". Crawl-
  * pipeline use: link-cost-weighted seed distance (e.g. penalize
  * cross-host hops) for trust/priority priors.
  *
  * Algorithm: `maxHops` level-synchronous relax rounds. Round i joins the
  * current best-cost table to the edge list (equi-join on the node id —
  * hash-partitioned, never cartesian) and keeps the per-node min of the
  * old and relaxed costs; after k rounds the table holds EXACTLY
  * min-cost-over-paths-with-≤k-hops per reached node, which is what the
  * recursive-CTE oracle computes. With non-negative weights and
  * maxHops ≥ |V|−1 this is full SSSP; the cap bounds work and state the
  * same way BFS's does.
  *
  * Scale shape: per round one shuffle of (reached nodes × out-edges),
  * one min-aggregate; lineage cut per round with localCheckpoint like
  * Bfs/connectedComponents. */
object Sssp {

  /** Cheapest ≤`maxHops`-hop cost from `sources` (node_id rows, cost 0)
    * along weighted edges (src, dst, w). Returns (node_id, cost) for
    * every reached node. Deterministic for any weights; exact for
    * integer weights. */
  def cheapestPaths(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst"), col("w").cast(LongType))
      .persist(level)
    var best = sources.select(col("node_id")).distinct()
      .withColumn("cost", lit(0L)).persist(level)
    var i = 1
    while (i <= maxHops) {
      val relaxed = best.join(e, best("node_id") === e("src"))
        .select(col("dst").as("node_id"), (col("cost") + col("w")).as("cost"))
      val next = best.unionByName(relaxed)
        .groupBy("node_id").agg(min(col("cost")).as("cost"))
        .localCheckpoint(true) // cut lineage; materializes the round
      best.unpersist(blocking = false)
      best = next
      i += 1
    }
    e.unpersist(blocking = false)
    best
  }
}
