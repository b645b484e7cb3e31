package graft.graph

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling: repeatedly remove nodes whose degree in
  * the SURVIVING subgraph is below k. The fixpoint of this process is the
  * classic k-core (the maximal subgraph of minimum degree k — link-farm
  * cores and dense community hubs survive, pendant trees and chains peel
  * away); running a FIXED number of rounds peels all low-degree
  * structure within `rounds` hops of the periphery and is exactly
  * reproducible by an unrolled oracle (no data-dependent recursion), so
  * the contract query stays hash-checkable.
  *
  * The loop body is RDD, not DataFrame — the same escape hatch as
  * connected components (SCALE.md "iterative graph loops"): a DataFrame
  * loop references the surviving edge set ~4 times per round (two degree
  * legs + two semi-joins), so the unrolled logical tree replicates the
  * upstream edge build 4^rounds times and analysis/codegen dominates
  * (measured 9.6 s steady-state for 3 rounds over a ~100k-edge graph;
  * the RDD loop with one pinned HashPartitioner runs the same peels in
  * ~1 s: every reduceByKey/join after the first shuffles nothing).
  * DataFrames in and out; RDDs only inside the loop.
  *
  * Returns (node_id, deg) for nodes surviving `rounds` peels, with their
  * degree in the final surviving subgraph. */
object Cores {

  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val part = new HashPartitioner(parts)
    // canonical undirected edges keyed by the lower endpoint
    var cur = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .as[(Long, Long)].rdd
      .partitionBy(part)
    for (_ <- 1 to rounds) {
      val keep = cur
        .flatMap { case (a, b) => Iterator((a, 1L), (b, 1L)) }
        .reduceByKey(part, _ + _)
        .filter(_._2 >= k)
        .mapValues(_ => ())
      cur = cur.join(keep)                       // survive on the a side
        .map { case (a, (b, _)) => (b, a) }
        .partitionBy(part)
        .join(keep)                              // survive on the b side
        .map { case (b, (a, _)) => (a, b) }
        .partitionBy(part)
    }
    cur.flatMap { case (a, b) => Iterator((a, 1L), (b, 1L)) }
      .reduceByKey(part, _ + _)
      .filter(_._2 >= k)
      .toDF("node_id", "deg")
  }
}
