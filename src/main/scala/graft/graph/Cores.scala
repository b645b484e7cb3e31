package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-round k-core peeling: repeatedly remove nodes whose degree in
  * the SURVIVING subgraph is below k. The fixpoint of this process is the
  * classic k-core (the maximal subgraph of minimum degree k — link-farm
  * cores and dense community hubs survive, pendant trees and chains peel
  * away); running a FIXED number of rounds peels all low-degree
  * structure within `rounds` hops of the periphery and is exactly
  * reproducible by an unrolled oracle (no data-dependent recursion), so
  * the contract query stays hash-checkable. Each round is one
  * map-side-combinable degree count plus two semi-joins — rounds are
  * driver-bounded, never data-dependent.
  *
  * Returns (node_id, deg) for nodes surviving `rounds` peels, with their
  * degree in the final surviving subgraph. */
object Cores {

  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    for (_ <- 1 to rounds) {
      val deg = und.select(col("a").as("v"))
        .union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("v")
      und = und
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
    }
    und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).cast(LongType).as("deg"))
      .filter(col("deg") >= k)
      .select(col("v").as("node_id"), col("deg"))
  }
}
