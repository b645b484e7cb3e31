package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative-edge sampling for link-prediction training
  * data: propose affine-generated candidate pairs per node and anti-join
  * away anything that IS an edge (in either direction). The standard
  * contrastive recipe samples non-edges with an RNG, which is
  * irreproducible across runs and engines; affine proposals
  * (src·m_c + o_c mod n) give the same per-node negative set on every
  * run, every partitioning, and every engine — the property that lets a
  * training set be rebuilt bit-identically from the graph snapshot.
  * (Affine proposals are uniform over nodes for any fixed src when n is
  * coprime to none of the multipliers' structure — good enough for
  * negatives, which only need to be arbitrary non-edges, not i.i.d.)
  *
  * Scale shape: proposals are a narrow per-row map (|nodes|·k rows); the
  * anti-join hashes on the canonical (src, dst) pair — one shuffle, no
  * cartesian, and the edge side carries only the two id columns. */
object Negatives {

  /** `nodes(node_id)`, `edges(src, dst)` (direction ignored), `nNodes` =
    * the id-space modulus (ids assumed 0..n-1), `proposals` = candidate
    * generators per node. Returns (src, dst) non-edges, self-loops
    * excluded, deduplicated. */
  def sample(nodes: DataFrame, edges: DataFrame, nNodes: Long,
      proposals: Int = 3): DataFrame = {
    require(proposals >= 1 && nNodes > 0)
    val props = (0 until proposals).map { c =>
      nodes.select(col("node_id").as("src"),
        ((col("node_id") * (11 + 2 * c) + (5 + c)) % nNodes).as("dst"))
    }.reduce(_ unionByName _)
      .filter(col("src") =!= col("dst"))
      .distinct()
    val undirected = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    props.join(undirected, Seq("src", "dst"), "left_anti")
  }
}
