package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) — the link-analysis
  * complement to PageRank: a good AUTHORITY is pointed at by good hubs,
  * a good HUB points at good authorities. In a crawl pipeline the hub
  * score flags directory/aggregator pages (high out-link quality) while
  * the authority score flags canonical content — a different signal from
  * PageRank's single stationary rank. The reference engine has no graph
  * surface at all, so this is a pure extension.
  *
  * This runs the UNNORMALIZED power iteration with unit initialization:
  * after k rounds the scores are exact path-count integers (authority_k
  * = number of length-(2k-1) alternating paths ending at the node), so
  * every arithmetic step is associative long addition — plain `sum()`
  * partial aggregation is bit-deterministic under any partitioning, and
  * a SQL oracle can replay the whole run without the ordered-fold
  * machinery PageRank's doubles need. Relative ranking equals normalized
  * HITS (normalization only rescales); production variants add a
  * per-round L2 normalize and accept float wobble.
  *
  * Scale shape: per round, two equi-join + grouped-sum shuffles (edges ×
  * scores on src, then on dst) and a left join back to the node list —
  * shuffled bytes ∝ |edges|, state ∝ |nodes|; same loop discipline as
  * PageRank.iterate. Keep `iters` small (scores grow geometrically with
  * the principal eigenvalue; 64-bit overflow bounds k, e.g. ~15 rounds
  * on a degree-9 web graph). */
object Hits {

  /** `iters` full HITS rounds over directed edges (src, dst). Returns
    * (node_id, authority, hub) as exact longs; nodes outside every edge
    * keep their unit scores. */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"HITS needs iters >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"))
    var hub = nodes.select(col("node_id"), lit(1L).as("hub"))
    var auth = nodes.select(col("node_id"), lit(1L).as("authority"))
    for (_ <- 1 to iters) {
      // authority(v) = sum of hub over in-neighbors u -> v
      val aIn = e.join(hub, e("src") === hub("node_id"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("a"))
      auth = nodes.join(aIn, nodes("node_id") === aIn("dst"), "left")
        .select(nodes("node_id"), coalesce(col("a"), lit(0L)).as("authority"))
      // hub(v) = sum of the NEW authority over out-neighbors v -> w
      val hOut = e.join(auth, e("dst") === auth("node_id"))
        .groupBy(col("src")).agg(sum(col("authority")).as("h"))
      hub = nodes.join(hOut, nodes("node_id") === hOut("src"), "left")
        .select(nodes("node_id"), coalesce(col("h"), lit(0L)).as("hub"))
    }
    auth.join(hub, "node_id")
  }
}
