package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Triangle counting over an undirected link graph — the clustering /
  * link-farm signal a crawl pipeline uses next to PageRank (dense local
  * triangle counts flag mutually-linking spam clusters; near-zero counts
  * flag isolated auto-generated pages). The reference engine has no graph
  * operators at all (its storage story ends at
  * src/io/reader/listing/table.rs), so this is a pure extension.
  *
  * Algorithm: the degree-ordered adjacency-array iterator (Schank & Wagner
  * 2005 orientation; Latapy 2008 "compact-forward" pair generation). Each
  * undirected edge is oriented from its lower-(degree, id) endpoint to the
  * higher one, which makes the oriented out-degree of every node O(sqrt(m))
  * on any graph; wedges are then generated LOCALLY from each apex's
  * collected out-neighbor array (≤ O(sqrt(m)) entries, so the array and its
  * pair explosion are bounded per node) and closed with ONE probe join
  * against the oriented edge set. Versus a wedge self-join this references
  * the oriented frame twice, not three times — on an unpersisted lineage
  * every reference re-expands the whole upstream plan, so reference count
  * IS plan width.
  *
  * Scale shape: two equi-join shuffles keyed on node ids (AQE picks
  * SMJ/broadcast by size), no cartesian, no driver-side collection; the
  * orientation trick is exactly what bounds per-key fan-out (and the
  * adjacency arrays), so the plan survives hub nodes that would explode an
  * unoriented self-join. */
object Triangles {

  /** Canonical undirected edge set: (lo, hi) pairs, self-loops dropped. */
  private def undirected(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .filter(col("a") =!= col("b"))
    .distinct()

  /** Undirected degree per node, one pass: explode both endpoints (a
    * union would re-expand the unpersisted `und` lineage twice). */
  private def degrees(und: DataFrame): DataFrame =
    und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** (deg, id)-oriented edges (u → w, deg(u) ≤ deg(w)) carrying the
    * endpoint degrees. Attaches degrees with ONE join: endpoints are
    * exploded next to their edge, matched against `deg` once, and folded
    * back per edge — a second join against `deg` would re-expand its
    * whole lineage. */
  private def oriented(und: DataFrame, deg: DataFrame): DataFrame =
    und
      .select(col("a"), col("b"), explode(array(col("a"), col("b"))).as("v"))
      .join(deg, "v")
      .groupBy(col("a"), col("b"))
      .agg(max(when(col("v") === col("a"), col("deg"))).as("dega"),
        max(when(col("v") === col("b"), col("deg"))).as("degb"))
      .select(
        when(col("dega") < col("degb") ||
            (col("dega") === col("degb") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi"),
            col("degb").as("deghi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi"),
            col("dega").as("deghi"))).as("e"))
      .select(col("e.lo").as("u"), col("e.hi").as("w"),
        col("e.deghi").as("degw"))

  /** Triangles (u, v1, v2) with u the unique (deg, id)-minimal apex. */
  private def triangles(und: DataFrame, deg: DataFrame): DataFrame = {
    val o = oriented(und, deg)
    // adjacency arrays: each apex's out-neighbors with their degrees —
    // O(sqrt(m)) entries by the orientation bound, so collect_list is
    // task-memory-safe on any graph
    val adj = o.groupBy(col("u"))
      .agg(collect_list(struct(col("w"), col("degw"))).as("nbrs"))
    // unordered out-neighbor pairs, emitted directly in the (deg, id)
    // storage orientation so ONE probe of the oriented edge set closes
    // the wedge (each triangle matches exactly once, at its unique
    // apex). TWO explode steps, not one flatten: posexplode pins each
    // pivot x to its own row first, so no single value ever holds more
    // than one O(sqrt(m)) neighbor slice — a one-shot
    // flatten(transform²) would materialize all O(out-deg²) pairs of an
    // apex (O(m) structs on a clique-heavy graph) inside ONE unspillable
    // in-row array before the explode could split it.
    val wedges = adj
      .select(col("u"), col("nbrs"),
        posexplode(col("nbrs")).as(Seq("i", "x")))
      .select(col("u"), explode(expr(
        "transform(slice(nbrs, i + 2, size(nbrs)), y -> " +
          "case when x.degw < y.degw or " +
          "(x.degw = y.degw and x.w < y.w) " +
          "then struct(x.w as v1, y.w as v2) " +
          "else struct(y.w as v1, x.w as v2) end)")).as("p"))
      .select(col("u"), col("p.v1"), col("p.v2"))
    val closing = o.select(col("u").as("v1"), col("w").as("v2"))
    wedges.join(closing, Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
  }

  /** Per-node triangle counts from a directed edge list (self-loops and
    * duplicate/reverse edges tolerated: edges are undirected-deduped
    * first). Returns (node_id, n_tri) for nodes in >= 1 triangle; each
    * triangle {u,v,w} credits all three corners. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = undirected(edges)
    perNodeFrom(und, degrees(und))
  }

  private def perNodeFrom(und: DataFrame, deg: DataFrame): DataFrame =
    triangles(und, deg)
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).cast(LongType).as("n_tri"))

  /** Local clustering coefficient per node: 2·tri(v) / (deg(v)·(deg(v)−1))
    * — the fraction of a node's neighbor pairs that are themselves linked.
    * Near-1 flags cliques (mutually-linking spam farms); near-0 on a
    * high-degree node flags hub-and-spoke autogenerated link structure —
    * the per-node normalization that makes raw triangle counts comparable
    * across degrees. Every node appears (degree-0 nodes excluded: they
    * have no edges, hence no row in the edge list); triangle-less nodes
    * report 0. Counts and degrees stay exact longs; the coefficient is a
    * single per-row quotient. Same two-shuffle scale shape as `perNode`
    * plus one left join on node id. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = undirected(edges)
    val deg = degrees(und)
    val tri = perNodeFrom(und, deg)
    deg.join(tri, deg("v") === tri("node_id"), "left")
      .select(deg("v").as("node_id"), col("deg").cast(LongType).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          (lit(2.0) * coalesce(col("n_tri"), lit(0L))
            .cast(org.apache.spark.sql.types.DoubleType)) /
            (col("deg") * (col("deg") - 1))
              .cast(org.apache.spark.sql.types.DoubleType))
          .otherwise(0.0).as("coef"))
  }
}
