package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored ANN candidate. Ordering is cosine DESC, then neighbor_id ASC
  * (the deterministic tie-break every ranking stage in graft.similarity
  * uses). */
case class Scored(cosine: Double, neighbor_id: Long)

/** Typed `Aggregator` computing the exact top-k of (cosine DESC,
  * neighbor_id ASC) — the scale-safe replacement for
  * `Window.partitionBy(query_id)` ranking: a window shuffles and sorts
  * EVERY scored candidate row into |queries| reducers (with few queries,
  * the whole corpus lands on a handful of tasks), while an Aggregator
  * plans partial+final like any built-in aggregate — each map task keeps a
  * k-bounded sorted buffer per query, and the shuffle carries at most
  * |partitions| × k rows per query, never the candidate set.
  *
  * Exactness: insertion keeps the buffer totally ordered and bounded at k;
  * merge folds one bounded buffer into another (both ≤ k, so O(k²) worst
  * case on driver-free reducer-side combine — k is user-small). The result
  * is identical to the window formulation, which q_ann_topk's DuckDB
  * oracle verifies hash-exactly. */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def beats(a: Scored, b: Scored): Boolean =
    a.cosine > b.cosine ||
      (a.cosine == b.cosine && a.neighbor_id < b.neighbor_id)

  private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.length >= k && !beats(a, buf.last)) buf
    else {
      val i = buf.indexWhere(b => beats(a, b))
      val grown = if (i < 0) buf :+ a else (buf.take(i) :+ a) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = insert(buf, a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    y.foldLeft(x)(insert)
  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
