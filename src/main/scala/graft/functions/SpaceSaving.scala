package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-item estimate of a SpaceSaving counter: `est` is an overestimate
  * of the item's true count and `err` bounds the overshoot, so
  * est - err <= true <= est always holds. */
case class SSVal(est: Long, err: Long)

/** SpaceSaving heavy hitters (Metwally et al. 2005) as a typed, MERGEABLE
  * Spark Aggregator — the approximate frequent-items sketch for streams
  * too large to count exactly: k counters regardless of cardinality, and
  * any item with true count > n/k is guaranteed tracked.
  *
  * Mergeability (Agarwal et al., "Mergeable Summaries", PODS 2012) is
  * what makes it a partial+final aggregate: merging treats an item absent
  * from a SATURATED summary as having that summary's minimum counter
  * value (a pure overestimate, charged to `err`); a summary still under k
  * counters tracked its partition exactly, so absence there contributes
  * zero. After the union the k largest estimates are kept. Both
  * invariants — est >= true and est - err <= true — survive any merge
  * order/partitioning, which is exactly what the oracle-checked
  * `within_bound` flags of q_heavy_hitters assert.
  *
  * Scale shape: state is O(k) per partial regardless of input size;
  * shuffled bytes per group = k counters, not the token stream. */
class SpaceSaving(k: Int)
    extends Aggregator[String, Map[String, SSVal], Map[String, SSVal]] {
  require(k > 0, s"SpaceSaving needs k > 0, got $k")

  override def zero: Map[String, SSVal] = Map.empty

  override def reduce(buf: Map[String, SSVal], item: String): Map[String, SSVal] =
    buf.get(item) match {
      case Some(v) => buf.updated(item, v.copy(est = v.est + 1))
      case None if buf.size < k => buf.updated(item, SSVal(1L, 0L))
      case None =>
        // evict the minimum-estimate counter (deterministic tie-break on
        // the item string) and inherit its estimate as the new error
        val (mItem, mVal) = buf.minBy { case (i, v) => (v.est, i) }
        (buf - mItem).updated(item, SSVal(mVal.est + 1, mVal.est))
    }

  override def merge(a: Map[String, SSVal], b: Map[String, SSVal]): Map[String, SSVal] = {
    // an unsaturated summary saw its whole partition: absence means 0
    val minA = if (a.size < k) 0L else a.valuesIterator.map(_.est).min
    val minB = if (b.size < k) 0L else b.valuesIterator.map(_.est).min
    val union = (a.keySet ++ b.keySet).iterator.map { item =>
      val va = a.getOrElse(item, SSVal(minA, minA))
      val vb = b.getOrElse(item, SSVal(minB, minB))
      item -> SSVal(va.est + vb.est, va.err + vb.err)
    }.toSeq
    union.sortBy { case (i, v) => (-v.est, i) }.take(k).toMap
  }

  override def finish(b: Map[String, SSVal]): Map[String, SSVal] = b

  override def bufferEncoder: Encoder[Map[String, SSVal]] =
    ExpressionEncoder[Map[String, SSVal]]()
  override def outputEncoder: Encoder[Map[String, SSVal]] =
    ExpressionEncoder[Map[String, SSVal]]()
}

object SpaceSavingOps {

  /** One SpaceSaving summary over `itemCol` as a 1-row (map) frame. */
  def sketch(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val ss = udaf(new SpaceSaving(k), Encoders.STRING)
    items.agg(ss(col(itemCol)).as("sk"))
  }

  /** The q_approx_* contract pattern for frequency sketches: emit the
    * EXACT top-n items (deterministic — computed by an exact count
    * aggregate) plus a `within_bound` flag asserting the sketch's
    * guarantee est - err <= true <= est for each. The flags are
    * deterministically TRUE for any merge order — that is the
    * SpaceSaving invariant — so a DuckDB twin hash-checks the sketch's
    * correctness without having to reproduce its internal state. */
  def heavyHittersChecked(items: DataFrame, itemCol: String, k: Int,
      topn: Int): DataFrame = {
    val exact = items.groupBy(col(itemCol))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(itemCol).asc).limit(topn)
    val est = element_at(col("sk"), col(itemCol))
    exact.crossJoin(broadcast(sketch(items, itemCol, k)))
      .select(col(itemCol), col("n_exact"),
        coalesce(
          est.getField("est") >= col("n_exact") &&
          est.getField("est") - est.getField("err") <= col("n_exact"),
          lit(false)).as("within_bound"))
      .orderBy(col("n_exact").desc, col(itemCol).asc)
  }
}
