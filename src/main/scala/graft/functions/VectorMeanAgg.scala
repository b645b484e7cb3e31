package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise mean of float vectors —
  * the Spark-native extensibility layer for custom aggregates
  * (SURVEY.md §7.3 "parity-plus": Aggregator[IN,BUF,OUT]). Used by IVF
  * k-means to recompute centroids: partial buffers combine associatively,
  * so Spark plans it partial+final like any built-in aggregate — shuffled
  * bytes are one (sum, count) buffer per (group × partition), never the
  * vectors themselves. */
case class VecMeanBuf(sums: Array[Double], n: Long)

class VectorMean(dim: Int) extends Aggregator[Array[Float], VecMeanBuf, Array[Float]] {
  override def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    var i = 0
    val m = math.min(dim, a.length)
    while (i < m) { b.sums(i) += a(i); i += 1 }
    VecMeanBuf(b.sums, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    VecMeanBuf(x.sums, x.n + y.n)
  }

  override def finish(b: VecMeanBuf): Array[Float] = {
    val out = new Array[Float](dim)
    if (b.n > 0) {
      var i = 0
      while (i < dim) { out(i) = (b.sums(i) / b.n).toFloat; i += 1 }
    }
    out
  }

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
