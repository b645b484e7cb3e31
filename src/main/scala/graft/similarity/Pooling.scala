package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Embedding pooling: per-group mean vectors (class prototypes /
  * label centroids) — the building block behind prototype classifiers,
  * centroid-seeded clustering, and per-domain embedding drift tracking.
  *
  * Determinism is the whole design: double addition is not associative,
  * so a plain partial-buffer average would drift bit-wise with partition
  * layout. The fold here is the same secondary-sort ordered fold Ivf.train
  * uses — repartition by group, sort each partition by (group, id), sum
  * every dimension left-to-right in id order — which pins the prototype
  * bit-for-bit across runs, partitionings, and engines (the DuckDB twin
  * replays the identical ordered fold). Memory stays flat: one
  * (sums, count) accumulator per group per task, never the vectors. */
object Pooling {

  /** Mean vector per group: returns (group_id, mean_vec) with the mean
    * computed as float32(sum_double_in_id_order / n) per dimension. */
  def meanByGroup(df: DataFrame, groupCol: String, vecCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic width: max vector length across the input (a first()
    // would take dim from an arbitrary row, so ragged inputs would make
    // the output width depend on scan order). One cheap narrow agg pass.
    val dimRow = df.agg(max(size(col(vecCol)))).head()
    if (dimRow.isNullAt(0))
      return spark.emptyDataset[(Int, Array[Float])].toDF("group_id", "mean_vec")
    val dim = dimRow.getInt(0)
    df.select(col(groupCol).cast(IntegerType).as("g"),
        col(idCol).cast(LongType).as("vid"), col(vecCol).as("vec"))
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("vid"))
      .as[(Int, Long, Array[Float])]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[Int, (Array[Double], Array[Long])]
        it.foreach { case (g, _, v) =>
          val (sums, n) = acc.getOrElseUpdate(g,
            (new Array[Double](dim), new Array[Long](1)))
          var d = 0
          while (d < math.min(dim, v.length)) { sums(d) += v(d); d += 1 }
          n(0) += 1
        }
        acc.iterator.map { case (g, (sums, n)) =>
          (g, sums.map(sv => (sv / n(0)).toFloat))
        }
      }
      .toDF("group_id", "mean_vec")
  }
}
