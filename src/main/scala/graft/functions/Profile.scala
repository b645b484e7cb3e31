package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset utilities for training-data pipelines: column profiling and
  * deterministic splits. */
object Profile {

  /** Per-column profile: one output row per requested column with row
    * count, null count, exact distinct count, and min/max rendered as
    * strings. Computed as a single pass per column batched into one job
    * (a union of small aggregates — each is a partial+final hash agg, so
    * the scan dominates; at 100 TB profile the columns you need, not *). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val parts = cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast(StringType).as("min_value"),
        max(col(c)).cast(StringType).as("max_value"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Deterministic hash-based train/eval split on an integer id column —
    * the reproducible alternative to rand()-based sampling (stable across
    * runs, partitionings, and engines). Knuth multiplicative hashing in
    * plain 64-bit integer arithmetic so any engine computes the same
    * assignment. Returns the input plus a `split` column. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 80): DataFrame = {
    val bucket = pmod(pmod(col(idCol) * lit(2654435761L), lit(4294967296L)), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train").otherwise("eval"))
  }

  /** Deterministic stratified sampling: keep ~`pct`% of rows from EVERY
    * stratum by the same multiplicative id hash — unlike a global sample,
    * rare strata keep their proportional share rather than vanishing. A
    * pure narrow filter (no shuffle, no state), reproducible across runs,
    * partitionings, and engines — what `df.sample`/`TABLESAMPLE` cannot
    * promise. The stratum column participates only semantically (the
    * per-id hash is stratum-independent so joins of samples still align
    * on id). */
  def stratifiedSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    val bucket = pmod(pmod(col(idCol) * lit(2654435761L), lit(4294967296L)), lit(100L))
    df.filter(bucket < pct)
  }
}
