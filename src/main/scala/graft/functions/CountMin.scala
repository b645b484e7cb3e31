package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) built PURELY
  * relationally: the d×w counter matrix is a grouped count (partial+final
  * aggregation, map-side combined), and point estimates are an equi-join
  * against it — no UDAF, no driver state, every stage a standard shuffle.
  * At 100 TB the sketch table is d·w rows regardless of input size, so it
  * broadcasts to any probe join.
  *
  * Hashing: each of the d rows uses the same width-safe two-limb Knuth
  * hash every sampler here uses ([[Profile.hash32]]), re-keyed per row by
  * hashing `hash32(key) + row` — the outer argument stays < 2^32 + d, so
  * no intermediate overflows 64-bit arithmetic in ANY engine (the naive
  * `key * prime_j` overflows for keys ≳ 3.5e9; see Profile.hash32's note).
  * Fully deterministic, so a DuckDB twin reproduces estimates bit-exactly.
  *
  * Guarantee preserved by construction: est(k) = min_j counts[j][h_j(k)]
  * ≥ true(k) always (each counter sums a superset of k's rows); the
  * `ge_true` output of [[estimate]] asserts it per key in-query.
  */
object CountMin {

  /** Bucket of `key` in sketch row `row` (0-based), width `w`. */
  def bucket(key: Column, row: Int, w: Int): Column =
    pmod(Profile.hash32(Profile.hash32(key) + lit(row.toLong)), lit(w.toLong))

  /** Build the sketch: one row per (row, bucket) with the summed count.
    * The d-way replication happens AFTER the per-partition pre-aggregation
    * a grouped count already gets from Spark (explode of a d-literal
    * array), so shuffle volume is ≤ d·w per map task, not d·|input|. */
  def build(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    val rows = explode(array((0 until d).map(lit): _*)).as("cm_row")
    df.select(key.as("__k")).select(col("__k"), rows)
      .groupBy(col("cm_row"),
        pmod(Profile.hash32(Profile.hash32(col("__k")) + col("cm_row")),
          lit(w.toLong)).as("cm_bucket"))
      .agg(count(lit(1)).as("cm_count"))
  }

  /** Point-estimate every key in `probes(keyCol)` against a built sketch:
    * est = min over the d rows of the joined counters. `sketch` is d·w
    * rows → broadcast join. Returns (keyCol, est). */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val lookups = probes.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until d).map(lit): _*)).as("cm_row"))
      .withColumn("cm_bucket",
        pmod(Profile.hash32(Profile.hash32(col(keyCol)) + col("cm_row")),
          lit(w.toLong)))
    lookups.join(broadcast(sketch), Seq("cm_row", "cm_bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cm_count")).cast(LongType).as("est"))
  }
}
