package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Time-series regularization: per-key calendar gap-fill plus linear
  * interpolation of the missing points — the feature-engineering step that
  * turns an irregular event log into the fixed-cadence series a model
  * consumes. The reference engine has no window or sequence machinery
  * (its expression surface ends at scalar binary ops), so this is a pure
  * extension of the event-pipeline side of the library.
  *
  * Scale shape: the spine is generated per key with `sequence()` off a
  * per-key min/max aggregate — one shuffle keyed on the series key, spine
  * length bounded by each key's own span (never a global cross join of
  * all keys x all days). The fill windows partition by the same key, so
  * the window pass rides the same hash partitioning, and no partition
  * serializes more than one key's span. Per-row interpolation arithmetic
  * is a fixed double expression tree — deterministic and engine-exact,
  * which is what lets a DuckDB oracle twin it bit-for-bit. */
object TimeSeries {

  /** Fill `obs` (one row per (key, day) observation, sparse) onto each
    * key's full daily calendar span and linearly interpolate `valueCol`
    * across gaps; leading/trailing gaps take the nearest observed value.
    * Returns (key, day, observed, value_filled) with one row per key-day.
    */
  def gapFillInterpolate(obs: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val spine = obs.groupBy(keyCol)
      .agg(min(col(dayCol)).as("d0"), max(col(dayCol)).as("d1"))
      .select(col(keyCol),
        explode(expr("sequence(d0, d1, interval 1 day)")).as(dayCol))
    val joined = spine.join(obs, Seq(keyCol, dayCol), "left")
    val back = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsDay = when(v.isNotNull, col(dayCol))
    val pv = last(v, ignoreNulls = true).over(back)
    val pd = last(obsDay, ignoreNulls = true).over(back)
    val nv = first(v, ignoreNulls = true).over(fwd)
    val nd = first(obsDay, ignoreNulls = true).over(fwd)
    val filled = when(v.isNotNull, v)
      .when(pv.isNull, nv)
      .when(nv.isNull, pv)
      .otherwise(pv + (nv - pv) *
        (datediff(col(dayCol), pd).cast(DoubleType) /
          datediff(nd, pd).cast(DoubleType)))
    joined.select(col(keyCol), col(dayCol),
      v.isNotNull.as("observed"), filled.as("value_filled"))
  }

  /** One-sided CUSUM drift detector over an integer series, entirely in
    * window algebra: the textbook recursion s_t = max(0, s_{t-1} + d_t)
    * (d = value − target) unrolls exactly to
    * s_t = cum_t − min(0, min_{j≤t} cum_j) — the running sum reflected
    * at its running minimum — so no recursion, no UDF, no
    * driver loop: two frames over one key-partitioned window, all in
    * longs. Flags rows where the statistic exceeds `threshold`
    * (sustained upward drift; transient spikes decay back through the
    * reflected minimum). Input: one row per (key, tick); output adds
    * (diff, cusum, drifted). The window partitions by the series key —
    * per-key ticks bounded by the calendar, never by data volume. */
  def cusum(series: DataFrame, keyCol: String, tickCol: String,
      valueCol: String, target: Long, threshold: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tickCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = (col("__cum") - least(col("__rmin"), lit(0L))).as("cusum")
    series.select(col(keyCol), col(tickCol),
        col(valueCol).cast(org.apache.spark.sql.types.LongType).as(valueCol),
        (col(valueCol).cast(org.apache.spark.sql.types.LongType) -
          lit(target)).as("diff"))
      .withColumn("__cum", sum(col("diff")).over(w))
      .withColumn("__rmin", min(col("__cum")).over(w))
      .select(col(keyCol), col(tickCol), col(valueCol), col("diff"),
        s,
        (col("__cum") - least(col("__rmin"), lit(0L)) > threshold)
          .as("drifted"))
  }
}
