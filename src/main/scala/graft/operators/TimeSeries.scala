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
}
