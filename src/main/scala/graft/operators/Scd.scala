package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change log into a versioned
  * history table (one row per version, `valid_from`/`valid_to` range,
  * open `valid_to IS NULL` row = current), and apply a fresh batch of
  * changes to an existing history incrementally. This is the lineage/
  * provenance layer of a training-data warehouse — "what did this user
  * profile / document record look like when shard X was written" — and
  * sits beside the latest-wins upsert (`q_upsert`) and the streaming CDC
  * chain (`q_cdc_stream`). The reference engine has no mutation or
  * versioning story at all (scan-only listing tables,
  * src/io/reader/listing/table.rs).
  *
  * Scale shape: `buildHistory` is one window pass hash-partitioned on the
  * dimension key. `applyChanges` never re-windows the closed history —
  * closed rows (the vast majority of a mature dimension at 100 TB) pass
  * through untouched; only the open rows of keys present in the delta
  * plus the delta itself enter the window, so the incremental cost is
  * O(|delta| + |keys touched|), not O(|history|). */
object Scd {

  /** Build a full SCD2 history from a change log. `changes` columns:
    * key, ts, attributes. Each change opens a version at its `ts` and
    * closes at the key's next change (`lead`), ties broken by `tieCol`
    * for a total order. */
  def buildHistory(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    changes.select(
      (col(keyCol) +: attrCols.map(col)) :+
        col(tsCol).as("valid_from") :+ col(tieCol).as("change_id"): _*)
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keyCol).orderBy(col("valid_from"), col("change_id"))))
  }

  /** Apply a delta change batch to an existing SCD2 history: closed rows
    * pass through; open rows of touched keys are closed at the delta's
    * first change for that key; delta rows chain among themselves. The
    * result equals `buildHistory` over the concatenated change log
    * whenever every delta ts is >= the open row's valid_from. */
  def applyChanges(history: DataFrame, delta: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, attrCols: Seq[String]): DataFrame = {
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull).drop("valid_to")
    val deltaRows = delta.select(
      (col(keyCol) +: attrCols.map(col)) :+
        col(tsCol).as("valid_from") :+ col(tieCol).as("change_id"): _*)
    val rewindowed = open.unionByName(deltaRows)
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keyCol).orderBy(col("valid_from"), col("change_id"))))
    closed.unionByName(rewindowed)
  }

  /** Temporal dimension lookup: join each fact to the SCD2 history row
    * that was valid AT FACT TIME — `valid_from <= fact_ts < valid_to`
    * (open row: `valid_to IS NULL`) — the "what did this record look
    * like when the shard was written" query that makes SCD2 history
    * worth keeping. Each fact matches at most one version row by
    * construction (intervals per key partition the timeline; zero-width
    * intervals from same-ts changes can match nothing).
    *
    * Scale shape: an equi-join on the dimension key with the interval
    * predicate as the join residual — per-key history is bounded by that
    * key's change count, so the residual scan after the hash/SMJ match
    * is per-key-small; no range explosion, no cartesian. */
  def lookupAsOf(history: DataFrame, facts: DataFrame, keyCol: String,
      factTsCol: String): DataFrame = {
    val h = history.withColumnRenamed(keyCol, "__hk")
    facts.join(h,
      facts(keyCol) === h("__hk") &&
        h("valid_from") <= facts(factTsCol) &&
        (h("valid_to").isNull || facts(factTsCol) < h("valid_to")),
      "left").drop("__hk")
  }
}
