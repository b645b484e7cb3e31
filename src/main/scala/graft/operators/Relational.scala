package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 8-node relational algebra (ref: src/plan/logical/plan.rs:12-44)
  * expressed through the public Spark API. Each helper documents the mapping;
  * most are one-liners on purpose — the value is the declared *plan*, which
  * Catalyst then optimizes (pushdown, pruning, join strategy, AQE) far beyond
  * the reference's 3-rule optimizer (SURVEY.md §4.1).
  */
object Relational {

  /** Monotonic suffix source for binnedRangeJoin's working column. */
  private val binSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** L2 Projection (ref: src/plan/logical/projection.rs:12-40). */
  def project(df: DataFrame, cols: Seq[Column]): DataFrame = df.select(cols: _*)

  /** L3 Filter (ref: src/plan/logical/filter.rs:15-43). Type coercion of the
    * predicate is Catalyst's ImplicitTypeCasts — the analog of the
    * reference's eager `Signature` coercion (ref: src/expression/coercion.rs). */
  def filter(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)

  /** L6 Limit with skip+fetch (ref: src/plan/logical/limit.rs:11-25).
    * `fetch = None` means "all remaining rows" — the *intended* semantics of
    * the reference's logical node, not the physical fetch-None-emits-nothing
    * quirk (ref: src/plan/physical/limit.rs:87,135-137; SURVEY.md §7.4 says
    * do not replicate that bug). */
  def limit(df: DataFrame, skip: Int, fetch: Option[Int]): DataFrame = {
    val skipped = if (skip > 0) df.offset(skip) else df
    fetch.map(skipped.limit).getOrElse(skipped)
  }

  /** L8 Distinct (ref: src/plan/logical/distinct.rs:8-16). The reference's
    * optimizer rewrites this to group-by-all-columns
    * (ref: src/optimize/rules/rewrite_distinct.rs:19-112); Spark's
    * ReplaceDistinctWithAggregate does the identical rewrite, then executes
    * it as a partial+final hash aggregate — i.e. map-side combine before the
    * shuffle, which is what makes it viable at 100 TB. */
  def distinct(df: DataFrame): DataFrame = df.distinct()

  /** L7 Join (ref: src/plan/logical/join.rs:13-71). Mirrors the reference
    * signature: equi-key pairs + optional non-equi residual filter, with the
    * planner's only strategy rule — empty `on` routes to the nested-loop
    * (cross+filter) path (ref: src/plan/planner.rs:186-194) — folded in.
    * Spark resolves the strategy instead: broadcast-hash for a small side,
    * sort-merge/shuffled-hash otherwise, and AQE can re-pick at runtime.
    *
    * Unlike the reference (columns resolved by name only, duplicate output
    * names allowed — ref: src/expression/logical/column.rs:12-15), Spark
    * requires unambiguous references, so keys are given as left/right name
    * pairs and resolved against each side explicitly.
    */
  def join(left: DataFrame, right: DataFrame,
      on: Seq[(String, String)],
      joinType: String = "inner",
      residual: Option[Column] = None): DataFrame = {
    if (on.isEmpty) {
      // NestedLoopJoin path: cross product + optional theta filter
      // (ref: src/plan/physical/joins/nested_loop_join.rs:89-460).
      residual match {
        case Some(cond) => left.join(right, cond, joinType)
        case None       => left.crossJoin(right)
      }
    } else {
      val keys = on.map { case (l, r) => left.col(l) === right.col(r) }
      val cond = residual.foldLeft(keys.reduce(_ && _))(_ && _)
      left.join(right, cond, joinType)
    }
  }

  /** Top-k: sort + limit fused. The reference lacks this fusion (SURVEY.md
    * §2.5 "no top-k"); Spark plans it as TakeOrderedAndProject — each
    * partition keeps only k rows, so no global sort shuffle at scale. */
  def topK(df: DataFrame, k: Int, keys: Seq[Column]): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** Range (interval-bucket) join: each fact row matches the bucket rows
    * whose [lo, hi) interval contains `value`. The bucket side is
    * broadcast — binning dimensions are tiny by construction, so this plans
    * as a BroadcastNestedLoopJoin: the 100-TB fact side streams through a
    * narrow map with zero shuffle. (A non-broadcast range join would be a
    * cross product — never the right plan for binning.) */
  def rangeJoin(fact: DataFrame, buckets: DataFrame, value: Column,
      lo: Column, hi: Column): DataFrame =
    fact.join(broadcast(buckets), value >= lo && value < hi)

  /** Binned range join — the large×large scale path [[rangeJoin]]'s
    * broadcast nested loop cannot take. Both sides map to fixed-width
    * bins: a point lands in exactly ONE bin, an interval in every bin it
    * overlaps (hi clamped to `maxValue` so an open-ended interval doesn't
    * explode into unbounded bins — precondition: maxValue ≥ every fact
    * value). The join is then an EQUI-join on bin id + the residual range
    * predicate: hash-partitionable, AQE-skew-splittable, never a nested
    * loop. Each matching (point, interval) pair meets in exactly one bin
    * (the point's), so the result equals rangeJoin's with no dedup pass —
    * which is how q_range_join_binned shares q_range_join's oracle.
    * Choose binWidth near the median interval width: interval copies ≈
    * width/binWidth + 1. */
  def binnedRangeJoin(fact: DataFrame, intervals: DataFrame, value: Column,
      lo: Column, hi: Column, binWidth: Double, maxValue: Double): DataFrame = {
    // working column gets a unique suffix so a user column named "__bin"
    // on either input survives; the sequence start is clamped to the end
    // so a degenerate interval (lo > maxValue) yields ONE bin instead of
    // a descending-sequence row blow-up (the residual range predicate
    // still removes any false pair)
    val bin = "__bin_" + Relational.binSeq.getAndIncrement()
    val hiBin = floor(least(hi, lit(maxValue)) / binWidth)
    val loBin = floor(lo / binWidth)
    val fb = fact.withColumn(bin, floor(value / binWidth))
    val ib = intervals.withColumn(bin,
      explode(sequence(least(loBin, hiBin), hiBin)))
    fb.join(ib, Seq(bin))
      .filter(value >= lo && value < hi)
      .drop(bin)
  }

  /** As-of join: for each left row, attach the single right row with the
    * greatest `rightTime` <= `leftTime` (direction "backward", default) or
    * the least `rightTime` >= `leftTime` (direction "forward") within the
    * same `partKey`. Spark has no native as-of join; the scalable
    * formulation is the union + running-last trick (the same shape
    * Flink/kdb use), NOT a range cross-join:
    *
    *   1. union left and right rows, tagged, into one stream;
    *   2. one window per key, ordered by (time, right-before-left) —
    *      time descending for the forward direction;
    *   3. running `last(right_payload, ignoreNulls)` carries the nearest
    *      right row to each left row.
    *
    * Cost: one shuffle on the key + one sort per partition — O(n log n)
    * versus the O(n*m) per-key cross join a naive range predicate plans.
    * Right rows with equal time sort before left rows (inclusive match).
    *
    * Output: all left columns + the named right payload columns
    * (null when no right row precedes/follows the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      partKey: String, leftTime: String, rightTime: String,
      rightPayload: Seq[String], direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(direction == "backward" || direction == "forward",
      s"unknown as-of direction: $direction")
    val payload = struct(rightPayload.map(right(_)): _*)
    val rTagged = right.select(right(partKey).as("_k"),
      right(rightTime).as("_t"), lit(0).as("_side"), payload.as("_r"))
    val leftCols = left.columns
    val lTagged = left.select(col(partKey).as("_k") +: col(leftTime).as("_t") +:
      lit(1).as("_side") +: lit(null).cast(rTagged.schema("_r").dataType).as("_r") +:
      leftCols.map(c => left(c).as(s"_l_$c")): _*)
    val rCols = Seq(col("_k"), col("_t"), col("_side"), col("_r")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))
    val unioned = rTagged.select(rCols: _*).unionByName(lTagged)
    // right rows (side=0) sort before left rows (side=1) at equal time →
    // a right row AT the left row's time is matched (inclusive as-of).
    // Among right rows tied on time, a hash of the payload is the final
    // sort key so the carried row is deterministic under any partitioning
    // (left rows have a null hash; _side already orders them after).
    val tOrd = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy("_k")
      .orderBy(tOrd, col("_side").asc,
        xxhash64(col("_r")).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select(leftCols.map(c => col(s"_l_$c").as(c)) ++
      rightPayload.map(p => col("_m").getField(p).as(p)): _*)
  }

  /** CDC upsert (MERGE): apply a change stream to a snapshot — the core of
    * every incremental 100-TB pipeline (Delta/Iceberg MERGE INTO, Hudi
    * upsert). Semantics: for each key, the LATEST change wins (greatest
    * `versionCols`, compared lexicographically — callers include a unique
    * tiebreaker, e.g. a change sequence number, to make "latest" total);
    * a matched key is updated, an unmatched key is inserted, and a latest
    * change whose `deleteWhen` predicate holds removes the row.
    *
    * Scale shape: latest-per-key is `max(struct(version, payload))` — a
    * plain partial+final hash aggregate with map-side combine (struct
    * comparison is lexicographic by field order), NOT a window, so a
    * 100-TB change log reduces before its shuffle. The merge itself is one
    * full-outer join on the key — shuffle-partitioned on both sides, and
    * AQE picks broadcast when a day's changes are small vs the snapshot.
    *
    * `partial = true` gives partial-update semantics: a null change field
    * keeps the snapshot value (MERGE ... UPDATE SET col = ...); false takes
    * the change row wholesale (full-row CDC images).
    *
    * `changes` must contain `key`, every base column it updates, and
    * `versionCols`; base columns absent from `changes` are treated as
    * all-null (partial mode keeps the snapshot values for them).
    */
  def upsert(base: DataFrame, changes: DataFrame, key: String,
      versionCols: Seq[String], partial: Boolean = false,
      deleteWhen: Option[Column] = None): DataFrame = {
    val cols = base.columns.toSeq
    val present = changes.columns.toSet
    val payloadFields = cols.filterNot(_ == key).map { c =>
      (if (present(c)) changes(c) else lit(null).cast(base.schema(c).dataType)).as(c)
    } :+ deleteWhen.getOrElse(lit(false)).as("_del")
    // max(struct(version..., payload)) = latest change per key, totally
    // ordered when versionCols include a unique tiebreaker.
    val versioned = struct(
      versionCols.map(v => changes(v).as(s"_v_$v")) :+
        struct(payloadFields: _*).as("_p"): _*)
    val latest = changes.groupBy(changes(key).as("_k"))
      .agg(max(versioned).as("_c"))
      .select(col("_k"), col("_c").getField("_p").as("_p"))
    val merged = base.join(latest, base(key) === latest("_k"), "full_outer")
    val changed = latest("_k").isNotNull
    val outCols = cols.map {
      case `key` => coalesce(base(key), latest("_k")).as(key)
      case c =>
        val cv = latest("_p").getField(c)
        val v =
          if (partial) when(changed, coalesce(cv, base(c))).otherwise(base(c))
          else when(changed, cv).otherwise(base(c))
        v.as(c)
    }
    merged
      .filter(!changed || !latest("_p").getField("_del"))
      .select(outCols: _*)
  }

  /** Salted join for skewed keys: replicate the (small) right side
    * `saltBuckets` times and scatter left rows across the replicas, so one
    * hot key spreads over `saltBuckets` reducers instead of one. AQE's
    * skew-join handles moderate skew automatically; explicit salting is the
    * tool when a single key dominates (the classic null-key / power-user
    * case in 100 TB joins). */
  def saltedJoin(left: DataFrame, right: DataFrame,
      on: (String, String), saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val (lk, rk) = on
    val salted = left.withColumn("_salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        salted(lk) === replicated(rk) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop("_salt")
  }

  /** Snapshot diff: classify every key across two table versions as
    * added / deleted / changed / unchanged. One full-outer sort-merge
    * join on the key (the inevitable shuffle; at 100 TB both snapshots
    * should be bucketed or Z-ordered on the key so the join co-locates —
    * see Sinks.writeBucketed), then a null-safe column compare — no
    * window, no collect. `compareCols` defaults to every non-key column
    * shared by both sides. Returns one row per key present in either
    * side: (key..., change_type). */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    val cmp = if (compareCols.nonEmpty) compareCols
      else before.columns.filterNot(keys.contains)
        .filter(after.columns.contains).toSeq
    val b = before.select((keys ++ cmp).map(col): _*)
      .withColumn("__b", lit(true))
    val a = after.select((keys ++ cmp).map(c =>
        col(c).as(if (keys.contains(c)) c else s"__a_$c")): _*)
      .withColumn("__a", lit(true))
    val joined = b.join(a, keys, "full_outer")
    val differs = cmp.map(c => !(col(c) <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(keys.map(col) :+
      when(col("__b").isNull, "added")
        .when(col("__a").isNull, "deleted")
        .when(differs, "changed")
        .otherwise("unchanged").as("change_type"): _*)
  }

  /** Incremental aggregate maintenance (materialized-view refresh): merge
    * a maintained per-key aggregate STATE with the aggregate of a new
    * delta batch, without rescanning the base data — the 100 TB pattern
    * for keeping corpus statistics fresh (refresh cost scales with the
    * delta, not the corpus). State is (key, sum DECIMAL, cnt) — sums and
    * counts are mergeable by addition; avg is derived at read time, so it
    * is exactly the avg a full recompute would produce. Both inputs and
    * the output share one schema, so refreshes chain: state ⊕ delta₁ ⊕
    * delta₂ = agg(base ∪ delta₁ ∪ delta₂). */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(22, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(22, 2)).as("agg_sum"),
        count(col(valueCol)).as("agg_cnt"))

  def mergeAggState(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("agg_sum"))
          .cast(org.apache.spark.sql.types.DecimalType(22, 2)).as("agg_sum"),
        coalesce(sum(col("agg_cnt")), lit(0L)).as("agg_cnt"))

  /** Incremental maintenance of an inner equi-join view under inserts:
    * when batches ΔA and ΔB arrive, the view's delta is exactly
    * ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (the cross term appears once — the first two
    * terms join the delta against the PRE-batch other side). Appending
    * this delta to the old view reproduces (A∪ΔA)⋈(B∪ΔB) without
    * rescanning the base tables' join — the standard IVM identity a
    * continuously-maintained join table runs on every micro-batch.
    *
    * Scale shape: the dominant cost is Δ-sized, not base-sized — each
    * term has a delta on one side, so AQE broadcasts the (small) delta
    * and the base side streams through without a full-table shuffle when
    * the base is bucketed/pre-partitioned on the join key. */
  def incrementalJoinDelta(a: DataFrame, da: DataFrame,
      b: DataFrame, db: DataFrame, aKey: String, bKey: String): DataFrame = {
    // same-named keys (the common case) take a USING join so the output
    // carries ONE key column and the three delta terms union cleanly;
    // distinct names join on frame-qualified refs so the helper resolves
    // even when either key name also exists on the other side
    def j(l: DataFrame, r: DataFrame) =
      if (aKey == bKey) l.join(r, Seq(aKey))
      else {
        val (la, ra) = (l.alias("ivm_l"), r.alias("ivm_r"))
        la.join(ra, la.col(aKey) === ra.col(bKey))
      }
    j(da, b).unionByName(j(a, db)).unionByName(j(da, db))
  }
}
