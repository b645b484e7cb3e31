package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset utilities for training-data pipelines: column profiling and
  * deterministic splits. */
object Profile {

  /** Per-column profile: one output row per requested column with row
    * count, null count, exact distinct count, and min/max rendered as
    * strings. ONE aggregate pass computes every column's stats as one wide
    * row (at 100 TB, one scan instead of |cols| scans), then `stack`
    * unpivots to long form — a narrow map over a single row. The
    * count-distincts expand to one Expand branch per column inside the
    * same aggregation, still a single scan. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) AS (`column`, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Key-skew diagnosis for a prospective shuffle key: one output row per
    * candidate column with the per-key count distribution's shape —
    * n_keys, total, max_n, interpolated p50/p99 of the key counts, the
    * hottest key's share, and max/median skew factor. This is the
    * "measure before salting" tool: a skew factor in the tens says the
    * plain hash join will strand one reducer and `saltedJoin`/AQE skew
    * handling is worth its cost. One grouped count per column (each a
    * different key space — unavoidable), each map-side combined; the
    * percentile runs over per-key counts (|keys| rows), never raw data. */
  def skewReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "skewReport needs at least one column")
    // ONE (key_col, n) frame for every candidate column (each perKey is
    // its own key space so each needs its own grouped count — unavoidable
    // — but they union into one spine), collapsed to a COUNT-OF-COUNTS
    // histogram: per-key counts repeat massively, so the distinct
    // (key_col, n) table is tiny even when |keys| is billions (user ids —
    // exactly why the exact `percentile` aggregate's whole-column buffer
    // is the OOM this report exists to warn about). Quantiles AND the
    // summary stats all come from the bounded histogram: n_keys = Σm,
    // total = Σ n·m, max_n = max n. Persist pins the one shared tiny
    // frame; everything upstream runs once.
    val perAll = cols.map { c =>
        df.groupBy(col(c)).agg(count(lit(1)).as("n"))
          .select(lit(c).as("key_col"), col("n"))
      }.reduce(_ unionByName _)
    val hist = perAll.groupBy(col("key_col"), col("n"))
      .agg(count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pcts = graft.operators.Analytics.percentilesFromHistogram(
      hist, Seq("key_col"), "n", "m", Seq(("p50_n", 0.5), ("p99_n", 0.99)))
    val stats = hist.groupBy(col("key_col"))
      .agg(sum(col("m")).cast(LongType).as("n_keys"),
        sum(col("n") * col("m")).as("total"),
        max(col("n")).as("max_n"))
    // seed one literal row per requested column so an EMPTY input still
    // reports every column (n_keys=0, null quantiles) instead of the
    // column silently vanishing from the report
    val spark = df.sparkSession
    import spark.implicits._
    val seed = cols.toDF("key_col")
    seed.join(stats, Seq("key_col"), "left")
      .join(broadcast(pcts), Seq("key_col"), "left")
      .select(col("key_col"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("total").cast(LongType), lit(0L)).as("total"),
        col("max_n"), col("p50_n"), col("p99_n"),
        (col("max_n").cast(DoubleType) / col("total").cast(DoubleType))
          .as("top_share"),
        (col("max_n").cast(DoubleType) / col("p50_n")).as("skew_factor"))
  }

  /** Distribution drift between two dataset slices, per stratum: exact
    * counts and an INTEGER-EXACT drift flag — |p_a − p_b| > 10% decided
    * as 10·|n_a·T_b − n_b·T_a| > T_a·T_b, pure 64-bit cross-multiplied
    * longs (no float shares enter the decision, so every engine agrees
    * at the boundary). The monitoring use: a corpus refresh whose
    * language/source mix moved more than the gate means the mixing
    * weights need retuning before training. Strata missing from one
    * slice count 0 (full-outer join on the stratum). */
  def distributionDrift(a: DataFrame, b: DataFrame,
      stratumCol: String): DataFrame = {
    val ca = a.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq(stratumCol), "full_outer")
      .select(col(stratumCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tots = joined.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    joined.crossJoin(broadcast(tots))
      .select(col(stratumCol), col("n_a"), col("n_b"),
        col("t_a").cast(LongType).as("t_a"), col("t_b").cast(LongType).as("t_b"),
        (col("n_a").cast(DoubleType) / col("t_a").cast(DoubleType)).as("p_a"),
        (col("n_b").cast(DoubleType) / col("t_b").cast(DoubleType)).as("p_b"),
        (abs(col("n_a") * col("t_b") - col("n_b") * col("t_a")) * 10 >
          col("t_a") * col("t_b")).as("drifted"))
  }

  /** Knuth multiplicative hash bucket in [0, 100). Width-safe: a naive
    * `id * 2654435761` overflows a 64-bit long for id ≳ 3.47e9, where Spark
    * silently wraps but other engines (the DuckDB oracle twin) raise or
    * diverge — breaking the cross-engine reproducibility this hash exists
    * for. So compute (id mod 2^32) * C mod 2^32 in two 16-bit limbs: every
    * intermediate stays below 1.8e14, exact in 64-bit (and in any engine's
    * BIGINT). */
  private[graft] def hash32(id: Column): Column = {
    val c = lit(2654435761L)
    val a = pmod(id.cast(LongType), lit(4294967296L))
    val lo = pmod(a, lit(65536L)) * c
    val hi = shiftleft(pmod(shiftright(a, 16) * c, lit(65536L)), 16)
    pmod(lo + hi, lit(4294967296L))
  }

  private[graft] def hashBucket100(id: Column): Column =
    pmod(hash32(id), lit(100L))

  /** Deterministic shard id in [0, nShards) — same width-safe
    * multiplicative hash, so shard assignment is reproducible across
    * runs, partitionings, and engines (and restartable mid-job, which
    * `repartition(n)`'s round-robin is not). */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(hash32(id), lit(nShards.toLong))

  /** Rendezvous / highest-random-weight shard assignment (Thaler &
    * Ravishankar 1996): shard = argmax_j hash32(hash32(key) + j), ties
    * to the smallest j. Unlike `shardOf`'s modulo, resizing the shard
    * set moves ONLY the keys whose winning shard disappeared (~1/n of
    * data on shard removal, vs ~all under modulo) — the property that
    * makes incremental shard-count changes cheap on a 100 TB layout.
    * The inner hash decorrelates (key, j) across keys: a raw `key·31+j`
    * mix would alias (k, j) with (k+1, j−31) for nShards > 31, making
    * adjacent keys share per-shard weights and weakening HRW
    * independence. Pure narrow map: nShards+1 hash evaluations per row,
    * argmax as `greatest` over (hash, -shard) structs, no shuffle,
    * engine-exact (hash32 outputs are < 2^32 so hash32(key)+j never
    * overflows in any engine's BIGINT). */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    if (nShards == 1) return lit(0L) // greatest() needs two operands
    val k = hash32(id)
    val scored = (0 until nShards).map { j =>
      struct(hash32(k + lit(j.toLong)).as("h"),
        lit(-j.toLong).as("nj"))
    }
    (-greatest(scored: _*).getField("nj")).cast(LongType)
  }

  /** Deterministic hash-based train/eval split on an integer id column —
    * the reproducible alternative to rand()-based sampling (stable across
    * runs, partitionings, and engines). Knuth multiplicative hashing in
    * plain 64-bit integer arithmetic so any engine computes the same
    * assignment. Returns the input plus a `split` column. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 80): DataFrame = {
    val bucket = hashBucket100(col(idCol))
    df.withColumn("split",
      when(bucket < trainPct, "train").otherwise("eval"))
  }

  /** Leakage-safe TIME split with an embargo gap: train = rows strictly
    * before (cutoff − embargoDays), eval = rows at/after cutoff, and the
    * embargo window in between is DROPPED. The gap is what makes the
    * split honest for time-series/user-event data: adjacent events leak
    * across a knife-edge boundary (sessions straddle it, short-horizon
    * trends carry over, labels computed with lookahead touch both
    * sides), so models validated on a gapless time split overfit the
    * boundary. Standard practice in financial ML (purged/embargoed CV,
    * Lopez de Prado 2018) and event-stream evaluation.
    *
    * Pure narrow filter + label (no shuffle, no state); `cutoff` is an
    * explicit timestamp literal so the split is reproducible across
    * runs and engines — never derived from max(ts), which would change
    * under late-arriving data. Returns the input plus `split`. */
  def timeEmbargoSplit(df: DataFrame, tsCol: String, cutoff: String,
      embargoDays: Int): DataFrame = {
    require(embargoDays >= 0, s"embargoDays must be >= 0, got $embargoDays")
    val cut = to_timestamp(lit(cutoff))
    val trainEnd = cut - expr(s"INTERVAL $embargoDays DAYS")
    df.withColumn("split",
        when(col(tsCol) < trainEnd, "train")
          .when(col(tsCol) >= cut, "eval"))
      .filter(col("split").isNotNull)
  }

  /** Deterministic stratified sampling: keep ~`pct`% of rows from EVERY
    * stratum by the same multiplicative id hash — unlike a global sample,
    * rare strata keep their proportional share rather than vanishing. A
    * pure narrow filter (no shuffle, no state), reproducible across runs,
    * partitionings, and engines — what `df.sample`/`TABLESAMPLE` cannot
    * promise. The stratum column participates only semantically (the
    * per-id hash is stratum-independent so joins of samples still align
    * on id). */
  def stratifiedSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket100(col(idCol)) < pct)

  /** Deterministic WEIGHTED sampling: each stratum keeps its own
    * percentage (domain reweighting — the data-mixing primitive that
    * up/down-samples sources to a target distribution), as a pure narrow
    * filter on the same multiplicative id hash: no shuffle, reproducible
    * across runs/partitionings/engines, and sample membership is nested
    * across percentages (a 20% sample is a subset of the same stratum's
    * 40% sample, so mixtures can be retuned without resampling churn). */
  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket100(col(idCol)) < pct)
  }

  /** Temperature-2 domain flattening (the pretraining "temperature
    * sampling" rebalance, anchored at the smallest domain): each stratum
    * keeps fraction sqrt(n_min / n_i) of its rows, so stratum sizes move
    * from n_i toward the geometric mean sqrt(n_min·n_i) — heads are
    * downsampled, the smallest stratum is kept whole. Chosen exactly so
    * the whole computation is ENGINE-EXACT despite being float-valued:
    * IEEE sqrt and division are correctly rounded (unlike pow/log, which
    * is why general temperature T is not offered), scaling by 2^32 is
    * exact, and floor pins the threshold to an integer compared against
    * the same 32-bit multiplicative hash every sampler here uses. The
    * stratum-count table is a tiny partial-agg broadcast join — the corpus
    * never shuffles. */
  def temperatureFlatten(df: DataFrame, stratumCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val thresh = floor(
      sqrt(col("__nmin").cast("double") / col("__n").cast("double"))
        * lit(4294967296.0))
    df.join(broadcast(counts), stratumCol)
      .crossJoin(broadcast(nMin))
      .filter(hash32(col(idCol)) < thresh)
      .drop("__n", "__nmin")
  }

  /** Deterministic per-stratum quota: exactly min(quota, |stratum|) rows
    * per stratum, chosen as the first `quota` in multiplicative-hash
    * order — the data-mixing primitive (exact per-domain counts, unlike a
    * pct sample) that is reproducible across runs, partitionings and
    * engines. The window partitions by stratum, so its parallelism equals
    * |strata| and each sort touches only one stratum's rows (domains are
    * plentiful at 100 TB; a single giant stratum is the caller's skew
    * signal). */
  def quotaSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(hash32(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota).drop("__rk")
  }

  /** Deterministic SEQUENCE PACKING — the step between a deduped corpus
    * and a training run: concatenate documents in a reproducible
    * decorrelated-hash order (the same global shuffle the shard writer
    * uses) and chunk the stream into fixed token-budget sequences.
    * Returns (idCol, n_tokens, seq_id, seq_offset): the sequence holding
    * the document's first token and the offset within it (documents
    * straddle sequence boundaries, as concat-and-chunk packing does).
    *
    * The global running token count is a DISTRIBUTED PREFIX SUM, not a
    * window over everything: range-partition on the hash order, sort
    * within partitions, collect ONE subtotal row per partition, prefix
    * them on the driver (partition-count-sized by construction), and add
    * the broadcast offset to each partition's local running sum — the
    * only window is partitioned by partition id. Reproducible across
    * runs, partitionings AND engines: the order key is the two-limb
    * width-safe hash, and the result depends only on the global order,
    * not on where the range boundaries landed. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // persist pins the (sampled, hence run-specific) range boundaries so
    // the subtotal pass and the final pass see the identical partitioning
    val sorted = df.select(col(idCol), col(tokensCol).cast(LongType).as("__tok"),
        hash32(col(idCol)).as("__ord"))
      .repartitionByRange(parts, col("__ord"), col(idCol))
      .sortWithinPartitions(col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = sorted.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = subtotals.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__ord"), col(idCol))
    val start = coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L)) +
      sum(col("__tok")).over(w) - col("__tok")
    sorted.withColumn("__start", start)
      .select(col(idCol), col("__tok").as("n_tokens"),
        expr(s"__start div ${budget}L").as("seq_id"),
        pmod(col("__start"), lit(budget)).as("seq_offset"))
  }

  /** Token-budget corpus selection: walk the corpus in quality order
    * (score desc, id asc — total order) and keep documents while the
    * running token total stays within `budget` — the data-selection step
    * that turns "rank everything by quality" into "the best B tokens".
    * Returns every row with (score, n_tokens, running_tokens, kept) so
    * the cut line is auditable, not just applied.
    *
    * The running total is the SAME distributed prefix sum as
    * packSequences: range-partition on the order key, sort within
    * partitions, collect one subtotal per partition (partition-count
    * sized), broadcast the prefix offsets back — the only window
    * partitions by partition id. No global window, no data-sized
    * collect; at 100 TB the selection is two passes over a slim
    * (id, score, tokens) projection. */
  def budgetSelect(df: DataFrame, idCol: String, tokensCol: String,
      scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0)
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.select(col(idCol),
        col(tokensCol).cast(LongType).as("__tok"),
        col(scoreCol).cast(LongType).as("__score"))
      .repartitionByRange(parts, col("__score").desc, col(idCol))
      .sortWithinPartitions(col("__score").desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = sorted.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = subtotals.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__score").desc, col(idCol))
    val running = coalesce(element_at(typedlit(offsets), col("__pid")),
      lit(0L)) + sum(col("__tok")).over(w)
    sorted.withColumn("running_tokens", running)
      .select(col(idCol), col("__score").as("score"),
        col("__tok").as("n_tokens"), col("running_tokens"),
        (col("running_tokens") <= budget).as("kept"))
  }

  /** Exact equi-join cardinality WITHOUT materializing the join:
    * |A ⋈ B| = Σ_key cntA(key)·cntB(key) over the two per-key count
    * histograms — the planning primitive behind join reordering and
    * shuffle sizing (and, with sketched histograms, the estimator every
    * CBO uses; on exact counts it is not an estimate at all). Returns one
    * row per shared key plus the per-key product, so both the total
    * (sum(rows_out)) and the skew profile (max(rows_out)) fall out of one
    * aggregate — at 100 TB you run this BEFORE the join to decide
    * broadcast vs SMJ vs salting. The histograms are map-side-combinable
    * groupBys; the histogram join carries one row per distinct key. */
  def joinCardinality(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    val ha = a.groupBy(col(aKey).as("key")).agg(count(lit(1)).as("n_a"))
    val hb = b.groupBy(col(bKey).as("key")).agg(count(lit(1)).as("n_b"))
    ha.join(hb, "key")
      .select(col("key"), col("n_a"), col("n_b"),
        (col("n_a") * col("n_b")).as("rows_out"))
  }

  /** Corpus-mixture reweighting: per-stratum sampling weight that turns
    * the observed stratum shares into literal `targets` percentages —
    * weight(s) = target_pct(s)·total / (100·n_s), the factor a weighted
    * sampler must apply so stratum s contributes target_pct% of the
    * output. Weights are emitted as an exact long ratio (num, den) plus
    * the one-quotient double; the exactness matters because mixture
    * configs are compared/diffed across runs. Strata absent from
    * `targets` get weight 0 (excluded from the mix). One
    * map-side-combinable groupBy + a broadcast 1-row total. */
  def mixtureWeights(df: DataFrame, stratumCol: String,
      targets: Map[String, Long]): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val tgt = coalesce(element_at(typedlit(targets), col(stratumCol)),
      lit(0L))
    val num = tgt * col("__total").cast(org.apache.spark.sql.types.LongType)
    val den = lit(100L) * col("n")
    counts.crossJoin(broadcast(total))
      .select(col(stratumCol), col("n"), tgt.as("target_pct"),
        num.as("weight_num"), den.as("weight_den"),
        (num.cast(org.apache.spark.sql.types.DoubleType) /
          den.cast(org.apache.spark.sql.types.DoubleType)).as("weight"))
  }
}
