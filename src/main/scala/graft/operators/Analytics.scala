package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-analytics operators: funnel conversion, cohort retention, and
  * equi-width histograms — the OLAP reporting layer a product/events
  * pipeline runs next to the training-data jobs. The reference engine
  * stops at joins + aggregates (no window/temporal surface at all), so
  * this module is beyond-reference capability expressed as plain
  * aggregate compositions Catalyst plans with partial+final hash
  * aggregation.
  *
  * Scale shape: every operator here reduces to per-key aggregates over
  * hash-partitioned shuffles — no windows over data-sized partitions, no
  * driver-side collection; stage fan-out (funnel) is an explode bounded
  * by the literal step count. */
object Analytics {

  /** Ordered-funnel conversion over `steps` (e.g. view → click →
    * purchase): a user reaches stage k when the FIRST occurrence of each
    * of the first k steps happened in strict step order. Returns one row
    * per stage: (step_idx, step, n_users, conversion) where conversion
    * is n_users / stage-1 users.
    *
    * The per-user reduction is one groupBy with a min-timestamp per step
    * (map-side combinable); stage membership then explodes each user
    * into at most |steps| rows, so shuffled volume is ≤ |users|·|steps|
    * regardless of event volume. */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val firsts = events.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(min(when(col(typeCol) === steps.head, col(tsCol))).as("t0"),
        steps.tail.zipWithIndex.map { case (s, i) =>
          min(when(col(typeCol) === s, col(tsCol))).as(s"t${i + 1}")
        }: _*)
    // deepest stage whose first-occurrence chain is strictly increasing
    val stage = steps.indices.reverse.foldLeft(lit(steps.length)) {
      case (deeper, i) =>
        val broken =
          if (i == 0) col("t0").isNull
          else col(s"t$i").isNull || col(s"t$i") <= col(s"t${i - 1}")
        when(broken, lit(i)).otherwise(deeper)
    }
    val counts = firsts.select(stage.as("stage"))
      .filter(col("stage") >= 1)
      .select(explode(sequence(lit(1), col("stage"))).as("step_idx"))
      .groupBy("step_idx").agg(count(lit(1)).as("n_users"))
    val names = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step_idx", "step")
    // stage-1 denominator: a 1-row broadcast, never data-sized
    val first = counts.filter(col("step_idx") === 1)
      .select(col("n_users").as("n_first"))
    counts.join(broadcast(names), "step_idx")
      .crossJoin(broadcast(first))
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users").cast(DoubleType) /
          col("n_first").cast(DoubleType), 6).as("conversion"))
      .orderBy("step_idx")
  }

  /** Weekly cohort retention: cohort = Monday-start week of each user's
    * first event; one output row per (cohort_week, week_offset) with the
    * distinct-user count active that many weeks after their cohort week.
    * Activity is deduped to user-weeks BEFORE the cohort join, so the
    * join and final aggregate move ≤ |users|·|weeks| rows. */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    active.join(cohorts, userCol)
      .select(col("cohort_week"),
        floor(datediff(col("wk"), col("cohort_week")) / lit(7))
          .cast(LongType).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users")) // rows are distinct user-weeks
      .orderBy("cohort_week", "week_offset")
  }

  /** Equi-DEPTH histogram: bucket boundaries are the exact
    * (interpolated) quantiles of the column, so each bucket holds ~1/n of
    * the rows — the binning feature engineering actually wants for
    * skewed columns, where equi-width puts everything in two bins. The
    * scale-safe shape: ONE percentile aggregate produces the n-1
    * boundaries (a single broadcast row — never a data-sized global
    * sort/ntile window), then a narrow per-row fold counts boundaries
    * strictly below the value. Rows equal to a boundary go to the lower
    * bucket (count of boundaries < x). */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, s"equi-depth needs buckets > 1, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val bounds = df.filter(col(valueCol).isNotNull)
      .agg(expr(s"percentile($valueCol, array(${probs.mkString(",")}))")
        .as("bs"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(aggregate(col("bs"), lit(0L),
        (acc, b) => acc + when(col(valueCol) > b, 1L).otherwise(0L))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Equi-width histogram of `valueCol` over [lo, hi) in `buckets` bins
    * (outliers clamp to the edge bins): (bucket, lo_edge, n). One narrow
    * map + one |buckets|-group aggregate — scan-speed at any scale. The
    * bucket index and edge use one fixed double expression shape so an
    * oracle replays them bit-for-bit. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    require(buckets > 0 && hi > lo, "histogram needs hi > lo, buckets > 0")
    val width = (hi - lo) / buckets
    val raw = floor((col(valueCol) - lit(lo)) / lit(width)).cast(LongType)
    val bucket = least(greatest(raw, lit(0L)), lit(buckets - 1L))
    df.filter(col(valueCol).isNotNull)
      .select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket").cast(DoubleType) * lit(width)).as("lo_edge"),
        col("n"))
      .orderBy("bucket")
  }

  /** Robust per-group outlier gate by median absolute deviation: returns
    * (group, med, mad, n, n_outliers) where an outlier is
    * dev > k·mad (multiply-only predicate; k = 4.4478 ≈ 3·1.4826 makes
    * it the robust analog of |z| > 3). Three grouped aggregate passes
    * (median, MAD, counts) — Spark's exact `percentile` is the same
    * linear interpolation as DuckDB's quantile_cont, so the whole chain
    * is engine-exact. Robust where the z-score gate is not: a heavy tail
    * inflates a stddev but barely moves the MAD. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 4.4478): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(med, Seq(groupCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mads = dev.groupBy(groupCol)
      .agg(max(col("med")).as("med2"), expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mads, Seq(groupCol))
      .groupBy(groupCol)
      .agg(max(col("med2")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Integer-exact exponentially-decayed engagement score per user:
    * among each user's most recent `k` events (ts desc, id desc — total
    * order), a matching event at recency rank r contributes weight
    * 2^(k-r), so the newest event weighs 2^(k-1) and the k-th weighs 1.
    * With alpha fixed at 1/2 the decayed sum is a sum of distinct powers
    * of two — an exact BIGINT — and the reported double score is
    * num / 2^(k-1), exact because the divisor is a power of two. No
    * float ever enters an ordering or a comparison, so any engine
    * reproduces the score bit-for-bit.
    *
    * Scale shape: one window PARTITIONED BY user (bounded partitions),
    * rows cut to k per user before the aggregate, then a map-side
    * combinable groupBy on the same key — the shuffle moves at most
    * k rows per user. Recency-weighted engagement is the standard
    * freshness prior for ranking/curation feeds. */
  def decayedScore(events: DataFrame, eventType: String = "click",
      k: Int = 16, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(k >= 1 && k <= 62, s"k=$k must fit decayed weights in a long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol).desc, col(idCol).desc)
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(userCol)
      .agg(
        count(lit(1)).as("n_recent"),
        sum(when(col(typeCol) === eventType, 1L).otherwise(0L))
          .as("n_matching"),
        sum(when(col(typeCol) === eventType,
            expr(s"shiftleft(1L, $k - __rn)"))
          .otherwise(0L)).as("decay_num"))
      .withColumn("decay_score",
        col("decay_num").cast(DoubleType) / lit(math.pow(2.0, k - 1)))
  }

  /** Borda rank fusion of heterogeneous per-document quality signals,
    * stratified by a group column: each signal is turned into a
    * row_number rank inside its stratum (value desc, id asc — fully
    * deterministic), ranks are summed, and the `topk` lowest-sum docs
    * per stratum survive. Rank aggregation is the robust way to combine
    * signals on incomparable scales (chars vs tokens vs ratios) without
    * normalizing floats — everything stays in longs end-to-end.
    *
    * Scale shape: the rank windows all partition by the stratum column,
    * so they ride one hash partitioning of bounded per-stratum
    * partitions; the final top-k is another window on the same key. No
    * global window, no collect. `signals` are (name, integer column)
    * pairs — callers supply exact integer signals (counts, integer-scaled
    * ratios) so ties and ranks are engine-independent. */
  def bordaFusion(df: DataFrame, groupCol: String, idCol: String,
      signals: Seq[(String, org.apache.spark.sql.Column)],
      topk: Int = 5): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    val withSignals = signals.foldLeft(df) { case (d, (nm, c)) =>
      d.withColumn(nm, c.cast(LongType))
    }
    val ranked = signals.foldLeft(withSignals) { case (d, (nm, _)) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol).orderBy(col(nm).desc, col(idCol).asc)
      d.withColumn(s"rank_$nm", row_number().over(w).cast(LongType))
    }
    val borda = ranked.withColumn("borda",
      signals.map { case (nm, _) => col(s"rank_$nm") }.reduce(_ + _))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("borda").asc, col(idCol).asc)
    borda.withColumn("final_rank", row_number().over(wTop).cast(LongType))
      .filter(col("final_rank") <= topk)
      .select((Seq(col(groupCol), col(idCol)) ++
        signals.map { case (nm, _) => col(s"rank_$nm") } ++
        Seq(col("borda"), col("final_rank"))): _*)
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * count (event_type → next event_type) transitions, with the next
    * event taken per user in (ts, tiebreak) order via a lead window
    * PARTITIONED BY user (bounded partitions — never a global window).
    * Returns (from_type, to_type, n, total_from, prob): n is the exact
    * transition count, total_from the exact out-count of the source
    * state, prob their per-row IEEE quotient (identical on identical
    * longs in any engine). The sequence-model use: behavioral signatures
    * for bot/spam filtering and next-event priors. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      tiebreakCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(tiebreakCol))
    val pairs = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type")
      .agg(sum(col("n")).as("total_from"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("total_from").cast(LongType).as("total_from"),
        (col("n").cast(DoubleType) / col("total_from").cast(DoubleType))
          .as("prob"))
  }
}
