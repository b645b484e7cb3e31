package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deequ-style data-quality expectations: declarative checks evaluated
  * scale-consciously. All single-table checks against one table compile
  * into ONE aggregate pass over that table (at 100 TB: one scan, not
  * |checks| scans — the same one-wide-row-then-stack shape
  * `Profile.profile` uses), and referential-integrity checks are
  * left-anti joins whose parent key set Catalyst/AQE broadcasts when it
  * fits. Every metric is an exact integer violation count (no float
  * ratios), so results hash-compare bit-exactly across engines.
  *
  * The reference has no quality machinery at all; this is part of the
  * beyond-reference pipeline surface (SURVEY.md §7.2 step 9).
  */
object Expectations {

  /** One declarative column-level expectation; `violated` is a boolean
    * Column that is true on rows FAILING the expectation. */
  final case class Check(name: String, violated: Column)

  /** Rows where `c` is null. */
  def notNull(name: String, c: Column): Check = Check(name, c.isNull)

  /** Rows outside [lo, hi] (nulls count as violations — an absent value
    * cannot attest the range). */
  def inRange(name: String, c: Column, lo: Double, hi: Double): Check =
    Check(name, !(c >= lo && c <= hi) || c.isNull)

  /** Rows whose value is not in the accepted set. */
  def inSet(name: String, c: Column, values: Seq[String]): Check =
    Check(name, !c.isin(values: _*) || c.isNull)

  /** Rows failing an arbitrary predicate. */
  def satisfies(name: String, predicate: Column): Check =
    Check(name, !predicate || predicate.isNull)

  /** Evaluate all checks against `df` in a single aggregate pass.
    * Returns one row per check: (check, violations, n_rows, passed). A
    * uniqueness check on `uniqueKey` (if given) rides in the same pass as
    * a count-distinct Expand branch — still one scan. */
  def run(df: DataFrame, checks: Seq[Check],
      uniqueKey: Option[(String, Column)] = None): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      (checks.zipWithIndex.map { case (ck, i) =>
        sum(when(ck.violated, 1L).otherwise(0L)).as(s"__v$i")
      } ++ uniqueKey.toSeq.map { case (_, key) =>
        (count(lit(1)) - countDistinct(key)).as("__vdup")
      })
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val names = checks.map(_.name) ++ uniqueKey.toSeq.map(_._1)
    val cols = checks.indices.map(i => s"`__v$i`") ++
      uniqueKey.toSeq.map(_ => "`__vdup`")
    val stackArgs = names.zip(cols)
      .map { case (n, c) => s"'$n', $c" }.mkString(", ")
    wide.select(col("__n"), expr(
        s"stack(${names.size}, $stackArgs) AS (`check`, violations)"))
      .select(col("check"), col("violations").cast(LongType).as("violations"),
        col("__n").as("n_rows"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** Referential integrity: count child rows whose `childKey` has no
    * match in `parent.parentKey` (null child keys are orphans too — they
    * reference nothing). One pass over the child: a left join against the
    * DISTINCT parent key set (no fan-out possible), orphan = unmatched;
    * the key set broadcasts when small, SMJ at scale. No driver action. */
  def foreignKey(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    child
      .join(parent.select(parentKey.as("__pk")).distinct(),
        childKey === col("__pk"), "left")
      .agg(sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("violations"),
        count(lit(1)).as("n_rows"))
      .select(lit(name).as("check"),
        coalesce(col("violations"), lit(0L)).cast(LongType).as("violations"),
        col("n_rows"))
      .withColumn("passed", col("violations") === 0L)

  /** k-anonymity audit over quasi-identifier columns: every row whose
    * quasi-identifier combination is shared by fewer than `k` rows is
    * re-identifiable — the standard privacy gate run before releasing or
    * training on user-adjacent data. Returns one row per equivalence
    * class: the quasi-identifier values, its size `n`, `at_risk`
    * (n < k), and the exact corpus-wide share of rows in risky classes
    * (constant across rows — cross-multiplied longs, one quotient).
    *
    * Scale shape: one map-side-combinable groupBy on the quasi-identifier
    * tuple; the corpus totals are a 1-row aggregate broadcast back — no
    * window, no collect. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
    val totals = classes.agg(
      sum(col("n")).as("__total"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("__risky"))
    classes.crossJoin(broadcast(totals))
      .select((quasiCols.map(col) ++ Seq(col("n"), col("at_risk"),
        col("__risky").cast(LongType).as("rows_at_risk"),
        col("__total").cast(LongType).as("rows_total"),
        (col("__risky").cast(DoubleType) / col("__total").cast(DoubleType))
          .as("risk_share"))): _*)
  }

  /** l-diversity audit — k-anonymity's sensitive-value counterpart
    * (Machanavajjhala et al. 2007): a quasi-identifier equivalence class
    * is re-identifiable in practice when all its members share the same
    * SENSITIVE value even if the class is large, so the gate is distinct
    * sensitive values per class >= l, not class size >= k. Returns one
    * row per class: the quasi-identifier values, class size `n`,
    * `n_sensitive` (exact distinct), `at_risk` (n_sensitive < l), and
    * the exact corpus-wide share of rows in risky classes.
    *
    * Scale shape: one groupBy on the quasi-identifier tuple with an
    * exact count-distinct branch (Catalyst plans the Expand + two-phase
    * aggregate — still one scan); totals are a 1-row broadcast back,
    * same as [[kAnonymity]]. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_sensitive") < l)
    val totals = classes.agg(
      sum(col("n")).as("__total"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("__risky"))
    classes.crossJoin(broadcast(totals))
      .select((quasiCols.map(col) ++ Seq(col("n"),
        col("n_sensitive").cast(LongType).as("n_sensitive"), col("at_risk"),
        col("__risky").cast(LongType).as("rows_at_risk"),
        col("__total").cast(LongType).as("rows_total"),
        (col("__risky").cast(DoubleType) / col("__total").cast(DoubleType))
          .as("risk_share"))): _*)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third gate of the privacy triad: a class can pass k-anonymity AND
    * l-diversity yet still leak when its sensitive-value DISTRIBUTION
    * diverges from the corpus-wide one (90% of one value in a class vs
    * 5% globally tells an observer a lot even with many distinct
    * values). For a CATEGORICAL sensitive attribute the paper's Earth
    * Mover's Distance reduces to total variation:
    * tv(c) = ½ Σ_v |p_c(v) − p(v)|.
    *
    * Exactness: the per-class sum runs on the INTEGER cross-multiplied
    * form |c_cv·N − g_v·n_c| (order-independent long sum; magnitudes
    * ≤ 2N² — overflow-safe to N ≈ 2e9 rows per audit scope), and values
    * absent from a class contribute in closed form (1 − Σ_in g_v / N)
    * rather than by materializing absent (class, value) pairs; one final
    * double expression produces tv. Scale shape: one cell aggregate on
    * (quasi, sensitive) feeds the class, global, and total tables; the
    * heavy join runs on cells (bounded by the data, never classes ×
    * values); totals are a 1-row broadcast. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0 && t < 1, s"t in (0,1), got $t")
    // internal names are __-prefixed so user quasi/sensitive columns
    // (e.g. one literally named "g" or "n") cannot collide in the joins
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cls = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).cast(LongType).as("__n"),
        count(lit(1)).as("__n_values"))
    val glob = cells.groupBy(sensitiveCol)
      .agg(sum(col("__c")).cast(LongType).as("__g"))
    val tot = cells.agg(sum(col("__c")).cast(LongType).as("__ntot"))
    val per = cells.join(glob, sensitiveCol).join(cls, quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(abs(col("__c") * col("__ntot") - col("__g") * col("__n")))
          .cast(LongType).as("__s_abs"),
        sum(col("__g")).cast(LongType).as("__g_in"),
        max(col("__n")).as("__n"), max(col("__n_values")).as("__n_values"),
        max(col("__ntot")).as("__ntot"))
    val tv = lit(0.5) *
      (col("__s_abs").cast(DoubleType) /
        (col("__n").cast(DoubleType) * col("__ntot").cast(DoubleType)) +
       (col("__ntot").cast(DoubleType) - col("__g_in").cast(DoubleType)) /
         col("__ntot").cast(DoubleType))
    per.select(quasiCols.map(col) ++ Seq(col("__n").as("n"),
      col("__n_values").as("n_values"),
      round(tv, 6).as("tv_distance"), (tv > lit(t)).as("at_risk")): _*)
  }

  /** Differentially-private count release: per-group counts perturbed
    * with TWO-SIDED GEOMETRIC noise (the discrete Laplace mechanism,
    * Ghosh/Roughgarden/Sundararajan 2009) at alpha = 1/2, i.e.
    * epsilon = ln 2 per unit of sensitivity — P(|noise| = t) ∝ 2^-t.
    *
    * The noise draw is seeded: u = low 32 bits of the FNV-1a
    * fingerprint of (key, release seed), sign = bit 0, magnitude =
    * count of trailing one-bits of u >> 1 (exactly geometric(1/2)).
    * When `seed` is None (the default) a fresh seed is drawn from
    * `java.security.SecureRandom` per release, so the noise is NOT
    * recomputable by an adversary who knows the keys — the property a
    * privacy mechanism needs. Pass an explicit seed only to reproduce
    * a specific release (audits, tests).
    *
    * Scale shape: one hash-aggregate pass (map-side combine + one
    * shuffle on the group key); the noise attach is a narrow per-row
    * expression on the aggregated (tiny) result. */
  def dpNoisedCounts(df: DataFrame, groupCol: String,
                     seed: Option[Long] = None): DataFrame = {
    val s = seed.getOrElse(new java.security.SecureRandom().nextLong())
    // fixed-width 17-char suffix keeps (key, seed) injective for any key
    noisedCounts(df, groupCol,
      concat(col(groupCol), lit("\u0000" + f"$s%016x")))
  }

  /** DERANDOMIZED variant: the noise is a deterministic PUBLIC function
    * of the group key alone (no seed).
    *
    * WARNING — this is NOT a privacy mechanism: anyone who knows the
    * key set can recompute the noise and recover the exact counts. It
    * exists solely so the release is replayable bit-for-bit by an
    * independent engine (the DuckDB oracle twin behind `q_dp_release`).
    * Library users wanting differential privacy must call
    * [[dpNoisedCounts]], which seeds from a CSPRNG. */
  def dpNoisedCountsKeyDerandomized(df: DataFrame,
                                    groupCol: String): DataFrame =
    noisedCounts(df, groupCol, col(groupCol))

  private def noisedCounts(df: DataFrame, groupCol: String,
                           fpInput: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      // low 32 bits of the whole-string FNV-1a fingerprint: identical
      // signed/unsigned, and identical to the twin's HUGEINT fold for
      // ANY key (rolling_fingerprint would diverge on keys containing
      // whitespace — it folds per token)
      .withColumn("__u",
        graft.functions.native.fnv64(fpInput)
          .bitwiseAND(lit(0xFFFFFFFFL)))
      // sign from bit 0; magnitude = trailing ones of u>>1 via the
      // classic mask (y XOR (y+1)) >> 1 = 2^t - 1, popcounted
      .withColumn("__noise", expr(
        "(1L - 2L * (__u % 2)) * " +
          "cast(bit_count(((__u div 2) ^ ((__u div 2) + 1)) div 2) as bigint)"))
      .select(col(groupCol),
        (col("n") + col("__noise")).cast(LongType).as("released"))
}
