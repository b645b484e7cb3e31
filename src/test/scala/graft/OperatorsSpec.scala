package graft

import java.sql.Date
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Scd, TimeSeries}

/** TimeSeries gap-fill/interpolation and SCD2 history semantics on small
  * hand-checkable inputs. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def fill(rows: Seq[(Long, Date, java.lang.Double)]) = {
    val obs = rows.toDF("k", "day", "v").filter(col("v").isNotNull)
    TimeSeries.gapFillInterpolate(obs, "k", "day", "v")
      .orderBy("k", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getBoolean(2),
        r.getDouble(3)))
  }

  test("interpolate: interior gap is linear between neighbors") {
    val out = fill(Seq(
      (1L, d("2024-01-01"), Double.box(10.0)),
      (1L, d("2024-01-04"), Double.box(40.0))))
    assert(out.map(_._2) ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(out.map(_._4) === Seq(10.0, 20.0, 30.0, 40.0))
    assert(out.map(_._3) === Seq(true, false, false, true))
  }

  test("interpolate: each key gets its own span, no cross-key bleed") {
    val out = fill(Seq(
      (1L, d("2024-01-01"), Double.box(1.0)),
      (1L, d("2024-01-03"), Double.box(3.0)),
      (2L, d("2024-02-10"), Double.box(7.0))))
    assert(out.count(_._1 == 1L) == 3)
    // key 2's span is one day: no spine rows from key 1's January window
    assert(out.filter(_._1 == 2L).toSeq ===
      Seq((2L, "2024-02-10", true, 7.0)))
  }

  test("interpolate: single observation spans one row, observed") {
    val out = fill(Seq((5L, d("2024-03-01"), Double.box(2.5))))
    assert(out.toSeq === Seq((5L, "2024-03-01", true, 2.5)))
  }

  test("scd2: buildHistory closes each version at the next change") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, "a"),
      (1L, ts("2024-01-05 00:00:00"), 101L, "b"),
      (2L, ts("2024-01-02 00:00:00"), 102L, "x"))
      .toDF("k", "ts", "id", "attr")
    val h = Scd.buildHistory(changes, "k", "ts", "id", Seq("attr"))
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
    assert(h.toSeq === Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-05 00:00:00"))),
      (1L, "b", ts("2024-01-05 00:00:00"), None),
      (2L, "x", ts("2024-01-02 00:00:00"), None)))
  }

  test("scd2: lookupAsOf resolves the version valid at fact time") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, "a"),
      (1L, ts("2024-01-05 00:00:00"), 101L, "b"),
      (2L, ts("2024-01-02 00:00:00"), 102L, "x"))
      .toDF("k", "ts", "id", "attr")
    val h = Scd.buildHistory(changes, "k", "ts", "id", Seq("attr"))
    val facts = Seq(
      (10L, 1L, ts("2024-01-03 00:00:00")), // mid first interval -> a
      (11L, 1L, ts("2024-01-05 00:00:00")), // ON boundary -> new row b
      (12L, 1L, ts("2024-02-01 00:00:00")), // after last -> open row b
      (13L, 2L, ts("2024-01-01 00:00:00")), // before key's first -> null
      (14L, 9L, ts("2024-01-01 00:00:00"))) // unknown key -> null
      .toDF("fid", "k", "fts")
    val got = Scd.lookupAsOf(h, facts, "k", "fts")
      .select("fid", "attr").orderBy("fid").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((10L, Some("a")), (11L, Some("b")), (12L, Some("b")),
      (13L, None), (14L, None)))
  }

  test("scd2: applyChanges equals buildHistory over the full log") {
    val all = (1 to 20).map { i =>
      (i % 4L, ts(f"2024-01-${i}%02d 00:00:00"), i.toLong, s"v$i")
    }.toDF("k", "ts", "id", "attr")
    val (pre, post) = (all.filter(col("ts") < ts("2024-01-11 00:00:00")),
      all.filter(col("ts") >= ts("2024-01-11 00:00:00")))
    val incremental = Scd.applyChanges(
      Scd.buildHistory(pre, "k", "ts", "id", Seq("attr")),
      post, "k", "ts", "id", Seq("attr"))
    val full = Scd.buildHistory(all, "k", "ts", "id", Seq("attr"))
    val key = Seq("k", "attr", "valid_from", "valid_to", "change_id")
    assert(incremental.select(key.map(col): _*).orderBy(key.map(col): _*)
      .collect().toSeq ===
      full.select(key.map(col): _*).orderBy(key.map(col): _*)
        .collect().toSeq)
  }

  test("scd2: untouched keys keep their open row open") {
    val pre = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:00:00"), 2L, "b")).toDF("k", "ts", "id", "attr")
    val post = Seq((1L, ts("2024-01-09 00:00:00"), 3L, "a2"))
      .toDF("k", "ts", "id", "attr")
    val out = Scd.applyChanges(Scd.buildHistory(pre, "k", "ts", "id",
        Seq("attr")), post, "k", "ts", "id", Seq("attr"))
    val open = out.filter(col("valid_to").isNull)
      .select("k", "attr").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(open.toSet === Set((1L, "a2"), (2L, "b")))
  }

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, w) => (u, t, ts(w)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: strict first-occurrence order, per-stage conversion") {
    // u1 completes all 3; u2 clicks BEFORE viewing (stops at stage 1);
    // u3 views only; u4 never views (excluded entirely)
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      (2L, "click", "2024-01-02 09:00:00"), (2L, "view", "2024-01-02 10:00:00"),
      (3L, "view", "2024-01-03 10:00:00"),
      (4L, "purchase", "2024-01-04 10:00:00"))
    val got = graft.operators.Analytics
      .funnel(e, Seq("view", "click", "purchase"))
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1, "view", 3L, 1.0),
      (2, "click", 1L, 0.333333), (3, "purchase", 1L, 0.333333)))
  }

  test("funnel: a tie at the same timestamp does not advance the stage") {
    val e = ev((1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    val got = graft.operators.Analytics.funnel(e, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L)))
  }

  test("cohort retention: offsets count distinct active user-weeks") {
    // u1 first event Mon Jan 1 week; active weeks 0 and 2.
    // u2 first event Jan 8 week; active weeks 0 and 1.
    val e = ev(
      (1L, "view", "2024-01-02 10:00:00"), (1L, "view", "2024-01-03 10:00:00"),
      (1L, "view", "2024-01-16 10:00:00"),
      (2L, "view", "2024-01-08 10:00:00"), (2L, "view", "2024-01-11 10:00:00"),
      (2L, "view", "2024-01-18 10:00:00"))
    val got = graft.operators.Analytics.cohortRetention(e)
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("transition matrix: per-user lead order, exact counts, prob sums to 1") {
    val e = Seq(
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (1L, 2L, "click", ts("2024-01-01 11:00:00")),
      (1L, 3L, "view", ts("2024-01-01 12:00:00")),
      (2L, 4L, "view", ts("2024-01-01 10:00:00")),
      (2L, 5L, "click", ts("2024-01-01 10:00:00")), // same ts: event_id breaks
      (3L, 6L, "buy", ts("2024-01-01 10:00:00"))    // single event: no pair
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = graft.operators.Analytics.transitionMatrix(e)
      .orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // u1: view->click, click->view; u2: view->click; u3 contributes nothing
    assert(got == Seq(("click", "view", 1L, 1L), ("view", "click", 2L, 2L)))
    val probs = graft.operators.Analytics.transitionMatrix(e)
      .groupBy("from_type")
      .agg(org.apache.spark.sql.functions.sum("prob").as("p"))
      .collect().map(_.getDouble(1))
    probs.foreach(p => assert(math.abs(p - 1.0) < 1e-12))
  }

  test("skewReport: hot key dominates max_n and skew_factor") {
    // key "hot" carries 90 of 100 rows; 10 singleton keys
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"k$i")).toDF("k")
    val r = graft.functions.Profile.skewReport(df, Seq("k")).collect().head
    assert(r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[Long]("total") == 100L)
    assert(r.getAs[Long]("max_n") == 90L)
    assert(r.getAs[Double]("p50_n") == 1.0)
    assert(r.getAs[Double]("top_share") == 0.9)
    assert(r.getAs[Double]("skew_factor") == 90.0)
  }

  test("distributionDrift: integer-exact gate fires both ways; missing strata count 0") {
    val a = (Seq.fill(50)("en") ++ Seq.fill(50)("de")).toDF("lang")
    val b = (Seq.fill(80)("en") ++ Seq.fill(15)("de") ++ Seq.fill(5)("zh"))
      .toDF("lang")
    val got = graft.functions.Profile.distributionDrift(a, b, "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Boolean]("drifted"))).toSeq
    // de: 50% -> 15% (drifted); en: 50% -> 80% (drifted);
    // zh: 0% -> 5% (within the 10% gate, and absent-in-a counts 0)
    assert(got == Seq(("de", 50L, 15L, true), ("en", 50L, 80L, true),
      ("zh", 0L, 5L, false)))
    // boundary exactness: 10% apart exactly is NOT drift (strict >)
    val x = (Seq.fill(2)("p") ++ Seq.fill(8)("q")).toDF("lang") // 20% p
    val y = (Seq.fill(1)("p") ++ Seq.fill(9)("q")).toDF("lang") // 10% p
    val edge = graft.functions.Profile.distributionDrift(x, y, "lang")
      .filter(col("lang") === "p").collect().head
    assert(!edge.getAs[Boolean]("drifted"))
  }

  test("madOutliers: heavy tail moves the stddev gate, not the MAD gate") {
    // group g: 9 values near 100 plus one extreme at 10000.
    // med = 100, deviations = (0..4 small, one 9900) -> mad stays small,
    // the single extreme is the only outlier.
    val vals = Seq(98.0, 99.0, 99.0, 100.0, 100.0, 100.0, 101.0, 101.0,
      102.0, 10000.0)
    val df = vals.map(("g", _)).toDF("grp", "v")
    val r = graft.operators.Analytics.madOutliers(df, "grp", "v")
      .collect().head
    assert(r.getAs[Double]("med") == 100.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("equi-depth histogram: near-equal bucket loads on a uniform column") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = graft.operators.Analytics.equiDepthHistogram(df, "v", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // quartile boundaries of 1..100 interpolate between ranks, so each
    // bucket gets 25 +- 1 rows and all 4 buckets are present
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).sum == 100L)
    got.foreach { case (_, n) => assert(n >= 24L && n <= 26L, s"n=$n") }
  }

  test("equi-depth histogram: boundary-equal values fall in the lower bucket") {
    // 8 copies of 1.0 and 2.0: the median boundary is 1.5; values equal
    // to a boundary would matter only if a value == quantile — force it
    val df = (Seq.fill(4)(1.0) ++ Seq.fill(4)(3.0) :+ 3.0).toDF("v")
    val got = graft.operators.Analytics.equiDepthHistogram(df, "v", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // median of (1,1,1,1,3,3,3,3,3) = 3.0; values > 3.0: none ->
    // bucket 0 = all 9 rows
    assert(got == Map(0L -> 9L))
  }

  test("decayedScore: distinct powers of two, window cut at k, exact score") {
    // user 1: clicks at ranks 1 and 3 of 4 events (ts desc) with k = 4
    // -> weights 2^3 + 2^1 = 10; user 2: no clicks -> 0
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:04"), 1L, "click"),
      (2L, ts("2024-01-01 00:00:03"), 1L, "view"),
      (3L, ts("2024-01-01 00:00:02"), 1L, "click"),
      (4L, ts("2024-01-01 00:00:01"), 1L, "view"),
      (5L, ts("2024-01-01 00:00:00"), 1L, "click"), // rank 5 > k: ignored
      (6L, ts("2024-01-01 00:00:00"), 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.operators.Analytics
      .decayedScore(ev, eventType = "click", k = 4)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq((1L, 4L, 2L, 10L, 10.0 / 8.0), (2L, 1L, 0L, 0L, 0.0)))
  }

  test("noveltyRate: first-occurrence attribution by min doc id") {
    val docs = Seq(
      (1L, "a b c d"),       // grams abc, bcd -> both first here
      (2L, "a b c e"),       // abc (seen), bce (novel) -> 1/2
      (3L, "x y"),           // no 3-gram -> 0/0
      (4L, "a b c d"))       // both grams seen -> 0/2
      .toDF("doc_id", "text")
    val got = graft.functions.Text.noveltyRate(docs, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5),
      (3L, 0L, 0L, 0.0), (4L, 2L, 0L, 0.0)))
  }

  test("bordaFusion: integer ranks, deterministic ties, stratified top-k") {
    // one stratum; signals disagree: s1 ranks a>b>c, s2 ranks c>b>a,
    // s3 all-equal (ties -> id order). Borda: a=1+3+1=5, b=2+2+2=6,
    // c=3+1+3=7 -> top-2 = a, b
    val df = Seq(("g", 1L, 30L, 10L), ("g", 2L, 20L, 20L), ("g", 3L, 10L, 30L))
      .toDF("grp", "id", "s1", "s2")
    val got = graft.operators.Analytics.bordaFusion(
        df, "grp", "id",
        Seq("s1" -> col("s1"), "s2" -> col("s2"), "s3" -> lit(7L)),
        topk = 2)
      .orderBy("final_rank").collect()
      .map(r => (r.getLong(1), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq((1L, 5L, 1L), (2L, 6L, 2L)))
  }

  test("kAnonymity: class sizes, risk flags, exact corpus share") {
    // classes: (a,x)=3 rows, (a,y)=1, (b,x)=2; k=2 -> only (a,y) risky
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("g1", "g2")
    val got = graft.operators.Expectations.kAnonymity(df, Seq("g1", "g2"), 2)
      .orderBy("g1", "g2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("a", "x", 3L, false, 1L, 6L, 1.0 / 6.0),
      ("a", "y", 1L, true, 1L, 6L, 1.0 / 6.0),
      ("b", "x", 2L, false, 1L, 6L, 1.0 / 6.0)))
  }

  test("lDiversity: distinct-sensitive gate, not class size") {
    // class a: 4 rows but only 1 distinct sensitive value -> risky at l=2
    // class b: 2 rows, 2 distinct -> safe (size alone would not decide)
    val df = Seq(("a", 7L), ("a", 7L), ("a", 7L), ("a", 7L),
      ("b", 1L), ("b", 2L)).toDF("g", "s")
    val got = graft.operators.Expectations.lDiversity(df, Seq("g"), "s", 2)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("a", 4L, 1L, true, 4L, 6L, 4.0 / 6.0),
      ("b", 2L, 2L, false, 4L, 6L, 4.0 / 6.0)))
  }

  test("tCloseness: hand-computed TV distance incl. absent-value term") {
    // A(x3,y1) B(x1,y3) C(z2); global x4 y4 z2, N=10
    // tv_A = 0.5*((|30-16|+|10-16|)/40 + (10-8)/10) = 0.35 (same for B)
    // tv_C = 0.5*(|20-4|/20 + (10-2)/10) = 0.8 — z-only class far off mix
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"),
      ("C", "z"), ("C", "z")).toDF("g", "s")
    val got = graft.operators.Expectations.tCloseness(df, Seq("g"), "s", 0.5)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      ("A", 4L, 2L, 0.35, false),
      ("B", 4L, 2L, 0.35, false),
      ("C", 2L, 1L, 0.8, true)))
  }

  test("calibration: clamped binning, exact per-bin counts and rates") {
    // scores: -2.0 clamps to bin 0, 1.5 clamps to bin 9; 0.05 -> bin 5,
    // -0.15 -> bin 4, 0.999 -> bin 9 (width 0.2 over [-1,1])
    val df = Seq((-2.0, 1L), (1.5, 0L), (0.05, 1L), (-0.15, 0L),
      (0.999, 1L)).toDF("score", "label")
    val got = graft.operators.Analytics
      .calibration(df, "score", "label", -1.0, 1.0, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq((0L, 1L, 1L, 1.0), (4L, 1L, 0L, 0.0),
      (5L, 1L, 1L, 1.0), (9L, 2L, 1L, 0.5)))
  }

  test("dpNoisedCounts: released = count + seeded two-sided-geometric noise") {
    // "k c" pins whole-string FNV semantics: a token-fold fingerprint
    // (rolling_fingerprint) would hash the two tokens separately and
    // diverge from the twin's per-character HUGEINT fold
    val df = (Seq.fill(10)("ka") ++ Seq.fill(7)("kb") ++ Seq.fill(3)("k c"))
      .toDF("src")
    // reference model of the derandomized draw (same bit math in Scala)
    def fnv(s: String): Long = s.getBytes("UTF-8")
      .foldLeft(-3750763034362895579L /* FNV offset as signed */) {
        (h, b) => (h ^ (b & 0xffL)) * 1099511628211L
      }
    def noise(key: String): Long = {
      val u = fnv(key) & 0xFFFFFFFFL
      val y = u / 2
      val mag = java.lang.Long.bitCount((y ^ (y + 1)) / 2)
      (1 - 2 * (u % 2)) * mag
    }
    val got = graft.operators.Expectations
      .dpNoisedCountsKeyDerandomized(df, "src")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("k c", 3L + noise("k c")), ("ka", 10L + noise("ka")),
      ("kb", 7L + noise("kb"))))
    // the draw is a function of the key alone: stable across groupings
    val again = graft.operators.Expectations
      .dpNoisedCountsKeyDerandomized(df.limit(12), "src").orderBy("src")
      .collect()
      .map(r => r.getLong(1) - noise(r.getString(0))).toSeq
    assert(again == Seq(10L, 2L))
  }

  test("dpNoisedCounts: seeded — reproducible per seed, distinct across seeds") {
    val df = (Seq.fill(64)("ka") ++ Seq.fill(48)("kb") ++ Seq.fill(32)("kc") ++
      Seq.fill(24)("kd") ++ Seq.fill(16)("ke") ++ Seq.fill(12)("kf") ++
      Seq.fill(8)("kg") ++ Seq.fill(6)("kh")).toDF("src")
    def release(seed: Option[Long]) = graft.operators.Expectations
      .dpNoisedCounts(df, "src", seed).orderBy("src").collect()
      .map(r => r.getLong(1)).toSeq
    // a fixed seed is exactly reproducible
    assert(release(Some(7L)) == release(Some(7L)))
    // different seeds perturb differently: with 8 groups and P(equal
    // noise per group) ≤ 3/8, seeds 1..5 all colliding with seed 0 on
    // every group has probability < 1e-16 — a stable assertion
    val base = release(Some(0L))
    assert((1L to 5L).exists(s => release(Some(s)) != base))
    // the unseeded path draws a fresh CSPRNG seed (smoke: runs, 8 rows,
    // each within the mechanism's noise envelope of the true count)
    val truth = Map("ka" -> 64L, "kb" -> 48L, "kc" -> 32L, "kd" -> 24L,
      "ke" -> 16L, "kf" -> 12L, "kg" -> 8L, "kh" -> 6L)
    val unseeded = graft.operators.Expectations.dpNoisedCounts(df, "src")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(unseeded.length == 8)
    unseeded.foreach { case (k, v) =>
      assert(math.abs(v - truth(k)) <= 31L) // trailing-ones magnitude < 32
    }
  }

  test("cusum: window unrolling equals the reset recursion") {
    // values chosen to exercise reset (drop below zero), re-accumulation,
    // and a threshold crossing; target=5, threshold=6
    val vals = Seq(7L, 1L, 1L, 9L, 9L, 2L, 8L, 8L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "tick", "v")
    val got = graft.operators.TimeSeries.cusum(df, "key", "tick", "v",
        target = 5L, threshold = 6L)
      .orderBy("tick").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    // direct fold of s_t = max(0, s_{t-1} + (v - 5))
    val expected = vals.map(_ - 5L)
      .scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    assert(got.map(_._2) == expected)
    assert(got.map(_._1) == vals.map(_ - 5L))
    assert(got.map(_._3) == expected.map(_ > 6L))
  }

  test("joinCardinality: histogram product is the exact equi-join size") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("ka")
    val b = Seq(1L, 2L, 2L, 4L).toDF("kb")
    val jc = graft.functions.Profile.joinCardinality(a, "ka", b, "kb")
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(jc == Seq((1L, 2L), (2L, 2L))) // key 3 and 4 unshared
    val actual = a.join(b, col("ka") === col("kb")).count()
    assert(jc.map(_._2).sum == actual)
  }

  test("mixtureWeights: exact ratios, absent stratum weighs zero") {
    val df = (Seq.fill(6)("en") ++ Seq.fill(3)("de") ++ Seq.fill(1)("xx"))
      .toDF("lang")
    val got = graft.functions.Profile.mixtureWeights(df, "lang",
        Map("en" -> 50L, "de" -> 50L))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    // total=10: en weight = 50*10/(100*6) = 5/6; de = 500/300; xx = 0
    assert(got == Seq(
      ("de", 3L, 50L, 500L, 300L, 500.0 / 300.0),
      ("en", 6L, 50L, 500L, 600L, 500.0 / 600.0),
      ("xx", 1L, 0L, 0L, 100L, 0.0)))
  }

  test("histogram: buckets, clamped outliers, null skipped") {
    val df = Seq(Some(-5.0), Some(0.0), Some(9.9), Some(10.0), Some(25.0),
      Some(99.0), Some(250.0), None).toDF("v")
    val got = graft.operators.Analytics.histogram(df, "v", 0.0, 100.0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // -5 clamps to bucket 0; 250 clamps to bucket 9 (with 99.0)
    assert(got == Seq((0L, 0.0, 3L), (1L, 10.0, 1L), (2L, 20.0, 1L),
      (9L, 90.0, 2L)))
  }

  test("exactPercentiles matches Spark's percentile aggregate bit-for-bit") {
    val r = new scala.util.Random(11)
    val rows = (1 to 500).map(i =>
      (s"g${i % 3}", math.rint(r.nextDouble() * 10000) / 100.0))
    val df = rows.toDF("g", "v").repartition(7) // arbitrary layout
    val qs = Seq(("p05", 0.05), ("p50", 0.5), ("p93", 0.93))
    val got = graft.operators.Analytics
      .exactPercentiles(df, Seq("g"), "v", qs, countCol = Some("n"))
      .collect().map(row => row.getString(0) ->
        ((row.getDouble(1), row.getDouble(2), row.getDouble(3)),
          row.getLong(4))).toMap
    val want = df.groupBy("g")
      .agg(expr("percentile(v, 0.05)").as("p05"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.93)").as("p93"), count(lit(1)).as("n"))
      .collect().map(row => row.getString(0) ->
        ((row.getDouble(1), row.getDouble(2), row.getDouble(3)),
          row.getLong(4))).toMap
    assert(got == want) // exact double equality — same interpolation bits
    // ungrouped path (self-join offsets) agrees too
    val gotU = graft.operators.Analytics
      .exactPercentiles(df, Nil, "v", Seq(("p50", 0.5)))
      .collect().head.getDouble(0)
    val wantU = df.agg(expr("percentile(v, 0.5)")).collect().head.getDouble(0)
    assert(gotU == wantU)
    // nulls excluded; single-row group is its own every-percentile
    val withNulls = Seq(("a", Some(5.0)), ("a", None), ("b", None))
      .toDF("g", "v")
    val n = graft.operators.Analytics
      .exactPercentiles(withNulls, Seq("g"), "v", Seq(("p50", 0.5)))
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(n == Map("a" -> 5.0)) // all-null group b absent
  }

  test("rankedByGroup handles binary and NaN group keys like Catalyst") {
    // Array[Byte] group keys: JVM reference equality would reset the local
    // rank every row and miss the offsets-map entry; the canonical-key
    // path must rank by CONTENT, matching Catalyst's binary comparison
    val bin = Seq(
      (Array[Byte](1, 2), 30.0), (Array[Byte](1, 2), 10.0),
      (Array[Byte](1, 2), 20.0), (Array[Byte](9), 5.0))
      .toDF("g", "v").repartition(5)
    val gotB = graft.operators.Analytics
      .exactPercentiles(bin, Seq("g"), "v", Seq(("p50", 0.5)))
      .collect().map(r => (r.getAs[Array[Byte]](0).toSeq, r.getDouble(1)))
      .toMap
    assert(gotB == Map(Seq[Byte](1, 2) -> 20.0, Seq[Byte](9) -> 5.0))
    // NaN group keys: all NaNs are ONE group (Catalyst grouping semantics);
    // boxed NaN != NaN would split them and break the offsets lookup
    val nan = Seq((Double.NaN, 4.0), (Double.NaN, 2.0), (1.0, 7.0))
      .toDF("g", "v").repartition(3)
    val asSeq = graft.operators.Analytics
      .exactPercentiles(nan, Seq("g"), "v", Seq(("p50", 0.5)))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(asSeq.length == 2)
    assert(asSeq.exists { case (g, p) => g == 1.0 && p == 7.0 })
    assert(asSeq.exists { case (g, p) => g.isNaN && p == 3.0 })
  }

  test("trimmedMean drops exactly the floor(n*trim) tail ranks per side") {
    // group x: values 1..10, trim 0.1 → drop rank 1 and rank 10 → mean of 2..9
    val rows = (1 to 10).map(v => ("x", v * 1.0)) ++ Seq(("y", 5.0))
    val df = rows.toDF("g", "v").repartition(3)
    val got = graft.operators.Analytics
      .trimmedMean(df, Seq("g"), "v", trim = 0.1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("x") == ((8L, (2 to 9).sum / 8.0)))
    assert(got("y") == ((1L, 5.0))) // n=1: floor(0.1)=0, nothing trimmed
    // ungrouped path
    val u = graft.operators.Analytics
      .trimmedMean(rows.toDF("g", "v"), Nil, "v", trim = 0.2)
      .collect().head
    // 11 values, cut=floor(2.2)=2: drop 2 per side, keep ranks 3..9
    val sorted = rows.map(_._2).sorted.slice(2, 9)
    assert(u.getLong(0) == 7L && u.getDouble(1) == sorted.sum / 7.0)
  }

  test("globalRowNumber assigns the exact global rank, no SinglePartition exchange") {
    val r = new scala.util.Random(5)
    val rows = (1 to 300).map(i => (i.toLong, r.nextInt(1000)))
    val df = rows.toDF("id", "v").repartition(5)
    val got = graft.operators.Analytics
      .globalRowNumber(df, Seq(col("v").asc, col("id").asc), "rn")
      .collect().map(row => (row.getLong(0), row.getInt(1), row.getLong(2)))
    val want = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, v), i) => (id, v, i + 1L) }.toSet
    assert(got.toSet == want)
    val phys = graft.tools.PlanAudit.physicalPlan(graft.operators.Analytics
      .globalRowNumber(df, Seq(col("v").asc, col("id").asc), "rn"))
    assert(graft.tools.PlanAudit.singlePartitionViolations(phys).isEmpty)
  }

  test("quantile_normalize: cdf is a proper monotone CDF over the histogram") {
    val rows = SparkEntry.queries("q_quantile_normalize")(
      spark, SparkFixture.sfDir).collect()
    assert(rows.nonEmpty)
    val cdfs = rows.map(_.getDouble(3))
    assert(cdfs.last == 1.0)
    assert(cdfs.sliding(2).forall { case Array(a, b) => a < b; case _ => true })
    // cdf_lower + n/total == cdf per row; total = sum of n
    val total = rows.map(_.getLong(1)).sum.toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) + r.getLong(1) / total - r.getDouble(3))
        < 1e-12)
    }
  }

  test("importance_sample: deterministic, bounded shares, max-weight doc kept") {
    val q = SparkEntry.queries("q_importance_sample")(_: org.apache.spark.sql
      .SparkSession, SparkFixture.sfDir)
    val a = q(spark).collect()
    val b = q(spark).collect()
    assert(a.toSeq == b.toSeq) // hash rule, no RNG
    a.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_kept <= n_docs
      val share = r.getDouble(5)
      assert(share >= 0.0 && share <= 1.0)
    }
    // any doc at the global max weight has u < 2^20 = certain keep, so
    // at least one doc survives overall
    assert(a.map(_.getLong(2)).sum >= 1L)
  }
}
