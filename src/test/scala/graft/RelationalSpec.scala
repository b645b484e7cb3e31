package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Per-operator semantics on tiny literal data — mirrors the reference's
  * inline e2e tests (ref: src/execution/dataframe.rs:179-834), including the
  * null-handling fixtures (ref: src/lib.rs:42-49) and the duplicate-join-key
  * fan-out cases (ref: dataframe.rs:518-543). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // the reference's canonical (Utf8, Int64, Int64) fixture (ref: lib.rs:23-29)
  private def simple = Seq(
    ("a", 1L, 2L), ("b", 2L, 3L), ("c", 3L, 4L),
    ("d", 4L, 5L), ("e", 5L, 6L), ("f", 6L, 7L)).toDF("c1", "c2", "c3")

  private def withNulls = Seq(
    (Some("hello"), Some(1L), None: Option[Long]),
    (None: Option[String], Some(2L), Some(11L)),
    (Some("world"), None: Option[Long], Some(22L))).toDF("c1", "c2", "c3")

  test("projection selects and computes expressions") {
    val got = Relational.project(simple, Seq(col("c1"), (col("c2") + col("c3")).as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 3L), ("b", 5L), ("c", 7L), ("d", 9L), ("e", 11L), ("f", 13L)))
  }

  test("filter applies compound predicates") {
    val got = Relational.filter(simple, col("c2") >= 2L && col("c3") < 6L)
      .select("c1").as[String].collect().sorted
    assert(got.toSeq == Seq("b", "c", "d"))
  }

  test("limit skip+fetch; fetch=None means all remaining (not the reference's 0-rows quirk)") {
    val ordered = simple.orderBy("c2")
    assert(Relational.limit(ordered, 0, Some(2)).as[(String, Long, Long)].collect().map(_._1).toSeq == Seq("a", "b"))
    assert(Relational.limit(ordered, 4, Some(10)).as[(String, Long, Long)].collect().map(_._1).toSeq == Seq("e", "f"))
    assert(Relational.limit(ordered, 2, None).count() == 4)
  }

  test("distinct deduplicates full rows") {
    val dup = simple.union(simple)
    assert(Relational.distinct(dup).count() == 6)
  }

  test("inner equi-join with duplicate keys fans out") {
    // ref: join_left_2.csv has 'a' duplicated → 2 matches (dataframe.rs:518-543)
    val l = Seq(("a", 1L), ("a", 10L), ("b", 2L)).toDF("k", "lv")
    val r = Seq(("a", 100L), ("b", 200L), ("c", 300L)).toDF("k2", "rv")
    val got = Relational.join(l, r, Seq("k" -> "k2"))
      .select("k", "lv", "rv").as[(String, Long, Long)].collect().sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(("a", 1L, 100L), ("a", 10L, 100L), ("b", 2L, 200L)))
  }

  test("left join pads unmatched left rows with nulls") {
    val l = Seq(("a", 1L), ("d", 4L)).toDF("k", "lv")
    val r = Seq(("a", 100L)).toDF("k2", "rv")
    val got = Relational.join(l, r, Seq("k" -> "k2"), "left")
      .select("k", "rv").collect().map(row => (row.getString(0), if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("a", Some(100L)), ("d", None)))
  }

  test("binned range join equals broadcast-NLJ range join, incl. boundaries") {
    import graft.operators.Relational
    // values sitting exactly on bin edges, interval edges, and the clamp
    val fact = Seq(0.0, 9.999, 10.0, 19.999, 20.0, 25.0, 39.999, 40.0, 55.5)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val ivals = Seq((0.0, 10.0, "a"), (10.0, 25.0, "b"), (25.0, 40.0, "c"),
      (40.0, 1000000000.0, "d")).toDF("lo", "hi", "label")
    val a = Relational.rangeJoin(fact, ivals, col("v"), col("lo"), col("hi"))
      .select("id", "label").as[(Long, String)].collect().toSet
    val b = Relational.binnedRangeJoin(fact, ivals, col("v"), col("lo"),
        col("hi"), binWidth = 7.0, maxValue = 60.0)
      .select("id", "label").as[(Long, String)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty && a.size == fact.count())
  }

  test("binned range join: user __bin column survives; degenerate interval doesn't blow up") {
    import graft.operators.Relational
    // a pre-existing __bin column on BOTH inputs must pass through intact
    val fact = Seq((1L, 5.0, "keepF"), (2L, 15.0, "keepF2"))
      .toDF("id", "v", "__bin")
    val ivals = Seq((0.0, 10.0, "a", "keepI"), (12.0, 20.0, "b", "keepI2"))
      .toDF("lo", "hi", "label", "__bin2")
      .withColumnRenamed("__bin2", "__bin_user")
    val got = Relational.binnedRangeJoin(fact, ivals, col("v"), col("lo"),
        col("hi"), binWidth = 5.0, maxValue = 30.0)
    assert(got.columns.contains("__bin")) // user's column, not the temp
    val rows = got.select("id", "label", "__bin").as[(Long, String, String)]
      .collect().toSet
    assert(rows == Set((1L, "a", "keepF"), (2L, "b", "keepF2")))
    // degenerate interval with lo > maxValue: one clamped bin, zero rows
    // out (the residual predicate rejects), no descending-sequence fanout
    val weird = Seq((50.0, 60.0, "x")).toDF("lo", "hi", "label")
    val deg = Relational.binnedRangeJoin(
      fact.select("id", "v"), weird, col("v"), col("lo"), col("hi"),
      binWidth = 5.0, maxValue = 30.0)
    assert(deg.count() == 0)
  }

  test("empty-key join routes to cross product with theta filter") {
    val l = Seq(1, 2, 3).toDF("a")
    val r = Seq(2, 3, 4).toDF("b")
    val cross = Relational.join(l, r, Seq.empty)
    assert(cross.count() == 9)
    val theta = Relational.join(l, r, Seq.empty, "inner", Some(col("a") < col("b")))
    assert(theta.count() == 6)
  }

  test("non-equi residual filter restricts equi matches") {
    val l = Seq(("a", 5L), ("a", 1L)).toDF("k", "lv")
    val r = Seq(("a", 3L)).toDF("k2", "rv")
    val got = Relational.join(l, r, Seq("k" -> "k2"),
      residual = Some(col("lv") > col("rv"))).select("lv").as[Long].collect()
    assert(got.toSeq == Seq(5L))
  }

  test("aggregate null semantics: COUNT skips nulls, SUM/MIN/MAX null-skipping") {
    // mirrors ref null fixtures (lib.rs:42-49) + count.rs:93-98 semantics
    val got = withNulls.agg(
      count(lit(1)).as("all"), count(col("c1")).as("c1n"),
      count(col("c2")).as("c2n"), sum(col("c3")).as("s3"),
      min(col("c2")).as("m2"), max(col("c3")).as("x3")).collect()(0)
    assert(got.getLong(0) == 3 && got.getLong(1) == 2 && got.getLong(2) == 2)
    assert(got.getLong(3) == 33L && got.getLong(4) == 1L && got.getLong(5) == 22L)
  }

  test("grouped aggregate matches reference intended semantics (correct MIN)") {
    // ref MIN scalar accumulator is buggy (min_max.rs:393-403); we assert the
    // CORRECT result per SURVEY §7.4
    val df = Seq(("a", -5L), ("a", 3L), ("b", 7L)).toDF("k", "v")
    val got = df.groupBy("k").agg(min("v").as("mn"), max("v").as("mx"),
        avg("v").as("av"))
      .orderBy("k").as[(String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(("a", -5L, 3L, -1.0), ("b", 7L, 7L, 7.0)))
  }

  test("sort multi-key mixed asc/desc with nulls placement") {
    val df = Seq((Some(1L), "x"), (None, "y"), (Some(2L), "z")).toDF("k", "v")
    val ascFirst = df.orderBy(col("k").asc_nulls_first).select("v").as[String].collect()
    assert(ascFirst.head == "y")
    val descLast = df.orderBy(col("k").desc_nulls_last).select("v").as[String].collect()
    assert(descLast.last == "y")
  }

  test("topK plans as TakeOrdered (sort+limit fusion)") {
    val df = simple
    val plan = Relational.topK(df, 2, Seq(col("c2").desc)).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"))
  }

  test("asofJoin attaches most recent right row at or before left time") {
    val left = Seq((1L, 10L, "c1"), (1L, 25L, "c2"), (2L, 5L, "c3")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 50L, 300.0)).toDF("k", "t", "v")
    val got = Relational.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .orderBy("tag")
      .collect().map(r => (r.getString(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // c1@t=10: right@10 matches inclusively; c2@t=25: right@20; c3@t=5: none (right@50 is later)
    assert(got.toSeq == Seq(("c1", Some(100.0)), ("c2", Some(200.0)), ("c3", None)))
  }

  test("asofJoin forward attaches earliest right row at or after left time") {
    val left = Seq(("c1", 10), ("c2", 25), ("c3", 60)).toDF("uid", "t")
      .withColumn("k", lit(1))
    val right = Seq((1, 10, 100.0), (1, 20, 200.0), (1, 50, 500.0))
      .toDF("k", "t", "v")
    val got = Relational.asofJoin(left, right, "k", "t", "t", Seq("v"),
        direction = "forward")
      .select("uid", "v").as[(String, Option[Double])].collect()
      .sortBy(_._1)
    // c1@10 → right@10 (inclusive); c2@25 → right@50; c3@60 → none after
    assert(got.toSeq == Seq(("c1", Some(100.0)), ("c2", Some(500.0)), ("c3", None)))
  }

  test("rangeJoin bins each row into exactly one [lo,hi) bucket") {
    val facts = Seq(0.0, 5.0, 9.99, 10.0, 24.9, 99.0).toDF("v")
    val buckets = Seq((0.0, 10.0, "a"), (10.0, 25.0, "b"), (25.0, 100.0, "c"))
      .toDF("lo", "hi", "label")
    val got = Relational.rangeJoin(facts, buckets, col("v"), col("lo"), col("hi"))
      .select("v", "label").collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got == Map(0.0 -> "a", 5.0 -> "a", 9.99 -> "a", 10.0 -> "b",
      24.9 -> "b", 99.0 -> "c"))
    // broadcast side: the plan must not shuffle the fact table
    val plan = Relational.rangeJoin(facts, buckets, col("v"), col("lo"), col("hi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("tfidf scores rarer terms higher and is an exact count ratio") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val got = graft.functions.Text.tfidf(docs)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // doc 1: tf(apple)=2/3, idf(apple)=3/1 → 2.0; tf(banana)=1/3, idf=3/3=1
    assert(got((1L, "apple")) == (2.0 / 3.0) * 3.0)
    assert(got((1L, "banana")) == (1.0 / 3.0) * 1.0)
    assert(got((2L, "cherry")) == (1.0 / 2.0) * 3.0)
  }

  test("saltedJoin equals plain join result on skewed keys") {
    val left = (Seq.fill(50)(("hot", 1)) ++ Seq(("cold", 2))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("cold", 20)).toDF("k2", "rv")
    val plain = left.join(right, left("k") === right("k2")).agg(
      count(lit(1)), sum("rv")).collect()(0)
    val salted = Relational.saltedJoin(left, right, ("k", "k2"), saltBuckets = 4).agg(
      count(lit(1)), sum("rv")).collect()(0)
    assert(plain.getLong(0) == salted.getLong(0) && plain.getLong(1) == salted.getLong(1))
  }

  test("upsert: latest change wins; insert, partial update, delete") {
    val base = Seq((1L, "ann", 10.0), (2L, "bob", 20.0), (3L, "cat", 30.0))
      .toDF("id", "name", "bal")
    // key 2: two updates, seq 5 wins; key 3: delete; key 9: insert
    val changes = Seq(
      (2L, Some(99.0), 4L, false),
      (2L, Some(25.0), 5L, false),
      (3L, None: Option[Double], 6L, true),
      (9L, Some(90.0), 7L, false)
    ).toDF("id", "bal", "seq", "is_del")
    val out = Relational.upsert(base, changes, "id", Seq("seq"),
        partial = true, deleteWhen = Some(changes("is_del")))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2))).toSeq
    // 1 untouched; 2 updated to the seq=5 value, name kept (partial);
    // 3 deleted; 9 inserted with null name
    assert(out == Seq((1L, Some("ann"), 10.0), (2L, Some("bob"), 25.0),
      (9L, None, 90.0)))
  }

  test("upsert wholesale mode takes the change row fields verbatim") {
    val base = Seq((1L, "ann", 10.0)).toDF("id", "name", "bal")
    val changes = Seq((1L, Some(11.0), 1L, false))
      .toDF("id", "bal", "seq", "is_del")
    val out = Relational.upsert(base, changes, "id", Seq("seq"),
        partial = false, deleteWhen = Some(changes("is_del")))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2))).toSeq
    // wholesale: name is not carried by the change → null
    assert(out == Seq((1L, None, 11.0)))
  }

  test("snapshotDiff classifies added/deleted/changed/unchanged (null-safe)") {
    val before = Seq(
      (1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None: Option[String], 3.0), (4L, Some("d"), 4.0)
    ).toDF("id", "v", "x")
    val after = Seq(
      (2L, Some("b"), 2.0),                 // unchanged
      (3L, None: Option[String], 3.0),      // unchanged (null <=> null)
      (4L, Some("D"), 4.0),                 // changed
      (5L, Some("e"), 5.0)                  // added
    ).toDF("id", "v", "x")
    val got = Relational.snapshotDiff(before, after, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "deleted"), (2L, "unchanged"), (3L, "unchanged"),
      (4L, "changed"), (5L, "added")))
  }

  test("incremental agg state merge equals full recompute, schema stable") {
    val full = Seq(("a", 1.25), ("a", 2.50), ("b", 3.75), ("a", 4.00),
      ("b", 0.10)).toDF("k", "v")
    val s1 = Relational.aggState(full.filter(col("v") < 3.0), Seq("k"), "v")
    val s2 = Relational.aggState(full.filter(col("v") >= 3.0), Seq("k"), "v")
    val merged = Relational.mergeAggState(s1, s2, Seq("k"))
    assert(merged.schema == s1.schema) // refreshes chain without drift
    val again = Relational.mergeAggState(merged,
      Relational.aggState(full.limit(0), Seq("k"), "v"), Seq("k"))
    val gotM = merged.orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1).toString, r.getLong(2))).toSeq
    val gotF = Relational.aggState(full, Seq("k"), "v").orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1).toString, r.getLong(2))).toSeq
    assert(gotM == gotF)
    assert(again.orderBy("k").collect().map(_.getDecimal(1)).toSeq ==
      merged.orderBy("k").collect().map(_.getDecimal(1)).toSeq)
  }

  test("expectations: one-pass checks count violations exactly; FK finds orphans") {
    import graft.operators.Expectations
    val df = Seq(
      (1L, Some(5.0), Some("A")), (2L, Some(60.0), Some("X")),
      (3L, None: Option[Double], Some("N")), (4L, Some(10.0), None)
    ).toDF("id", "qty", "flag")
    val got = Expectations.run(df, Seq(
        Expectations.notNull("flag_not_null", col("flag")),
        Expectations.inRange("qty_1_50", col("qty"), 1, 50),
        Expectations.inSet("flag_accepted", col("flag"), Seq("A", "N", "R"))),
        uniqueKey = Some(("id_unique", col("id"))))
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      ("flag_accepted", 2L, 4L, false),  // X + null
      ("flag_not_null", 1L, 4L, false),
      ("id_unique", 0L, 4L, true),
      ("qty_1_50", 2L, 4L, false)))     // 60.0 + null

    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((10L, Some(1L)), (11L, Some(3L)),
      (12L, None: Option[Long])).toDF("cid", "fk")
    val fkRow = Expectations.foreignKey("fk_ok", child, col("fk"),
      parent, col("pk")).collect().head
    assert((fkRow.getString(0), fkRow.getLong(1), fkRow.getLong(2),
      fkRow.getBoolean(3)) == ("fk_ok", 2L, 3L, false)) // orphan 3 + null
  }

  test("incrementalJoinDelta: old view + delta equals the full recompute") {
    // keys overlap across base/delta on both sides, incl. a key whose
    // matches arrive ONLY via the cross term (delta x delta)
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("ka", "va")
    val da = Seq((2L, "a3"), (9L, "a9")).toDF("ka", "va")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("kb", "vb")
    val db = Seq((1L, "b3"), (9L, "b9")).toDF("kb", "vb")
    val oldView = a.join(b, col("ka") === col("kb"))
    val maintained = oldView.unionByName(
      graft.operators.Relational.incrementalJoinDelta(a, da, b, db,
        "ka", "kb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
      .toSeq.sorted
    val full = a.unionByName(da).join(b.unionByName(db),
        col("ka") === col("kb"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
      .toSeq.sorted
    // key 1: a1 x {b1,b3}; key 2: {a2,a3} x b2; key 9 only via delta x delta
    assert(maintained == full && full.size == 5)
    assert(full.contains((9L, "a9", "b9")))
  }

  test("incrementalJoinDelta resolves same-named join keys (qualified refs)") {
    val a = Seq((1L, "a1")).toDF("k", "va")
    val da = Seq((2L, "a2")).toDF("k", "va")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("k", "vb")
    val db = Seq((1L, "b3")).toDF("k", "vb")
    // both sides key column is literally "k" — unqualified col("k")===col("k")
    // would throw AnalysisException (ambiguous); the helper must qualify
    val delta = graft.operators.Relational.incrementalJoinDelta(
      a, da, b, db, "k", "k")
    assert(delta.count() == 2) // da⋈b: (2,a2,b2); a⋈db: (1,a1,b3); daxdb: none
  }
}
