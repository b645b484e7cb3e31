package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.Relational

/** Property-based operator laws (SURVEY.md §5 adaptation: limit/offset
  * laws, distinct idempotence, join cardinality) — ScalaCheck's native
  * Properties runner under sbt test. */
object RelationalProps extends Properties("Relational") {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val rowsGen: Gen[List[(Int, Long)]] = Gen.listOfN(25,
    Gen.zip(Gen.choose(0, 5), Gen.choose(-100L, 100L)))

  property("distinct idempotent") = forAll(rowsGen) { rows =>
    val once = Relational.distinct(rows.toDF("k", "v"))
    Relational.distinct(once).count() == once.count()
  }

  property("limit/offset partition law") =
    forAll(rowsGen, Gen.choose(0, 30)) { (rows, n) =>
      val df = rows.toDF("k", "v").orderBy("k", "v")
      val head = Relational.limit(df, 0, Some(n)).collect().toSeq
      val tail = Relational.limit(df, n, None).collect().toSeq
      val all = df.collect().toSeq
      (head ++ tail).map(r => (r.getInt(0), r.getLong(1))).sorted ==
        all.map(r => (r.getInt(0), r.getLong(1))).sorted
    }

  property("inner join cardinality = sum |L_k|*|R_k|") =
    forAll(rowsGen, rowsGen) { (lrows, rrows) =>
      val got = Relational.join(lrows.toDF("k", "lv"), rrows.toDF("k2", "rv"),
        Seq("k" -> "k2")).count()
      val lc = lrows.groupBy(_._1).view.mapValues(_.size).toMap
      val rc = rrows.groupBy(_._1).view.mapValues(_.size).toMap
      got == lc.map { case (k, n) => n.toLong * rc.getOrElse(k, 0) }.sum
    }

  property("left join preserves left rows (unique right keys)") =
    forAll(rowsGen, rowsGen) { (lrows, rrows) =>
      val r = rrows.toDF("k2", "rv").dropDuplicates("k2")
      Relational.join(lrows.toDF("k", "lv"), r, Seq("k" -> "k2"), "left")
        .count() == lrows.size
    }

  property("union additive; distinct union = set union") =
    forAll(rowsGen, rowsGen) { (a, b) =>
      val da = a.toDF("k", "v"); val db = b.toDF("k", "v")
      Prop(da.union(db).count() == a.size + b.size) &&
        Prop(da.union(db).distinct().count() == (a.toSet ++ b.toSet).size)
    }

  property("two-phase rollup equals direct rollup") = forAll(rowsGen) { rows =>
    import org.apache.spark.sql.functions._
    val df = rows.map { case (k, v) => (k % 3, k % 2, v) }.toDF("a", "b", "v")
    val direct = df.rollup(col("a"), col("b"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val base = df.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
    val twoPhase = base.rollup(col("a"), col("b"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.get(0)), Option(r.get(1)), r.getLong(2), r.getLong(3))
    direct.collect().map(key).sortBy(_.toString()).toSeq ==
      twoPhase.collect().map(key).sortBy(_.toString()).toSeq
  }

  property("sorted_intersect equals set intersection size") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L)), Gen.listOf(Gen.choose(-50L, 50L))) { (a, b) =>
      import org.apache.spark.sql.functions.col
      val sa = a.distinct.sorted; val sb = b.distinct.sorted
      val got = Seq((sa, sb)).toDF("a", "b")
        .select(graft.functions.native.sorted_intersect(col("a"), col("b")))
        .collect()(0).getInt(0)
      got == (sa.toSet & sb.toSet).size
    }

  property("asofJoin emits exactly one row per left row") = forAll(rowsGen) { rows =>
    val left = rows.zipWithIndex.map { case ((k, t), i) => (k.toLong, t, i.toLong) }
      .toDF("k", "t", "uid")
    val right = rows.take(10).map { case (k, t) => (k.toLong, t, t * 2.0) }
      .toDF("k", "t", "v")
    val out = Relational.asofJoin(left, right, "k", "t", "t", Seq("v"))
    out.count() == rows.size && out.select("uid").distinct().count() == rows.size
  }
}
