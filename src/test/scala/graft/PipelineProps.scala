package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.Profile

/** Algebraic laws of the data-management pipeline ops. */
object PipelineProps extends Properties("Pipeline") {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  private val docsGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      strat <- Gen.oneOf("a", "b", "c")
      words <- Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    } yield (strat, words.mkString(" ")))
  } yield rows.zipWithIndex.map { case ((st, tx), i) => (i.toLong, st, tx) }

  property("quotaSample: every stratum keeps exactly min(quota, |stratum|)") =
    forAll(docsGen, Gen.choose(1, 10)) { (rows, quota) =>
      val df = rows.toDF("doc_id", "source", "text")
      val got = Profile.quotaSample(df, "source", "doc_id", quota)
        .groupBy("source").count().as[(String, Long)].collect().toMap
      val want = rows.groupBy(_._2).map { case (k, v) =>
        k -> math.min(quota, v.size).toLong }
      got == want
    }

  property("weightedSample: a lower-pct sample nests inside a higher-pct one") =
    forAll(docsGen, Gen.choose(0, 50), Gen.choose(50, 100)) { (rows, lo, hi) =>
      val df = rows.toDF("doc_id", "source", "text")
      def ids(pct: Int) = Profile.weightedSample(df, "source", "doc_id",
        Map("a" -> pct, "b" -> pct), defaultPct = pct / 2)
        .select("doc_id").as[Long].collect().toSet
      ids(lo).subsetOf(ids(hi))
    }

  property("winnowPairs: a planted shared run >= window+k-1 tokens is always caught") =
    forAll(
      Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")),
      Gen.listOfN(14, Gen.oneOf("gg", "hh", "ii", "jj", "kk")),
      Gen.listOfN(14, Gen.oneOf("ll", "mm", "nn", "oo", "pp"))) {
      (run, pre, post) =>
        // doc 0 = pre ++ run, doc 1 = run ++ post: the shared run has
        // 12 >= window+k-1 = 4+3-1+... (window 4, k 3 -> guarantee 6)
        // tokens, so winnowing MUST select one identical fingerprint
        // in both docs regardless of the surrounding noise
        val docs = Seq(
          (0L, (pre ++ run).mkString(" ")),
          (1L, (run ++ post).mkString(" "))).toDF("doc_id", "text")
        val pairs = Dedup.winnowPairs(docs, k = 3, window = 4,
          minShared = 1, maxBucketSize = 1000)
          .select("id_a", "id_b").as[(Long, Long)].collect()
        pairs.contains((0L, 1L))
    }

  property("rendezvousShard: shrinking the shard set moves only the removed shard's keys") =
    forAll(Gen.choose(2, 10)) { n =>
      val df = (0L until 300L).toList.toDF("id")
      val got = df.select(col("id"),
          Profile.rendezvousShard(col("id"), n).as("full"),
          Profile.rendezvousShard(col("id"), n - 1).as("small"))
        .as[(Long, Long, Long)].collect()
      got.forall { case (_, full, small) =>
        (full == small) || full == n - 1 // moved => was on the removed shard
      } && got.forall { case (_, full, small) =>
        full < n && small < n - 1
      }
    }

  property("hashSplit: train/eval partition the input deterministically") =
    forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "source", "text")
      val s1 = Profile.hashSplit(df, "doc_id").select("doc_id", "split")
        .as[(Long, String)].collect().toMap
      val s2 = Profile.hashSplit(df.repartition(5), "doc_id")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      s1 == s2 && s1.size == rows.size
    }

  property("packSequences: distributed prefix sum equals the sequential pack") =
    forAll(docsGen, Gen.choose(4L, 64L)) { (rows, budget) =>
      val df = rows.toDF("doc_id", "source", "text")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      val got = Profile.packSequences(df, "doc_id", "n_tokens", budget)
        .select("doc_id", "n_tokens", "seq_id", "seq_offset")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      // driver-side oracle: sort by the same hash order, sequential cumsum
      def h32(id: Long): Long = {
        val a = java.lang.Math.floorMod(id, 4294967296L)
        val lo = (a % 65536L) * 2654435761L
        val hi = ((a >> 16) * 2654435761L % 65536L) << 16
        (lo + hi) % 4294967296L
      }
      val toks = rows.map { case (id, _, tx) => id -> tx.split(" ").length.toLong }.toMap
      var acc = 0L
      val want = rows.map(_._1).sortBy(id => (h32(id), id)).map { id =>
        val start = acc; acc += toks(id)
        (id, toks(id), start / budget, start % budget)
      }.sortBy(_._1)
      got.toSeq == want
    }

  property("exactPercentiles: rank selection == Spark percentile, any layout") =
    forAll(
      Gen.listOf(for {
        g <- Gen.oneOf("x", "y", "z")
        v <- Gen.oneOf(Gen.choose(-1000, 1000).map(_ / 7.0),
          Gen.choose(0, 50).map(_.toDouble)) // ties likely
      } yield (g, v)).suchThat(_.nonEmpty),
      Gen.choose(1, 6), Gen.choose(0, 100)) { (rows, parts, qPct) =>
      val q = qPct / 100.0
      val df = rows.toDF("g", "v").repartition(parts)
      val got = graft.operators.Analytics
        .exactPercentiles(df, Seq("g"), "v", Seq(("p", q)))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = df.groupBy("g").agg(expr(s"percentile(v, $q)").as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got == want // exact double equality, same interpolation bits
    }

  property("globalRowNumber: rank values are exactly 1..n in sort order") =
    forAll(Gen.listOf(Gen.choose(-500, 500)).suchThat(_.nonEmpty),
        Gen.choose(1, 5)) { (vs, parts) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("id", "v").repartition(parts)
      val got = graft.operators.Analytics
        .globalRowNumber(df, Seq(col("v").asc, col("id").asc), "rn")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = rows.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      got == want
    }

  property("trimmedMean: equals the in-driver trim of the sorted values") =
    forAll(
      Gen.listOf(for {
        g <- Gen.oneOf("a", "b")
        c <- Gen.choose(0, 10000) // 2-decimal values → DECIMAL(22,2) exact
      } yield (g, c / 100.0)).suchThat(_.nonEmpty),
      Gen.oneOf(0.0, 0.05, 0.1, 0.25), Gen.choose(1, 5)) {
      (rows, trim, parts) =>
      val df = rows.toDF("g", "v").repartition(parts)
      val got = graft.operators.Analytics
        .trimmedMean(df, Seq("g"), "v", trim)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      val want = rows.groupBy(_._1).map { case (g, vs0) =>
        val vs = vs0.map(_._2).sorted
        val cut = math.floor(vs.size * trim).toInt
        val mid = vs.slice(cut, vs.size - cut)
        val sum = mid.map(v => BigDecimal(v).setScale(2)).sum
        g -> ((mid.size.toLong, sum.toDouble / mid.size))
      }
      got == want
    }

  property("exactNewOnly: kept + removed partition incoming; removed ⊆ reference texts") =
    forAll(docsGen, docsGen) { (inc, ref) =>
      val incDf = inc.toDF("doc_id", "source", "text")
      val refDf = ref.toDF("doc_id", "source", "text")
      val kept = Dedup.exactNewOnly(incDf, refDf)
        .select("doc_id").as[Long].collect().toSet
      val refTexts = ref.map(_._3).toSet
      inc.forall { case (id, _, text) =>
        if (refTexts.contains(text)) !kept.contains(id) else kept.contains(id)
      }
    }
}
