package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{EditKernel, HashKernels, NGramKernel}

/** Property tests for the pure hash kernels (no Spark session needed).
  * The FastSS property is the correctness core of `Dedup.editDistancePairs`:
  * candidate generation misses no pair within the edit radius. */
object KernelProps extends Properties("Kernels") {

  private def variantSet(s: String, k: Int): Set[Long] = {
    val a = EditKernel.deletionVariantHashes(UTF8String.fromString(s), k)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  private val strGen: Gen[String] =
    Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def mutate1(s: String): Gen[String] = {
    val ins = for {
      p <- Gen.choose(0, s.length); c <- Gen.alphaLowerChar
    } yield s.substring(0, p) + c + s.substring(p)
    val del =
      if (s.isEmpty) Gen.const(s)
      else Gen.choose(0, s.length - 1).map(p => s.substring(0, p) + s.substring(p + 1))
    val sub =
      if (s.isEmpty) Gen.const(s)
      else for {
        p <- Gen.choose(0, s.length - 1); c <- Gen.alphaLowerChar
      } yield s.substring(0, p) + c + s.substring(p + 1)
    Gen.oneOf(ins, del, sub)
  }

  private val editPairGen: Gen[(String, String)] = for {
    s <- strGen
    n <- Gen.choose(0, 2)
    t <- (0 until n).foldLeft(Gen.const(s))((g, _) => g.flatMap(mutate1))
  } yield (s, t)

  // the FastSS theorem (Bocek et al. 2007): ed(a,b) <= k implies the
  // <=k-deletion neighborhoods intersect — zero false negatives
  property("FastSS: strings within 2 edits share a deletion variant") =
    forAll(editPairGen) { case (a, b) =>
      variantSet(a, 2).intersect(variantSet(b, 2)).nonEmpty
    }

  // with all-distinct characters no two deletion variants collide, so the
  // neighborhood size is exactly 1 + n + C(n,2)
  property("deletion neighborhood size = sum C(n,<=2) for distinct chars") =
    forAll(Gen.choose(0, 20)) { n =>
      val s = ('a' to 'z').take(n).mkString
      variantSet(s, 2).size == 1 + n + n * (n - 1) / 2
    }

  // greedy tokenization is lossless when the vocab covers the alphabet:
  // concatenating the pieces recovers the word exactly
  property("tokenizeGreedy roundtrip: pieces concatenate back to the word") =
    forAll(strGen, Gen.someOf("the" :: "ing" :: "er" :: "qu" :: Nil)) { (w, multi) =>
      val vocab = (multi ++ ('a' to 'z').map(_.toString)).toSeq
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        vocab.map(UTF8String.fromString).toArray)
      val pieces = graft.functions.TokenizeKernel
        .greedyUnprepared(UTF8String.fromString(w), arr).toString
      pieces.replace(" ", "") == w
    }

  // spanGramHashes(i) = FNV of the split(" ")-joined k-gram at position i
  property("spanGramHashes = FNV of each positional space-joined k-gram") =
    forAll(Gen.listOf(Gen.oneOf(strGen, Gen.const(""))), Gen.choose(1, 4)) { (ws, k) =>
      val text = ws.mkString(" ")
      val a = NGramKernel.spanGramHashes(UTF8String.fromString(text), k)
      val got = (0 until a.numElements()).map(a.getLong).toSeq
      val toks = text.split(" ", -1).toSeq
      val want =
        if (toks.length < k) Seq.empty
        else (0 to toks.length - k).map { i =>
          val gram = toks.slice(i, i + k).mkString(" ").getBytes("UTF-8")
          HashKernels.fnv1a(gram, 0, gram.length)
        }
      got == want
    }

  // morton2 is the exact bit interleave: even bits recover x, odd bits y
  property("morton2 interleaves: even bits = x, odd bits = y") =
    forAll(Gen.choose(0L, 0xFFFFFFFFL), Gen.choose(0L, 0xFFFFFFFFL)) { (x, y) =>
      val z = HashKernels.morton2(x, y)
      def even(v: Long): Long = (0 until 32)
        .map(i => ((v >>> (2 * i)) & 1L) << i).reduce(_ | _)
      even(z) == x && even(z >>> 1) == y
    }

  // magic-mask morton equals the naive per-bit loop
  property("morton2 = naive per-bit interleave") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(0L, Long.MaxValue)) { (x, y) =>
      val naive = (0 until 32).map { i =>
        (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
      HashKernels.morton2(x, y) == naive
    }

  // charShingleHashes equals the naive sorted-distinct set of window hashes
  property("charShingleHashes = distinct FNV of every n-byte window") =
    forAll(strGen, Gen.choose(1, 6)) { (s, n) =>
      val a = NGramKernel.charShingleHashes(UTF8String.fromString(s), n)
      val got = (0 until a.numElements()).map(a.getLong).toSeq
      val bytes = s.getBytes("UTF-8")
      val want = (0 to bytes.length - n)
        .map(i => HashKernels.fnv1a(bytes, i, i + n)).distinct.sorted
      got == want
    }

  // ---- RepetitionKernel vs a naive Scala reference over random docs
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "c", ""))
    extraSpace <- Gen.listOfN(n, Gen.oneOf("", " "))
  } yield toks.zip(extraSpace).map { case (t, e) => t + e }.mkString(" ")

  property("RepetitionKernel matches the naive token/bigram/5-gram counts") =
    forAll(docGen) { s =>
      val row = graft.functions.RepetitionKernel.eval(UTF8String.fromString(s))
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val g2 = if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Nil
      val g5 = if (toks.length >= 5) toks.sliding(5).map(_.mkString(" ")).toSeq else Nil
      val counts = g2.groupBy(identity).map { case (g, v) => g -> v.size.toLong }
      val (topGram, topN) =
        if (counts.isEmpty) ("", 0L)
        else counts.toSeq.minBy { case (g, c) => (-c, g) }
      row.getLong(0) == toks.length.toLong &&
        row.getLong(1) == toks.distinct.length.toLong &&
        row.getUTF8String(2).toString == topGram &&
        row.getLong(3) == topN &&
        row.getLong(4) == g5.length.toLong &&
        row.getLong(5) == g5.distinct.length.toLong
    }

  // ---- SpaceSaving invariants under arbitrary streams and merge splits
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 120)
    items <- Gen.listOfN(n, Gen.oneOf((1 to 15).map("w" + _)))
  } yield items

  property("SpaceSaving: est/err bounds and n/k guarantee under any split") =
    forAll(streamGen, Gen.choose(1, 6), Gen.choose(1, 8)) { (items, k, cuts) =>
      val ss = new graft.functions.SpaceSaving(k)
      // partition the stream into `cuts` chunks, reduce each, merge all
      val chunks = items.grouped(math.max(1, (items.size + cuts - 1) / cuts)).toSeq
      val partials = chunks.map(_.foldLeft(ss.zero)(ss.reduce))
      val merged = partials.foldLeft(ss.zero)(ss.merge)
      val exact = items.groupBy(identity).map { case (i, v) => i -> v.size.toLong }
      val n = items.size.toLong
      val sizeOk = merged.size <= k
      val boundsOk = merged.forall { case (i, v) =>
        val t = exact.getOrElse(i, 0L)
        v.est >= t && v.est - v.err <= t
      }
      val heavyOk = exact.forall { case (i, c) =>
        c <= n / k || merged.contains(i)
      }
      sizeOk && boundsOk && heavyOk
    }

  // --- HtmlKernel ------------------------------------------------------

  private val plainGen: Gen[String] = Gen.choose(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\n', '\t'))).map(_.mkString))

  property("HtmlKernel: markup-free text just whitespace-normalizes") =
    forAll(plainGen) { s =>
      val got = graft.functions.HtmlKernel
        .extractText(UTF8String.fromString(s)).toString
      got == s.split("[ \n\t\r]+").filter(_.nonEmpty).mkString(" ")
    }

  property("HtmlKernel: wrapping plain text in tags strips to the text") =
    forAll(plainGen) { s =>
      val html = s"<html><body><p class=x>$s</p></body></html>"
      val got = graft.functions.HtmlKernel
        .extractText(UTF8String.fromString(html)).toString
      got == s.split("[ \n\t\r]+").filter(_.nonEmpty).mkString(" ")
    }

  // --- CUSUM unrolling -------------------------------------------------

  property("cusum identity: cum - min(0, runmin(cum)) == reset recursion") =
    forAll(Gen.listOf(Gen.choose(-20L, 20L))) { ds =>
      // the window algebra TimeSeries.cusum relies on, checked in pure
      // scala against the textbook fold
      val cums = ds.scanLeft(0L)(_ + _).tail
      val unrolled = cums.zipWithIndex.map { case (c, i) =>
        c - math.min(0L, cums.take(i + 1).min)
      }
      val folded = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      unrolled == folded
    }
}
