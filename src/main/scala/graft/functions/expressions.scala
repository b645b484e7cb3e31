package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths of the text-analysis /
  * dedup / similarity modules. All have real `doGenCode` so they stay
  * inside WholeStageCodegen — at 100 TB these run per-row on every
  * document/vector, so a Scala UDF (serde per call, codegen fence) is not
  * acceptable. The reference engine has no scalar-function surface at all
  * (SURVEY.md §2.5 "Scalar functions: none"); these are beyond-reference
  * capability, built the Spark-native way.
  *
  * Hash design notes: everything here is self-contained arithmetic (FNV-1a
  * over UTF-8 bytes) — deterministic across JVMs, partitions and Spark
  * versions, no dependence on Spark's internal Murmur3 seeds.
  */
object HashKernels {
  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  /** FNV-1a over a byte range. */
  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** FNV-1a of a whole string's UTF-8 bytes — the per-token feature hash
    * behind the hashed-bag-of-words linear classifier (and the same hash
    * the simhash kernel applies per token). */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    fnv1a(bytes, 0, bytes.length)
  }

  /** Rolling/polynomial fingerprint over whitespace tokens:
    * fp = foldLeft(1000003 * acc + fnv1a(token)). Order-sensitive, so it is
    * a document fingerprint (not a bag-of-words hash). */
  def rollingFingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    var tokStart = -1
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (isSpace) {
        if (tokStart >= 0) { h = h * 1000003L + fnv1a(bytes, tokStart, i); tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    h
  }

  /** Spread the low 32 bits of v to the even bit positions of a 64-bit
    * word (magic-masks formulation — O(log w), no per-bit loop). */
  def mortonSpread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 64-bit Morton (Z-order) code: bit-interleave of the low 32 bits of x
    * (even positions) and y (odd positions). Rows sorted by this code are
    * clustered in BOTH dimensions at once, so parquet row-group min/max
    * stats stay tight for predicates on either column — the multi-
    * dimensional data-skipping lever behind Delta/Iceberg OPTIMIZE ZORDER. */
  def morton2(x: Long, y: Long): Long =
    mortonSpread(x) | (mortonSpread(y) << 1)

  /** 64-bit SimHash over whitespace tokens: each token hash votes +1/-1 on
    * every bit; the sign of each bit's tally forms the output. Near-
    * duplicate documents land within small Hamming distance. */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val tally = new Array[Int](64)
    var i = 0
    var tokStart = -1
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (isSpace) {
        if (tokStart >= 0) {
          val h = fnv1a(bytes, tokStart, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
            b += 1
          }
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def normF(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val na = normF(a); val nb = normF(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dotF(a, b) / (na * nb)
  }

  /** Remove duplicate LINES within a document, keeping the first
    * occurrence and the original order — the standard boilerplate-removal
    * step for web corpora (repeated headers/footers/menus), done in one
    * byte pass per row. Exact (byte-equality via a per-row set of
    * UTF8String line views — no hash-collision false drops). */
  def dedupLines(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    val seen = new java.util.HashSet[UTF8String]()
    var start = 0
    var first = true
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == '\n') {
        val line = UTF8String.fromBytes(bytes, start, i - start)
        if (seen.add(line)) {
          if (!first) out.write('\n')
          out.write(bytes, start, i - start)
          first = false
        }
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Argmax-by-cosine over a literal centroid set: returns the centroid_id
    * whose vector has the highest cosine with `vec`, ties broken by the
    * LOWEST id (the set is id-ascending). Bitwise-identical to folding
    * `greatest(struct(cosine, -id)...)` over the same set — the vec norm is
    * hoisted out of the loop, but each per-centroid division keeps the
    * exact `dot / (nvec * ncent)` operand order of cosineF — while the
    * generated code stays O(1) in k instead of O(k·dim) expression nodes
    * (which blows past the JIT/64KB method limit at IVF-realistic k).
    * `cents`: array<struct<id:int, vec:array<float>>>. */
  def nearestCentroid(vec: ArrayData, cents: ArrayData): Int = {
    val nv = normF(vec)
    val k = cents.numElements()
    var best = -1
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      val c = cents.getStruct(i, 2)
      val cvec = c.getArray(1)
      val nc = normF(cvec)
      val cos = if (nv == 0.0 || nc == 0.0) 0.0 else dotF(vec, cvec) / (nv * nc)
      if (cos > bestCos) { bestCos = cos; best = c.getInt(0) }
      i += 1
    }
    best
  }
}

/** Order-sensitive 64-bit document fingerprint (rolling hash over tokens). */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.rollingFingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(c)
}

/** FNV-1a hash of a string's UTF-8 bytes as a signed 64-bit value —
  * codegen'd so it stays inside whole-stage codegen even when applied per
  * array element inside a higher-order lambda. */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fnv64($c)")
  override protected def withNewChildInternal(c: Expression): Fnv64 = copy(c)
}

/** Prepared vocabulary for [[TokenizeKernel]]: distinct piece lengths
  * (descending) + the piece set. Built once per FOLDABLE vocab expression
  * and embedded in the codegen references — never cached globally, so a
  * long-running executor holds at most one index per tokenize expression
  * in the plan (a prior ConcurrentHashMap keyed on ArrayData grew one
  * entry per ROW for non-literal vocab columns: unbounded). */
final class VocabIndex(val lens: Array[Int], val set: java.util.HashSet[String])
  extends Serializable

/** Greedy longest-match subword segmentation (WordPiece-style inference):
  * at each position emit the longest vocab piece prefixing the remainder;
  * no match → emit "?" and advance one char. With a literal vocabulary
  * (the only shape the library itself generates — Text.tokenizeSubwords
  * embeds the vocab as a literal) preparation happens once per
  * expression; a genuinely per-row vocab column falls back to building
  * the index per call, which is slower but memory-bounded. */
object TokenizeKernel {
  def prepare(vocab: ArrayData): VocabIndex = {
    val set = new java.util.HashSet[String]()
    (0 until vocab.numElements()).foreach(i => set.add(vocab.getUTF8String(i).toString))
    val lens = set.toArray(Array.empty[String]).map(_.length).distinct.sorted.reverse
    new VocabIndex(lens, set)
  }

  /** Per-call fallback for non-foldable vocab expressions: correct for
    * any vocab column, no caching (bounded memory at any scan size). */
  def greedyUnprepared(word: UTF8String, vocab: ArrayData): UTF8String =
    greedy(word, prepare(vocab))

  def greedy(word: UTF8String, idx: VocabIndex): UTF8String = {
    val lens = idx.lens
    val set = idx.set
    val w = word.toString
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos < w.length) {
      var matched: String = null
      var li = 0
      while (li < lens.length && matched == null) {
        val L = lens(li)
        if (L > 0 && pos + L <= w.length) {
          val cand = w.substring(pos, pos + L)
          if (set.contains(cand)) matched = cand
        }
        li += 1
      }
      if (sb.length > 0) sb.append(' ')
      if (matched == null) { sb.append('?'); pos += 1 }
      else { sb.append(matched); pos += matched.length }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Prepared BPE merge table for [[BpeKernel]]: pair-key → 1-based merge
  * rank, plus the per-rank components for the merge pass. Built once per
  * foldable merge-list expression and shipped as a codegen reference
  * object — vocabulary size is a TABLE size here, never an
  * expression-tree depth (the prior shape folded k chained `replace`
  * calls, which at a production 32k-merge vocabulary is a 32k-deep
  * Catalyst tree that breaks codegen long before data volume matters). */
final class MergeIndex(val lhs: Array[String], val rhs: Array[String],
    val rank: java.util.HashMap[String, Array[Int]]) extends Serializable

/** BPE merge application with EXACT sequential-pass semantics. The
  * trainer ([[graft.functions.Text.bpeTrainMerges]]) defines a merge as
  * a left-to-right non-overlapping `replace(s, " l r ", " lr ")` over
  * the spaced word, applied in rank order — one full pass per merge.
  * The classic rank-greedy BPE encoder (always merge the lowest-rank
  * pair PRESENT) is NOT equivalent to that chain: a late merge can
  * create a symbol string that collides with an early merge's component
  * (e.g. rank-5 ("a","bc") producing "abc" after rank-3 ("abc","d") has
  * already passed), and pure greedy would illegally re-fire the earlier
  * rank. The exact-and-still-k-independent algorithm is rank-greedy
  * with a MONOTONE CURSOR: repeatedly fire the minimum-rank adjacent
  * pair whose rank exceeds the last fired rank (one left-to-right
  * non-overlapping pass), until no such pair remains. Each step removes
  * at least one symbol, so a word of n code points costs O(n) steps of
  * O(n) map lookups — O(n²) per word, INDEPENDENT of vocabulary size,
  * versus the replace chain's O(k·n). Equivalence: the first merge the
  * sequential chain fires is the minimum present rank; after its pass
  * the chain's cursor is past that rank forever (and a fired pair's
  * count can never grow back — new adjacencies always involve the newly
  * created symbol), which is exactly the floor rule. */
object BpeKernel {
  /** Merge-list entries are "l r" strings in rank order — unambiguous
    * because symbols come from whitespace-split words, so a symbol can
    * never itself contain the space separator. A pair maps to ALL its
    * ranks (ascending): the same pair CAN recur at a later rank — a
    * later merge may recreate an already-consumed pair's components
    * (e.g. ("x","abc") consumed after ("ab","c") built "abc", regrown
    * when ("a","bc") builds more "abc"s) and the trainer may then
    * re-learn it — and the chain applies each occurrence's pass
    * independently. */
  def prepare(merges: ArrayData): MergeIndex = {
    val k = merges.numElements()
    val lhs = new Array[String](k); val rhs = new Array[String](k)
    val acc = new java.util.HashMap[String, java.util.ArrayList[Int]](k * 2)
    var i = 0
    while (i < k) {
      val key = merges.getUTF8String(i).toString
      val cut = key.indexOf(' ')
      lhs(i) = key.substring(0, cut); rhs(i) = key.substring(cut + 1)
      acc.computeIfAbsent(key, _ => new java.util.ArrayList[Int]())
        .add(i + 1) // 1-based: floor starts at 0; insertion = ascending
      i += 1
    }
    val rank = new java.util.HashMap[String, Array[Int]](acc.size() * 2)
    acc.forEach { (key, list) =>
      val arr = new Array[Int](list.size())
      var j = 0
      while (j < arr.length) { arr(j) = list.get(j); j += 1 }
      rank.put(key, arr)
    }
    new MergeIndex(lhs, rhs, rank)
  }

  /** Per-call fallback for a non-foldable merge column: correct for any
    * merge list, no caching (bounded memory at any scan size). */
  def countUnprepared(word: UTF8String, merges: ArrayData): Int =
    count(word, prepare(merges))

  /** Symbol count of `word` after applying the merge table — the BPE
    * token count the budget queries aggregate. Splits by CODE POINT to
    * match the trainer's regex spacing (Java `.` matches one code
    * point). */
  def count(word: UTF8String, idx: MergeIndex): Int = {
    val w = word.toString
    if (w.isEmpty) return 0
    val syms = new Array[String](w.codePointCount(0, w.length))
    var ci = 0; var n = 0
    while (ci < w.length) {
      val cc = Character.charCount(w.codePointAt(ci))
      syms(n) = w.substring(ci, ci + cc); n += 1; ci += cc
    }
    var floor = 0
    var done = false
    while (!done && n >= 2) {
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val ranks = idx.rank.get(syms(j) + " " + syms(j + 1))
        if (ranks != null) {
          // first rank above the floor — ranks are ascending, and pairs
          // almost always carry exactly one
          var t = 0
          while (t < ranks.length && ranks(t) <= floor) t += 1
          if (t < ranks.length && ranks(t) < best) best = ranks(t)
        }
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // One replace pass. String-faithful detail: the pattern " l r "
        // SHARES its trailing space with the next pair's leading space,
        // so after a hit the scan resumes past that space — the symbol
        // immediately after a merged pair cannot START a match in the
        // same pass (" a a a a " under (a,a) → " aa a a ", three
        // symbols, NOT " aa aa "). `blocked` reproduces that.
        val l = idx.lhs(best - 1); val r = idx.rhs(best - 1)
        var src = 0; var dst = 0
        var blocked = false
        while (src < n) {
          if (!blocked && src < n - 1 && syms(src) == l && syms(src + 1) == r) {
            syms(dst) = l + r; src += 2; blocked = true
          } else { syms(dst) = syms(src); src += 1; blocked = false }
          dst += 1
        }
        n = dst
        floor = best
      }
    }
    n
  }
}

/** BPE-encoded symbol count of a word under a merge table (rank-ordered
  * "l r" entries). A foldable merge list (the library's own shape:
  * [[graft.functions.Text.bpeEncode]] embeds the trained merges as a
  * literal) is prepared ONCE and shipped as a codegen reference object;
  * a non-foldable column is re-prepared per call. */
case class BpeSymbolCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val prepared: Option[MergeIndex] =
    if (right.foldable)
      Option(right.eval(null)).map(v => BpeKernel.prepare(v.asInstanceOf[ArrayData]))
    else None

  override protected def nullSafeEval(w: Any, m: Any): Any = prepared match {
    case Some(idx) => BpeKernel.count(w.asInstanceOf[UTF8String], idx)
    case None =>
      BpeKernel.countUnprepared(w.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    prepared match {
      case Some(idx) =>
        val ref = ctx.addReferenceObj("mergeIdx", idx, classOf[MergeIndex].getName)
        defineCodeGen(ctx, ev, (w, _) => s"graft.functions.BpeKernel.count($w, $ref)")
      case None =>
        defineCodeGen(ctx, ev,
          (w, m) => s"graft.functions.BpeKernel.countUnprepared($w, $m)")
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeSymbolCount =
    copy(l, r)
}

/** Greedy longest-match subword pieces of a word, space-joined. A
  * foldable vocab (the common case: a literal piece list) is prepared
  * ONCE and shipped as a codegen reference object; a non-foldable vocab
  * column is re-prepared per call — bounded memory either way. */
case class GreedyTokenize(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val prepared: Option[VocabIndex] =
    if (right.foldable)
      Option(right.eval(null)).map(v => TokenizeKernel.prepare(v.asInstanceOf[ArrayData]))
    else None

  override protected def nullSafeEval(w: Any, v: Any): Any = prepared match {
    case Some(idx) => TokenizeKernel.greedy(w.asInstanceOf[UTF8String], idx)
    case None =>
      TokenizeKernel.greedyUnprepared(w.asInstanceOf[UTF8String], v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    prepared match {
      case Some(idx) =>
        val ref = ctx.addReferenceObj("vocabIdx", idx, classOf[VocabIndex].getName)
        defineCodeGen(ctx, ev, (w, _) => s"graft.functions.TokenizeKernel.greedy($w, $ref)")
      case None =>
        defineCodeGen(ctx, ev,
          (w, v) => s"graft.functions.TokenizeKernel.greedyUnprepared($w, $v)")
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GreedyTokenize =
    copy(l, r)
}

/** 64-bit Morton (Z-order) code of two long columns (low 32 bits each).
  * Declares LongType inputs so SQL integer literals coerce instead of
  * failing at eval. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.morton2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(l, r)
}

/** 64-bit SimHash of a whitespace-tokenized document. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Dot product of two float vectors (ArrayType(FloatType)). A tight
  * primitive loop — ~50x less overhead than zip_with+aggregate, which
  * allocates an intermediate array per row. */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** L2 norm of a float vector. */
case class FloatVecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.normF(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.normF($c)")
  override protected def withNewChildInternal(c: Expression): FloatVecNorm = copy(c)
}

/** Order-preserving intra-document duplicate-line removal. */
case class DedupLines(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.dedupLines(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.dedupLines($c)")
  override protected def withNewChildInternal(c: Expression): DedupLines = copy(c)
}

/** Nearest centroid id by cosine over a literal centroid set (see
  * HashKernels.nearestCentroid). Left: array<float> vector; right:
  * array<struct<id:int, vec:array<float>>> — a broadcast-sized literal. */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any, c: Any): Any =
    HashKernels.nearestCentroid(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) => s"graft.functions.HashKernels.nearestCentroid($v, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

/** Cosine similarity of two float vectors; 0.0 when either norm is 0. */
case class FloatVecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecCosine =
    copy(left = l, right = r)
}

/** Column-level API + SQL registration for the native expressions. */
object native {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graftx.Bridge

  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  def rolling_fingerprint(c: Column): Column = col(RollingFingerprint(ex(c)))
  def fnv64(c: Column): Column = col(Fnv64(ex(c)))
  def simhash64(c: Column): Column = col(SimHash64(ex(c)))
  def vec_dot(a: Column, b: Column): Column = col(FloatVecDot(ex(a), ex(b)))
  def vec_norm(c: Column): Column = col(FloatVecNorm(ex(c)))
  def vec_cosine(a: Column, b: Column): Column = col(FloatVecCosine(ex(a), ex(b)))
  def nearest_centroid(vec: Column, cents: Column): Column =
    col(NearestCentroid(ex(vec), ex(cents)))
  def minhash_sig(c: Column, numHashes: Int, shingle: Int, seed: Long = 42L): Column =
    col(MinHashSig(ex(c), numHashes, shingle, seed))
  def minhash_bands(c: Column, bands: Int): Column = col(MinHashBandHashes(ex(c), bands))
  def word_ngrams(c: Column, n: Int): Column = col(WordNGrams(ex(c), n))
  def span_gram_hashes(c: Column, k: Int): Column = col(SpanGramHashes(ex(c), k))
  def word_ngram_hashes(c: Column, n: Int): Column = col(WordNGramHashes(ex(c), n))
  def sorted_intersect(a: Column, b: Column): Column = col(SortedLongIntersect(ex(a), ex(b)))
  def sig_agree(a: Column, b: Column): Column = col(SigAgree(ex(a), ex(b)))
  def text_stats(c: Column): Column = col(TextStats(ex(c)))
  def repetition_summary(c: Column): Column = col(RepetitionSummary(ex(c)))
  def deletion_variant_hashes(c: Column, maxDel: Int): Column =
    col(DeletionVariantHashes(ex(c), maxDel))
  def char_shingle_hashes(c: Column, n: Int): Column =
    col(CharShingleHashes(ex(c), n))
  def strip_accents(c: Column): Column = col(StripAccents(ex(c)))
  def dedup_lines(c: Column): Column = col(DedupLines(ex(c)))
  def html_extract_text(c: Column): Column = col(HtmlExtractText(ex(c)))
  def zorder2(a: Column, b: Column): Column = col(ZOrder2(ex(a), ex(b)))
  def tokenize_greedy(word: Column, vocab: Column): Column =
    col(GreedyTokenize(ex(word), ex(vocab)))
  def bpe_symbol_count(word: Column, merges: Column): Column =
    col(BpeSymbolCount(ex(word), ex(merges)))

  /** Make the functions usable from `spark.sql` text as well. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_fingerprint",
      es => RollingFingerprint(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("fnv64", es => Fnv64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot", es => FloatVecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm", es => FloatVecNorm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine", es => FloatVecCosine(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_centroid",
      es => NearestCentroid(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("zorder2",
      es => ZOrder2(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("tokenize_greedy",
      es => GreedyTokenize(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_symbol_count",
      es => BpeSymbolCount(es(0), es(1)), "scala_udf")
  }
}

/** One-pass MinHash signature: byte-level shingling + k permutation mins in
  * a single scan of the document. Replaces a 64x transform/array_min
  * pipeline (which allocates per hash function per row) with one tight
  * loop — the difference between O(k) array materializations and none.
  * Duplicate shingles need no dedup: min over a multiset equals min over
  * its set. */
object MinHashKernel {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Long, Int), (Array[Long], Array[Long])]()
  final val P: Long = 2305843009213693951L // 2^61 - 1

  def coeffs(seed: Long, k: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((seed, k), { case (s, n) =>
      val rnd = new scala.util.Random(s)
      val a = Array.fill(n)(math.abs(rnd.nextLong()) % (1L << 31) + 1L)
      val b = Array.fill(n)(math.abs(rnd.nextLong()) % P)
      (a, b)
    })

  def signature(str: UTF8String, k: Int, shingle: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffs(seed, k)
    val mins = Array.fill(k)(Long.MaxValue)
    val bytes = str.getBytes
    val n = bytes.length
    if (n >= shingle) {
      var i = 0
      val last = n - shingle
      while (i <= last) {
        // base hash of this shingle, folded to 31 bits (overflow-free mults)
        val base = HashKernels.fnv1a(bytes, i, i + shingle) & 0x7fffffffL
        var j = 0
        while (j < k) {
          val h = (as(j) * base + bs(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  /** Band hashes over a signature: FNV-mix each consecutive run of
    * rowsPerBand signature values into one 64-bit bucket key. */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = HashKernels.FnvOffset ^ b
      var j = b * rows
      val end = j + rows
      while (j < end) {
        val v = sig.getLong(j)
        var byteIdx = 0
        while (byteIdx < 8) {
          h = (h ^ ((v >>> (byteIdx * 8)) & 0xffL)) * HashKernels.FnvPrime
          byteIdx += 1
        }
        j += 1
      }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** MinHash signature of a document (array<bigint>, length numHashes). */
case class MinHashSig(child: Expression, numHashes: Int, shingle: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    MinHashKernel.signature(v.asInstanceOf[UTF8String], numHashes, shingle, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.signature($c, $numHashes, $shingle, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
}

/** LSH band bucket keys from a MinHash signature (array<bigint>, length bands). */
case class MinHashBandHashes(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    MinHashKernel.bandHashes(v.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.bandHashes($c, $bands)")
  override protected def withNewChildInternal(c: Expression): MinHashBandHashes = copy(c)
}

/** One-pass word n-gram extraction. Spark's higher-order functions
  * (transform/slice/concat_ws composition) evaluate interpreted lambdas per
  * element and fall out of WholeStageCodegen — ~20µs/gram; this native
  * kernel is a single byte scan. Returns DISTINCT n-grams in first-
  * occurrence order. */
object NGramKernel {
  def wordNGrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // token boundaries
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokStart = -1
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (isSpace) {
        if (tokStart >= 0) { starts.add(tokStart); ends.add(i); tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    val nToks = starts.size()
    if (nToks < n) return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[UTF8String])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    while (g <= nToks - n) {
      // bytes from start of token g to end of token g+n-1, with inner
      // whitespace runs normalized to single spaces
      val from = starts.get(g); val until = ends.get(g + n - 1)
      val buf = new Array[Byte](until - from)
      var w = 0
      var j = from
      var inSpace = false
      while (j < until) {
        val b = bytes(j)
        val sp = b == ' ' || b == '\n' || b == '\t' || b == '\r'
        if (sp) { if (!inSpace) { buf(w) = ' '; w += 1; inSpace = true } }
        else { buf(w) = b; w += 1; inSpace = false }
        j += 1
      }
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(buf, 0, w)))
      g += 1
    }
    val out = new Array[UTF8String](seen.size())
    seen.toArray(out)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Positional k-token gram fingerprints under single-space split
    * semantics — see [[SpanGramHashes]]. The joined gram equals the raw
    * byte range between its first token's start and last token's end. */
  def spanGramHashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var tokStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        starts.add(tokStart); ends.add(i); tokStart = i + 1
      }
      i += 1
    }
    val nToks = starts.size()
    if (nToks < k)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    val out = new Array[Long](nToks - k + 1)
    var g = 0
    while (g <= nToks - k) {
      out(g) = HashKernels.fnv1a(bytes, starts.get(g), ends.get(g + k - 1))
      g += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Count of equal slots in two equal-length long arrays (signature
    * agreement for minhash Jaccard estimation). */
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }


  /** SORTED distinct 64-bit FNV fingerprints of a document's word n-grams,
    * one pass. Hash-equivalent of `wordNGrams` (tokens joined by a single
    * space before hashing, matching its whitespace normalization), but the
    * downstream dedup pipeline then shuffles/joins fixed-width longs
    * instead of gram strings, and set intersection becomes a sorted merge.
    * Collision risk is the usual 64-bit epsilon (~1e-11 per pair). */
  def wordNGramHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokStart = -1
    while (i <= bytes.length) {
      val isSpace = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (isSpace) {
        if (tokStart >= 0) { starts.add(tokStart); ends.add(i); tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    val nToks = starts.size()
    if (nToks < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    val hs = new Array[Long](nToks - n + 1)
    var g = 0
    while (g <= nToks - n) {
      var h = HashKernels.FnvOffset
      var t = 0
      while (t < n) {
        if (t > 0) h = (h ^ ' '.toLong) * HashKernels.FnvPrime
        var j = starts.get(g + t).intValue()
        val e = ends.get(g + t).intValue()
        var inSpace = false
        while (j < e) {
          val b = bytes(j)
          val sp = b == ' ' || b == '\n' || b == '\t' || b == '\r'
          if (sp) {
            if (!inSpace) { h = (h ^ ' '.toLong) * HashKernels.FnvPrime; inSpace = true }
          } else { h = (h ^ (b & 0xffL)) * HashKernels.FnvPrime; inSpace = false }
          j += 1
        }
        t += 1
      }
      hs(g) = h
      g += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var k = 0
    while (k < hs.length) {
      if (w == 0 || hs(k) != hs(w - 1)) { hs(w) = hs(k); w += 1 }
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(hs, w))
  }

  /** SORTED distinct FNV fingerprints of every n-byte shingle — the exact
    * set MinHash estimates over (MinHashKernel.signature hashes the same
    * windows), so exact byte-shingle Jaccard = sorted_intersect over these
    * arrays. Mirrors wordNGramHashes' sort+dedup so downstream verification
    * is a sorted merge. */
  def charShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    val hs = new Array[Long](bytes.length - n + 1)
    var i = 0
    while (i <= bytes.length - n) { hs(i) = HashKernels.fnv1a(bytes, i, i + n); i += 1 }
    java.util.Arrays.sort(hs)
    var w = 0
    var k = 0
    while (k < hs.length) {
      if (w == 0 || hs(k) != hs(w - 1)) { hs(w) = hs(k); w += 1 }
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(hs, w))
  }

  /** Intersection size of two SORTED long arrays — a linear merge with no
    * per-row allocation (vs array_intersect's per-row hash set). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** FastSS deletion neighborhood (Bocek et al. 2007) for edit-distance joins:
  * if ed(a, b) <= k then deleting <= k characters from each side reaches a
  * COMMON string (delete a's substituted+deleted chars and b's
  * substituted+inserted chars of any optimal alignment), so two strings
  * within distance k always share a deletion variant — candidate
  * generation is then an equi-join on variant fingerprints, never a cross
  * join. Neighborhood size is C(L,0)+...+C(L,k), so this targets SHORT
  * join keys (titles, prefixes, codes); L=24, k=2 is 301 variants/row. */
object EditKernel {
  /** Sorted distinct FNV fingerprints of every <=maxDel-deletion variant.
    * Char-level (UTF-16 units) to mirror levenshtein's character edits —
    * byte-level deletions would miss multibyte substitutions. */
  def deletionVariantHashes(s: UTF8String, maxDel: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val lim = math.min(maxDel, n)
    // neighborhood size = sum_{m<=lim} C(n, m); n is a short join key by
    // contract so this stays small (n=24, k=2 -> 301)
    var cap = 1L
    var m = 1
    var c = 1L
    while (m <= lim) { c = c * (n - m + 1) / m; cap += c; m += 1 }
    // fail loudly instead of OOMing a task: the neighborhood is O(L^k),
    // and a caller pointing this at unbounded text (vs a short join key)
    // should hear that, not watch an executor die
    if (cap > 2000000L)
      throw new IllegalArgumentException(
        s"deletion neighborhood too large: length-$n key with maxDel=$maxDel " +
          s"gives $cap variants — bound the key (e.g. substring) or lower maxDel")
    val hs = new Array[Long](cap.toInt)
    var w = 0
    val positions = new Array[Int](math.max(lim, 1))
    def hashSkipping(dels: Int): Unit = {
      var h = HashKernels.FnvOffset
      var i = 0
      var p = 0
      while (i < n) {
        if (p < dels && positions(p) == i) p += 1
        else {
          val ch = str.charAt(i)
          h = (h ^ (ch & 0xffL)) * HashKernels.FnvPrime
          h = (h ^ ((ch >> 8) & 0xffL)) * HashKernels.FnvPrime
        }
        i += 1
      }
      hs(w) = h; w += 1
    }
    def choose(start: Int, depth: Int, dels: Int): Unit =
      if (depth == dels) hashSkipping(dels)
      else {
        var i = start
        while (i <= n - (dels - depth)) {
          positions(depth) = i
          choose(i + 1, depth + 1, dels)
          i += 1
        }
      }
    m = 0
    while (m <= lim) { choose(0, 0, m); m += 1 }
    java.util.Arrays.sort(hs, 0, w)
    // in-place dedup (distinct variants only: equal deletions of a string
    // with repeated chars collide)
    var k = 0
    var u = 0
    while (k < w) {
      if (u == 0 || hs(k) != hs(u - 1)) { hs(u) = hs(k); u += 1 }
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(hs, u))
  }
}

/** Sorted distinct fingerprints of a document's n-byte shingles. */
case class CharShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NGramKernel.charShingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernel.charShingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharShingleHashes = copy(c)
}

/** Sorted distinct fingerprints of the <=k-deletion neighborhood. */
case class DeletionVariantHashes(child: Expression, maxDel: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    EditKernel.deletionVariantHashes(v.asInstanceOf[UTF8String], maxDel)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EditKernel.deletionVariantHashes($c, $maxDel)")
  override protected def withNewChildInternal(c: Expression): DeletionVariantHashes = copy(c)
}

/** Distinct word n-grams of a whitespace-tokenized document. */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NGramKernel.wordNGrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernel.wordNGrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNGrams = copy(c)
}

/** Sorted distinct 64-bit fingerprints of word n-grams (see kernel doc). */
/** POSITIONAL 64-bit gram fingerprints for span masking: token boundaries
  * are single-space split semantics (empty tokens kept — exactly
  * `split(text, " ")`), so the k-token gram's joined-by-space string IS
  * the original byte range from token g's start to token g+k-1's end, and
  * the fingerprint is one FNV pass over that range — no string
  * materialization at all. Element i = fingerprint of the gram starting
  * at token position i (not sorted, not distinct — positions matter). */
case class SpanGramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NGramKernel.spanGramHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernel.spanGramHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): SpanGramHashes = copy(c)
}

case class WordNGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NGramKernel.wordNGramHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernel.wordNGramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordNGramHashes = copy(c)
}

/** Intersection size of two sorted bigint arrays (linear merge). */
case class SortedLongIntersect(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NGramKernel.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NGramKernel.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersect =
    copy(left = l, right = r)
}

/** Number of agreeing slots between two bigint-array signatures. */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NGramKernel.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NGramKernel.agree($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
    copy(left = l, right = r)
}

/** Unicode text normalization for dedup preprocessing: NFD-decompose,
  * strip combining marks (accents), recompose — the standard fold applied
  * before hashing/shingling so "café" and "cafe" collide. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val decomposed = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(decomposed.replaceAll("\\p{M}", ""))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFD)" +
        s""".replaceAll("\\\\p{M}", ""))""")
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(c)
}

/** HTML → text extraction for web-corpus ingestion. Staged exactly like
  * the classic strip chain so any regexp engine reproduces it: (1) drop
  * <script>/<style> ELEMENTS wholesale (lazy dot-all match to the first
  * close tag; an unclosed element is left for stage 2, which then strips
  * only the opening tag — markup-as-text survives, never silent data
  * loss), (2) strip remaining tags, (3) decode the six ubiquitous
  * entities with &amp; LAST (so "&amp;lt;" single-decodes to "&lt;", not
  * "<"), (4) collapse [ \n\t\r]+ runs and trim. Patterns are compiled
  * once per JVM; the kernel is a straight-line per-row map that stays in
  * WholeStageCodegen. */
object HtmlKernel {
  private val Script = java.util.regex.Pattern.compile(
    "(?is)<script[^>]*>.*?</script>")
  private val Style = java.util.regex.Pattern.compile(
    "(?is)<style[^>]*>.*?</style>")
  private val Tag = java.util.regex.Pattern.compile("<[^>]*>")
  private val Ws = java.util.regex.Pattern.compile("[ \n\t\r]+")

  def extractText(v: UTF8String): UTF8String = {
    var s = v.toString
    s = Script.matcher(s).replaceAll(" ")
    s = Style.matcher(s).replaceAll(" ")
    s = Tag.matcher(s).replaceAll(" ")
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    s = Ws.matcher(s).replaceAll(" ").trim
    UTF8String.fromString(s)
  }
}

case class HtmlExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    HtmlKernel.extractText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernel.extractText($c)")
  override protected def withNewChildInternal(c: Expression): HtmlExtractText =
    copy(c)
}
