package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text statistics in ONE pass over the text — replaces a
  * stack of ~20 regexp_count/regexp_replace evaluations per row (Java regex
  * with case-insensitive alternations costs µs per call and defeats
  * common-subexpression elimination across when() branches; measured ~4x on
  * the documents pipeline).
  *
  * Field semantics are regex-compatible with the DuckDB oracle used by
  * q_text_stats (whitespace = [ \t\n\x0B\f\r], subword =
  * [A-Za-z0-9]+|[^A-Za-z0-9\s], punctuation = [.,;:!?'"()\[\]{}-]); the
  * heuristic fields (stopword ratio, quality, lang id) are token-set based
  * — the cheaper and better-defined form of the same heuristics.
  */
object TextStatsKernel {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  private val enStop = Set("the", "a", "an", "of", "and", "or", "to", "in",
    "is", "are", "was", "were", "be", "on", "for", "with", "as", "at", "by",
    "it", "this", "that")
  // language marker word sets (tiny on purpose — cheap pre-filter heuristic)
  private val langWords: Array[(String, Set[String])] = Array(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "von"),
    "en" -> Set("the", "and", "is", "of", "to", "in", "that", "it", "with", "for"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "y", "es", "en", "un", "una", "por"),
    "fr" -> Set("le", "la", "les", "de", "et", "est", "que", "dans", "pour", "une", "des"))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  @inline private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' |
         '[' | ']' | '{' | '}' | '-' => true
    case _ => false
  }

  def eval(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    var nTokens = 0L
    var nSubwords = 0L
    var nPunct = 0L
    var nNonWs = 0L
    var nZh = 0L
    var stopHits = 0L
    val langHits = new Array[Long](langWords.length)
    var fingerprint = 0L

    var i = 0
    var tokStart = -1
    var inAlnumRun = false
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      val ws = isWs(c)
      if (i < n && !ws) {
        nNonWs += 1
        if (isPunct(c)) nPunct += 1
        if (c >= '\u4e00' && c <= '\u9fff') nZh += 1
        if (isAlnum(c)) {
          if (!inAlnumRun) { nSubwords += 1; inAlnumRun = true }
        } else {
          nSubwords += 1 // standalone non-alnum, non-ws char
          inAlnumRun = false
        }
      } else inAlnumRun = false
      if (ws || i == n) {
        if (tokStart >= 0) {
          nTokens += 1
          val tok = s.substring(tokStart, i)
          val low = tok.toLowerCase
          if (enStop.contains(low)) stopHits += 1
          var li = 0
          while (li < langWords.length) {
            if (langWords(li)._2.contains(low)) langHits(li) += 1
            li += 1
          }
          val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          fingerprint = fingerprint * 1000003L + HashKernels.fnv1a(bytes, 0, bytes.length)
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }

    val meanTokLen = if (nTokens == 0) 0.0 else nNonWs.toDouble / nTokens
    val punctRatio = if (n == 0) 0.0 else nPunct.toDouble / n
    val stopRatio = if (nTokens == 0) 0.0 else stopHits.toDouble / nTokens

    // quality: same formula as Text.qualityScore
    val lenScore = math.min(n.toDouble / 200.0, 1.0)
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val tokScore = if (meanTokLen >= 3.0 && meanTokLen <= 10.0) 1.0 else 0.5
    val punctPenalty = if (punctRatio > 0.2) 0.5 else 1.0
    val quality = (lenScore * 0.4 + stopScore * 0.3 + tokScore * 0.3) * punctPenalty

    // lang id: argmax of marker hits (zh = han char count), lexicographic
    // ties, zero hits → "und"
    // iteration order (de,en,es,fr,zh) is lexicographic, so first-max
    // wins ties deterministically; zero hits → "und"
    var bestLang = "und"
    var bestHits = 0L
    val all = langWords.map(_._1) :+ "zh"
    val hits = langHits :+ nZh
    var li = 0
    while (li < all.length) {
      if (hits(li) > bestHits) { bestHits = hits(li); bestLang = all(li) }
      li += 1
    }

    InternalRow(n.toLong, nTokens, nSubwords, meanTokLen,
      punctRatio, stopRatio, quality, UTF8String.fromString(bestLang),
      fingerprint)
  }
}

/** One-pass repetition summary for the Gopher-style filters
  * (q_repetition): token/bigram/5-gram duplicate counts plus the most
  * frequent bigram, in O(tokens) per row with two hash maps. Replaces a
  * nested higher-order-function formulation (filter-inside-transform over
  * the bigram array) that was O(tokens²) in the INTERPRETED expression
  * path — Spark's array HOFs are CodegenFallback, and the top-bigram
  * struct was re-evaluated once per referencing output column, which
  * measured 307 s for 5k docs at sf0.1; this kernel does the same work in
  * milliseconds.
  *
  * Semantics pinned to the DuckDB oracle twin: tokens split on single
  * spaces (empties dropped), k-grams joined with one space and defined
  * only when n >= k, top bigram = max count with ties broken by the
  * lexicographically (UTF-8 byte order — Spark's string comparison)
  * smallest gram, no bigrams → ("", 0). */
object RepetitionKernel {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_g5", LongType, nullable = false),
    StructField("n_distinct_g5", LongType, nullable = false)))

  private def utf8Lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  def eval(u: UTF8String): InternalRow = {
    val s = u.toString
    // tokenize: split on single spaces, drop empties (split(text, " ")
    // + filter semantics)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    var start = -1
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (start >= 0) { toks.add(s.substring(start, i)); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    val nw = toks.size
    val words = new java.util.HashSet[String]()
    var w = 0
    while (w < nw) { words.add(toks.get(w)); w += 1 }

    // bigram counts + deterministic argmax (count desc, gram asc)
    var topGram = ""
    var topN = 0L
    if (nw >= 2) {
      val counts = new java.util.HashMap[String, Long]()
      var j = 0
      while (j < nw - 1) {
        val g = toks.get(j) + " " + toks.get(j + 1)
        counts.merge(g, 1L, (a, b) => a + b)
        j += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > topN || (c == topN && utf8Lt(e.getKey, topGram))) {
          topN = c; topGram = e.getKey
        }
      }
    }

    var ng5 = 0L
    var nd5 = 0L
    if (nw >= 5) {
      val g5 = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < nw - 4) {
        sb.setLength(0)
        var k = 0
        while (k < 5) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        g5.add(sb.toString)
        ng5 += 1
        j += 1
      }
      nd5 = g5.size.toLong
    }

    InternalRow(nw.toLong, words.size.toLong,
      UTF8String.fromString(topGram), topN, ng5, nd5)
  }
}

/** Struct of repetition statistics for a document (see RepetitionKernel). */
case class RepetitionSummary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionKernel.schema
  override protected def nullSafeEval(v: Any): Any =
    RepetitionKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.eval($c)")
  override protected def withNewChildInternal(c: Expression): RepetitionSummary = copy(c)
}

/** Struct of all text statistics for a document (see TextStatsKernel). */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStatsKernel.schema
  override protected def nullSafeEval(v: Any): Any =
    TextStatsKernel.eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.eval($c)")
  override protected def withNewChildInternal(c: Expression): TextStats = copy(c)
}
