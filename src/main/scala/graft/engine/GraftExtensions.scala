package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session extension registering the engine's native functions for SQL —
  * the `SparkSessionExtensions` integration point (SURVEY.md §7.3). Any
  * session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.engine.GraftExtensions`) gets
  * `simhash64`, `rolling_fingerprint`, `vec_dot/norm/cosine`,
  * `minhash_sig`, `word_ngrams`, `text_stats` as first-class SQL functions
  * — no per-session registration call needed.
  *
  * Also injects the engine's one custom optimizer rule,
  * [[graft.plans.PreAggGroupingSets]] (pre-aggregation below grouping-set
  * expansion — a scale rewrite built-in Catalyst does not perform).
  * Built-in Catalyst covers the reference's entire rewrite set (SURVEY.md
  * §4); everything further stays at the expression / typed-aggregator /
  * injected-rule level — no custom planner strategies needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, null, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))

    inject("rolling_fingerprint", es => RollingFingerprint(es.head))
    inject("fnv64", es => Fnv64(es.head))
    inject("simhash64", es => SimHash64(es.head))
    inject("vec_dot", es => FloatVecDot(es(0), es(1)))
    inject("vec_norm", es => FloatVecNorm(es.head))
    inject("vec_cosine", es => FloatVecCosine(es(0), es(1)))
    inject("nearest_centroid", es => NearestCentroid(es(0), es(1)))
    // parameterized kernels take their widths as literal int arguments
    def intArg(e: Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal INT parameter, got: $other")
    }
    inject("minhash_sig", es => MinHashSig(es.head, 64, 5, 42L))
    inject("word_ngrams", es => WordNGrams(es.head, 3))
    inject("text_stats", es => TextStats(es.head))
    inject("strip_accents", es => StripAccents(es.head))
    inject("dedup_lines", es => DedupLines(es.head))
    inject("sorted_intersect", es => SortedLongIntersect(es(0), es(1)))
    inject("sig_agree", es => SigAgree(es(0), es(1)))
    inject("char_shingle_hashes",
      es => CharShingleHashes(es(0), intArg(es(1), "char_shingle_hashes")))
    inject("deletion_variant_hashes",
      es => DeletionVariantHashes(es(0), intArg(es(1), "deletion_variant_hashes")))
    inject("word_ngram_hashes",
      es => WordNGramHashes(es(0), intArg(es(1), "word_ngram_hashes")))
    inject("minhash_bands",
      es => MinHashBandHashes(es(0), intArg(es(1), "minhash_bands")))
    inject("span_gram_hashes",
      es => SpanGramHashes(es(0), intArg(es(1), "span_gram_hashes")))
    inject("zorder2", es => ZOrder2(es(0), es(1)))
    inject("tokenize_greedy", es => GreedyTokenize(es(0), es(1)))

    ext.injectOptimizerRule(_ => graft.plans.PreAggGroupingSets)
  }
}
