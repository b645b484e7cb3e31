package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftx.Bridge
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftExtensions
import graft.functions.HashKernels
import org.apache.spark.unsafe.types.UTF8String

/** GraftExtensions wires the native functions into a session's function
  * registry (the spark.sql.extensions integration point). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("injected functions resolve and evaluate in SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Bridge.registerInjectedFunctions(ext, spark.sessionState.functionRegistry)

    val r = spark.sql(
      """SELECT simhash64('a b c') AS sh,
               rolling_fingerprint('x y') AS fp,
               vec_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c,
               text_stats('the cat sat').n_tokens AS nt""").collect()(0)
    assert(r.getLong(0) == HashKernels.simhash64(UTF8String.fromString("a b c")))
    assert(r.getLong(1) == HashKernels.rollingFingerprint(UTF8String.fromString("x y")))
    assert(r.getDouble(2) == 1.0)
    assert(r.getLong(3) == 3L)
  }

  test("parameterized kernels take literal int widths in SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Bridge.registerInjectedFunctions(ext, spark.sessionState.functionRegistry)

    val r = spark.sql(
      """SELECT size(char_shingle_hashes('abcdef', 3)) AS n_shingles,
               size(deletion_variant_hashes('abc', 1)) AS n_variants,
               sorted_intersect(char_shingle_hashes('abcdef', 3),
                                char_shingle_hashes('bcdefg', 3)) AS shared,
               size(minhash_bands(minhash_sig('the quick brown fox'), 16))
                 AS n_bands,
               size(span_gram_hashes('a b c d', 2)) AS n_spans,
               zorder2(3, 1) AS z,
               tokenize_greedy('order', array('the','er','o','r','d')) AS tok
        """).collect()(0)
    assert(r.getInt(0) == 4)  // 6 - 3 + 1 distinct windows
    assert(r.getInt(1) == 4)  // 'abc' + 3 single deletions
    assert(r.getInt(2) == 3)  // bcd, cde, def shared
    assert(r.getInt(3) == 16)
    assert(r.getInt(4) == 3)        // "a b", "b c", "c d"
    assert(r.getLong(5) == 7L)      // interleave(3=0b11, 1=0b1) = 0b111
    assert(r.getString(6) == "o r d er")
    // a non-literal width is a clear error, not a silent default
    val e = intercept[Exception](spark.sql(
      "SELECT char_shingle_hashes('x', length('ab'))").collect())
    assert(e.getMessage.contains("literal INT"))
  }
}
