package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
  def simhash64(c: Column): Column = col(SimHash64(ex(c)))
  def vec_dot(a: Column, b: Column): Column = col(FloatVecDot(ex(a), ex(b)))
  def vec_norm(c: Column): Column = col(FloatVecNorm(ex(c)))
  def vec_cosine(a: Column, b: Column): Column = col(FloatVecCosine(ex(a), ex(b)))

  /** Make the functions usable from `spark.sql` text as well. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_fingerprint",
      es => RollingFingerprint(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot", es => FloatVecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm", es => FloatVecNorm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine", es => FloatVecCosine(es(0), es(1)), "scala_udf")
  }
}
