package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type-coercion semantics, mirroring the reference's Signature tests
  * (ref: src/expression/coercion.rs:186-254): comparisons widen numerics
  * and return Boolean, And/Or require Boolean, arithmetic derives result
  * types. Spark's ImplicitTypeCasts is the analog; deltas from the
  * reference (int division) are pinned down here on purpose. */
class CoercionSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def df = Seq((1, 2L, 1.5, true)).toDF("i32", "i64", "f64", "b")

  test("arithmetic widens int32 + int64 -> int64") {
    val r = df.select((col("i32") + col("i64")).as("s"))
    assert(r.schema("s").dataType == LongType)
    assert(r.collect()(0).getLong(0) == 3L)
  }

  test("comparison coerces numeric types and returns boolean (ref coercion.rs:48-55)") {
    val r = df.select((col("i32") < col("f64")).as("c"), (col("i64") >= col("i32")).as("d"))
    assert(r.schema("c").dataType == BooleanType)
    assert(r.collect()(0).getBoolean(0) && r.collect()(0).getBoolean(1))
  }

  test("and/or require boolean inputs (ref coercion.rs:56-65)") {
    intercept[Exception] {
      df.select(col("i32") && col("b")).collect()
    }
  }

  test("int division returns double in Spark (delta vs reference int-div, SURVEY §7.4)") {
    val r = df.select((col("i32") / col("i64")).as("q"))
    assert(r.schema("q").dataType == DoubleType)
    assert(r.collect()(0).getDouble(0) == 0.5)
  }

  test("literal coercion: int literal compares against double column") {
    assert(df.filter(col("f64") > 1).count() == 1)
    assert(df.filter(col("f64") > lit("1.4").cast(DoubleType)).count() == 1)
  }
}
