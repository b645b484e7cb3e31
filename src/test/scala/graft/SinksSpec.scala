package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.sources.Sinks

/** Writer round-trips (the reference has no write path at all). */
class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graftsink").toString

  test("parquet round-trip with hive partitioning prunes on re-read") {
    val nation = Tables.load(spark, SparkFixture.sfDir, "nation")
    val out = tmp() + "/nation"
    Sinks.writeParquet(nation, out, partitionCols = Seq("n_regionkey"))
    val back = spark.read.parquet(out)
    assert(back.count() == 25)
    // partition pruning: only one directory scanned for one region
    val one = back.filter(col("n_regionkey") === 0)
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() == nation.filter(col("n_regionkey") === 0).count())
    assert(scan.contains("PartitionFilters"))
  }

  test("csv round-trip preserves data with header") {
    val region = Tables.load(spark, SparkFixture.sfDir, "region")
    val out = tmp() + "/region_csv"
    Sinks.writeCsv(region, out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.orderBy("r_regionkey").collect().map(_.getString(1)).toSeq ==
      region.orderBy("r_regionkey").collect().map(_.getString(1)).toSeq)
  }

  test("json round-trip") {
    val region = Tables.load(spark, SparkFixture.sfDir, "region")
    val out = tmp() + "/region_json"
    Sinks.writeJson(region, out)
    assert(spark.read.json(out).count() == 5)
  }
}
