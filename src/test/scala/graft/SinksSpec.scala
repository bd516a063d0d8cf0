package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

class SinksSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("writePartitioned: one file per partition value, hive layout, roundtrip") {
    val dir = Files.createTempDirectory("sink-part")
    val df = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyyMM").as("p_ym"))
    Sinks.writePartitioned(df, dir.toString + "/t", Seq("p_ym"))
    val partDirs = new java.io.File(dir.toString + "/t").listFiles()
      .filter(_.getName.startsWith("p_ym=")).toSeq
    assert(partDirs.nonEmpty)
    partDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName}: repartition-by-partition-cols must yield 1 file, got $files")
    }
    val back = spark.read.parquet(dir.toString + "/t")
    assert(back.count() == df.count())
    assert(back.columns.toSet == df.columns.toSet)
  }

  test("single-file exports: exactly one data file, header round-trip") {
    val dir = Files.createTempDirectory("sink-export")
    val df = Tables.load(spark, "/root/testdata/sf0.001", "region")
    Sinks.exportSingleCsv(df, dir.toString + "/csv")
    val csvFiles = new java.io.File(dir.toString + "/csv").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(csvFiles.length == 1, "coalesce(1) must produce a single csv")
    val back = spark.read.option("header", "true").csv(dir.toString + "/csv")
    assert(back.count() == df.count())
    Sinks.exportSingleParquet(df, dir.toString + "/pq")
    assert(spark.read.parquet(dir.toString + "/pq").count() == df.count())
  }
}
