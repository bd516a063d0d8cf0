package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Spark must be able to read every driver-generated testdata table,
  * including the nanosecond-timestamp `events` and float-array `embeddings`.
  */
class TestdataSmokeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("all testdata tables load and have rows") {
    Tables.all.foreach { name =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("events timestamps and embeddings arrays are usable") {
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sfDir, "events")
    e.printSchema()
    val r = e.select(col("ts").cast("date").as("d"), col("ts").cast("long").as("sec")).head()
    assert(r.getDate(0).toString == "2024-01-01")
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.printSchema()
    val dim = emb.selectExpr("size(embedding) as n").head().getInt(0)
    assert(dim == 64)
  }
}
