package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates honor their error bounds; CSV PERMISSIVE mode
  * (reference: bronze_to_silver.py:57-64) nulls malformed fields instead
  * of failing the read.
  */
class AggregatesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("q38b: approx distinct within rsd, approx median within accuracy bound") {
    val r = Queries.q38bApproxAgg.fn(spark, "/root/testdata/sf0.01").head()
    val approxOrders = r.getAs[Long]("approx_orders").toDouble
    val exactOrders = r.getAs[Long]("exact_orders").toDouble
    assert(math.abs(approxOrders - exactOrders) / exactOrders < 0.05,
      s"HLL++ rsd=0.02 must land within 5%: $approxOrders vs $exactOrders")
    val approxMedian = r.getAs[Double]("approx_median")
    val exactMedian = r.getAs[Double]("exact_median")
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.01,
      s"approx median within 1%: $approxMedian vs $exactMedian")
  }

  test("CSV PERMISSIVE mode nulls unparseable rows, keeps the read alive") {
    val dir = Files.createTempDirectory("permissive")
    Files.writeString(dir.resolve("accounts.csv"),
      "Acc no,Date,Status\n123,01-jan-22,Active\n\"unclosed quote,oops\n456,02-feb-22,Active\n")
    val df = graft.sources.CsvSource.read(
      spark, dir.resolve("accounts.csv").toString, graft.banking.Schemas.accounts)
    val rows = df.collect()
    assert(rows.length >= 2, "parseable rows must survive a malformed neighbor")
    assert(rows.exists(_.getString(0) == "123"))
    assert(rows.exists(_.getString(0) == "456"))
  }
}
