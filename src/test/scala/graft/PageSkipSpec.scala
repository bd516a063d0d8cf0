package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics
import graft.sources.Sinks

/** Parquet PAGE-level column-index skipping under [[Sinks.writeSorted]]:
  * a sorted layout lets the reader decode only the pages whose min/max
  * straddle the predicate, instead of every page in each surviving row
  * group. This is the skipping tier below [[graft.sources.ZoneMaps]]
  * (files) and row-group stats — and the one only a sorted layout
  * unlocks.
  */
class PageSkipSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val n = 400000L
  private def data = spark.range(n)
    .select(col("id"), md5(col("id").cast("string")).as("pad"))

  private lazy val sortedDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pageskip_s").toString + "/t"
    Sinks.writeSorted(data, d, Seq("id"), numFiles = 4)
    d
  }
  private lazy val unsortedDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pageskip_u").toString + "/t"
    // same rows, laid out in content-hash order: every page's id range
    // spans ~the whole domain, so nothing below the file level can skip
    data.repartition(4).sortWithinPartitions("pad")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("narrow range on the sorted layout decodes pages, not row groups") {
    Metrics.register(spark)
    val q = spark.read.parquet(sortedDir)
      .where(col("id") >= 123000L && col("id") < 123100L)
    val hits = q.collect().map(_.getLong(0)).sorted // same plan measured below
    assert(hits.toSeq === (123000L until 123100L).toSeq, "pruning must not drop matches")
    val decoded = Metrics.scanReport(q).map(_.rowsOutput).sum
    // parquet's default page row limit is 20k: a 100-row range should
    // decode a handful of pages, orders of magnitude under the corpus
    assert(decoded <= 60000L, s"sorted layout decoded $decoded rows for a 100-row range")
    assert(decoded < n / 5, "must beat a full decode by a wide margin")

    val qu = spark.read.parquet(unsortedDir)
      .where(col("id") >= 123000L && col("id") < 123100L)
    assert(qu.collect().length === 100)
    val decodedU = Metrics.scanReport(qu).map(_.rowsOutput).sum
    assert(decodedU === n,
      s"hash-ordered layout must pay the full decode (saw $decodedU) — the delta IS the page index")
  }

  test("file-level ranges stack on top: an out-of-range predicate decodes nothing") {
    Metrics.register(spark)
    val q = spark.read.parquet(sortedDir).where(col("id") === lit(n + 5))
    assert(q.collect().isEmpty)
    assert(Metrics.scanReport(q).map(_.rowsOutput).sum === 0L,
      "row-group min/max alone should kill an out-of-domain probe")
  }
}
