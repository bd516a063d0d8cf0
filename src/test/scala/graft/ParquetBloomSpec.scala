package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics
import graft.sources.{ParquetStats, Sinks}

/** NATIVE parquet row-group bloom filters ([[Sinks.writeWithBloomFilters]]
  * / [[ParquetStats.bloomFilterReport]]) — the in-file complement to the
  * manifest-based [[graft.sources.BloomSkip]] family.
  */
class ParquetBloomSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  // High-cardinality UNCLUSTERED keys: hash-ordered so min/max stats and
  // page indexes span the whole key range in every file (nothing prunes
  // by range), dictionary disabled so dictionary-page filtering cannot
  // stand in for the bloom — isolating the bloom's own contribution.
  private val n = 40000L
  private def keyed = spark.range(n)
    .select(format_string("k%07d", col("id")).as("key"), col("id").as("v"))
    .repartition(4, col("key"))

  private lazy val bloomDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pqbloom").toString + "/t"
    Sinks.writeWithBloomFilters(keyed, d, Map("key" -> n),
      extraOptions = Map("parquet.enable.dictionary" -> "false"))
    d
  }
  private lazy val plainDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pqplain").toString + "/t"
    keyed.write.mode("overwrite")
      .option("parquet.enable.dictionary", "false").parquet(d)
    d
  }

  // lexically INSIDE [k0000000, k0039999] but absent — range stats
  // cannot prune it; only a bloom (or a full decode) answers.
  private val absentKey = "k0012345x"

  test("bloomFilterReport: every row group of the bloom column carries a filter; control carries none") {
    val rep = ParquetStats.bloomFilterReport(spark, bloomDir)
      .where(col("column") === "key").collect()
    assert(rep.nonEmpty)
    assert(rep.forall(_.getAs[Boolean]("has_bloom")), "bloom missing from some row group")
    assert(rep.forall(_.getAs[Long]("bloom_bytes") > 0L))
    val other = ParquetStats.bloomFilterReport(spark, bloomDir)
      .where(col("column") === "v").collect()
    assert(other.forall(!_.getAs[Boolean]("has_bloom")), "bloom leaked onto an unrequested column")
    val ctl = ParquetStats.bloomFilterReport(spark, plainDir)
      .where(col("column") === "key").collect()
    assert(ctl.forall(!_.getAs[Boolean]("has_bloom")))
  }

  test("absent-key point lookup: bloom table decodes ZERO rows; plain table pays a full decode") {
    Metrics.register(spark)
    // collect() the SAME Dataset whose plan we read metrics from —
    // count() would execute a different QueryExecution and leave these
    // scan metrics untouched at zero.
    val qb = spark.read.parquet(bloomDir).where(col("key") === absentKey)
    assert(qb.collect().isEmpty)
    val sb = Metrics.scanReport(qb)
    assert(sb.map(_.filesRead).sum > 0L, "scan must have executed")
    assert(sb.map(_.rowsOutput).sum === 0L,
      s"bloom should skip every row group; decoded ${sb.map(_.rowsOutput).sum} rows")

    val qp = spark.read.parquet(plainDir).where(col("key") === absentKey)
    assert(qp.collect().isEmpty)
    val sp = Metrics.scanReport(qp)
    assert(sp.map(_.rowsOutput).sum === n,
      s"without a bloom the unclustered table must decode everything; saw ${sp.map(_.rowsOutput).sum}")
  }

  test("no false negatives: present keys come back intact through the bloom table") {
    val hits = spark.read.parquet(bloomDir)
      .where(col("key").isin("k0000000", "k0012345", "k0039999"))
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("v")).toMap
    assert(hits === Map("k0000000" -> 0L, "k0012345" -> 12345L, "k0039999" -> 39999L))
  }
}
