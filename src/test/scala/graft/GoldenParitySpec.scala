package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.banking.GoldPipeline

/** Parity against the reference's OWN committed golden outputs: run the
  * full medallion pipeline on the reference's bronze sample CSVs
  * (reference: data/bronze_samples/) in faithful-nulls mode and
  * compare every gold table to the committed exports
  * (reference: exports/gold_csv/ — SURVEY.md §5.3).
  *
  * Surrogate keys are excluded (the reference's monotonically_increasing_id
  * is partition-encoded and non-deterministic — SURVEY.md §7.4#2); the
  * fact↔dim SK relationship is compared structurally instead.
  *
  * This exercises the reference's nastiest semantics end-to-end: the
  * null-unsafe change predicate (person Z's 04-01 id-only change row is
  * dropped because name and id are both NULL-compared), lowercase dd-MMM-yy
  * dates, and the 9999-12-31 open sentinel.
  */
class GoldenParitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val refBronze = "/root/reference/data/bronze_samples"
  private val refGold = "/root/reference/exports/gold_csv"

  private def available: Boolean =
    Files.isDirectory(Paths.get(refBronze)) && Files.isDirectory(Paths.get(refGold))

  private def golden(name: String): DataFrame =
    spark.read.option("header", "true").csv(s"$refGold/$name.csv")

  private lazy val gold: GoldPipeline.GoldTables = {
    val silver = Files.createTempDirectory("golden-silver")
    GoldPipeline.bronzeToSilver(spark, refBronze, silver.toString)
    GoldPipeline.silverToGold(spark, silver.toString, faithfulNulls = true)
  }

  private def asSet(df: DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(v => if (v == null) null else v.toString)).map(_.toList: Seq[String]).toSet

  test("dim_account matches the committed golden export (modulo SK)") {
    assume(available)
    val mine = asSet(gold.dimAccount.select(
      col("acc_no"), col("status"), col("type"),
      col("effective_start_date").cast("string"),
      col("effective_end_date").cast("string"),
      col("is_current").cast("string")))
    val ref = asSet(golden("dim_account").select(
      col("acc_no"), col("status"), col("type"),
      col("effective_start_date"), col("effective_end_date"),
      // reference CSV exports postgres-style t/f booleans
      when(col("is_current") === "t", "true").otherwise("false")))
    assert(mine == ref)
  }

  test("dim_person matches, including the null-unsafe dropped 04-01 row") {
    assume(available)
    val mine = asSet(gold.dimPerson.select(
      col("person"), col("name"), col("id"),
      col("effective_start_date").cast("string"),
      col("effective_end_date").cast("string"),
      col("is_current").cast("string")))
    val ref = asSet(golden("dim_person").select(
      col("person"), col("name"), col("id"),
      col("effective_start_date"), col("effective_end_date"),
      when(col("is_current") === "t", "true").otherwise("false")))
    assert(mine == ref)
    // the id-only change on 2022-04-01 must NOT create a version (faithful mode)
    assert(!mine.exists(_.contains("2022-04-01")))
  }

  test("dim_date and bridge match") {
    assume(available)
    assert(asSet(gold.dimDate.select(col("dt").cast("string"))) == asSet(golden("dim_date")))
    assert(asSet(gold.bridgeAccountPerson) == asSet(golden("bridge_account_person")))
  }

  test("DWH round-trip: gold loaded to Derby and re-read still matches the golden exports") {
    assume(available)
    // The last inch of end-to-end parity: the reference's production act
    // is five JDBC loads (reference: gold_sql_to_postgres.py:199-203) and
    // its golden CSVs were exported from the LOADED warehouse — so parity
    // should hold against what comes back OUT of the DWH, not only the
    // in-Spark frames (types squeeze through JDBC DDL on the way).
    val dbDir = Files.createTempDirectory("golden-dwh").toString + "/db"
    val cfg = graft.sources.Sinks.JdbcConfig(
      url = s"jdbc:derby:$dbDir;create=true",
      user = "app",
      password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      batchSize = 100)
    GoldPipeline.loadToDwh(gold, cfg, numPartitions = 2)
    def readBack(table: String): DataFrame = spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", table)
      .option("driver", cfg.driver).load()

    // dims + bridge on business keys/intervals (SK excluded as above)
    val dimAcc = asSet(readBack("dim_account").select(
      col("acc_no"), col("status"), col("type"),
      col("effective_start_date").cast("string"),
      col("effective_end_date").cast("string"),
      col("is_current").cast("string")))
    val refAcc = asSet(golden("dim_account").select(
      col("acc_no"), col("status"), col("type"),
      col("effective_start_date"), col("effective_end_date"),
      when(col("is_current") === "t", "true").otherwise("false")))
    assert(dimAcc == refAcc, "dim_account must survive the DWH round-trip")

    val dimPer = asSet(readBack("dim_person").select(
      col("person"), col("name"), col("id"),
      col("effective_start_date").cast("string"),
      col("effective_end_date").cast("string"),
      col("is_current").cast("string")))
    val refPer = asSet(golden("dim_person").select(
      col("person"), col("name"), col("id"),
      col("effective_start_date"), col("effective_end_date"),
      when(col("is_current") === "t", "true").otherwise("false")))
    assert(dimPer == refPer, "dim_person must survive the DWH round-trip")

    assert(asSet(readBack("dim_date").select(col("dt").cast("string")))
      == asSet(golden("dim_date")))
    assert(asSet(readBack("bridge_account_person")) == asSet(golden("bridge_account_person")))

    // fact structurally, with the join resolved INSIDE the warehouse copy
    val mine = asSet(readBack("fact_account_snapshot").alias("f")
      .join(readBack("dim_account").alias("d"), col("f.account_sk") === col("d.account_sk"))
      .select(
        col("f.snapshot_date").cast("string"),
        col("f.acc_no"),
        col("d.effective_start_date").cast("string")))
    val ref = asSet(golden("fact_account_snapshot").alias("f")
      .join(golden("dim_account").alias("d"), col("f.account_sk") === col("d.account_sk"))
      .select(col("f.snapshot_date"), col("f.acc_no"), col("d.effective_start_date")))
    assert(mine == ref, "fact↔dim linkage must survive the DWH round-trip")
  }

  test("fact matches structurally: same (snapshot, account) → same dim version") {
    assume(available)
    val mine = asSet(gold.factAccountSnapshot.alias("f")
      .join(gold.dimAccount.alias("d"), col("f.account_sk") === col("d.account_sk"))
      .select(
        col("f.snapshot_date").cast("string"),
        col("f.acc_no"),
        col("d.effective_start_date").cast("string")))
    val ref = asSet(golden("fact_account_snapshot").alias("f")
      .join(golden("dim_account").alias("d"), col("f.account_sk") === col("d.account_sk"))
      .select(col("f.snapshot_date"), col("f.acc_no"), col("d.effective_start_date")))
    assert(mine == ref)
  }
}
