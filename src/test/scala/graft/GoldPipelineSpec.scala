package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.banking.GoldPipeline

/** End-to-end medallion run over the reference's bronze fixtures
  * (FIXTURES.md §1), including the second-run CDC merge that reads and
  * rewrites the same silver path — the case a plain overwrite cannot do.
  */
class GoldPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def writeFixtures(dir: java.nio.file.Path): Unit = {
    def put(name: String, content: String): Unit =
      Files.writeString(dir.resolve(name), content)
    put("accounts.csv",
      "Acc no,Date,Status\n123,01-jan-22,Active\n456,01-feb-22,Active\n123,01-mar-22,In Active\n")
    put("account_details.csv",
      "Acc no,Date,type\n123,01-jan-22,CC\n456,01-feb-22,Loan\n123,01-mar-22,CC\n")
    put("person.csv",
      "Acc no,Person\n123,X\n456,Y\n456,Z\n123,X\n")
    put("person_profile.csv",
      "Person,Name,Date\nX,Adam,01-jan-22\nY,Mona,01-feb-22\nZ,Rana,01-feb-22\nZ,Rana Ali,01-apr-22\n")
    put("person_iden.csv",
      "Person,Id,Date\nX,ID1,01-jan-22\nY,ID2,01-feb-22\nZ,ID3,01-feb-22\nZ,ID4,01-apr-22\n")
  }

  test("bronze→silver is idempotent: the second run merges over its own output") {
    val bronze = Files.createTempDirectory("graft-bronze")
    val silver = Files.createTempDirectory("graft-silver")
    writeFixtures(bronze)

    GoldPipeline.bronzeToSilver(spark, bronze.toString, silver.toString)
    val firstCounts = graft.banking.Ingest.entities.map { e =>
      e.name -> spark.read.parquet(s"$silver/${e.name}").count()
    }.toMap
    assert(firstCounts("accounts") == 3)
    assert(firstCounts("person") == 3, "duplicate (123,X) must dedup")

    // Second run: reads existing silver, unions fresh bronze, rewrites the
    // SAME path. Without the staging-and-swap sink this throws
    // AnalysisException("Cannot overwrite a path that is also being read from").
    GoldPipeline.bronzeToSilver(spark, bronze.toString, silver.toString)
    graft.banking.Ingest.entities.foreach { e =>
      val again = spark.read.parquet(s"$silver/${e.name}").count()
      assert(again == firstCounts(e.name), s"${e.name}: second merge changed row count")
    }
  }

  test("silver→gold builds the star schema with reference semantics") {
    val bronze = Files.createTempDirectory("graft-bronze2")
    val silver = Files.createTempDirectory("graft-silver2")
    writeFixtures(bronze)
    GoldPipeline.bronzeToSilver(spark, bronze.toString, silver.toString)
    val gold = GoldPipeline.silverToGold(spark, silver.toString)

    // dim_account: 123 has Active → In Active (2 versions), 456 has 1.
    val da = gold.dimAccount.orderBy("acc_no", "effective_start_date").collect()
    assert(da.length == 3)
    assert(da(0).getAs[String]("status") == "Active" && !da(0).getAs[Boolean]("is_current"))
    assert(da(0).getAs[java.sql.Date]("effective_end_date").toString == "2022-02-28")
    assert(da(1).getAs[String]("status") == "In Active" && da(1).getAs[Boolean]("is_current"))

    // dim_person: X(1), Y(1), Z(2: Rana/ID3 → Rana Ali/ID4).
    assert(gold.dimPerson.count() == 4)
    val z = gold.dimPerson.where(col("person") === "Z")
      .orderBy("effective_start_date").collect()
    assert(z.map(_.getAs[String]("name")).toSeq == Seq("Rana", "Rana Ali"))

    // bridge: (123,X), (456,Y), (456,Z); dim_date: 4 distinct dates.
    assert(gold.bridgeAccountPerson.count() == 3)
    assert(gold.dimDate.count() == 4)

    // fact: one row per distinct (snapshot_date, acc_no), each with an SK.
    val fact = gold.factAccountSnapshot.collect()
    assert(fact.length == 3)
    assert(fact.forall(r => !r.isNullAt(2)), "every snapshot resolves a dim version")
  }

  test("streamed silver feeds the same gold build: batch and streaming are one path") {
    // Build silver twice — accounts ingested as a STREAM (micro-batched
    // through cdcMergeStream, out of order and with a re-delivery) vs the
    // plain batch path — and assert silverToGold produces the identical
    // dim_account from both. This is the architecture claim: one merge +
    // one gold build, whatever the ingestion mode.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._

    val bronzeB = Files.createTempDirectory("one-path-bronze")
    val silverBatch = Files.createTempDirectory("one-path-silver-b")
    val silverStream = Files.createTempDirectory("one-path-silver-s")
    writeFixtures(bronzeB)
    GoldPipeline.bronzeToSilver(spark, bronzeB.toString, silverBatch.toString)

    // stream the accounts entity into the OTHER silver; copy the rest
    graft.banking.Ingest.entities.filterNot(_.name == "accounts").foreach { e =>
      spark.read.parquet(s"$silverBatch/${e.name}")
        .write.parquet(s"$silverStream/${e.name}")
    }
    val input = MemoryStream[(String, String, String)]
    val accounts = input.toDF().toDF("acc_no", "raw_date", "status")
      .select(col("acc_no"), to_date(col("raw_date")).as("date"), col("status"))
      .withColumn("p_ym", date_format(col("date"), "yyyyMM"))
    val q = graft.streaming.Streams.cdcMergeStream(
      accounts, s"$silverStream/accounts",
      mergeKeys = Seq("acc_no", "date", "status"), partitionCols = Seq("p_ym"))
    try {
      input.addData(("123", "2022-03-01", "In Active")) // out of order first
      q.processAllAvailable()
      input.addData(("123", "2022-01-01", "Active"), ("456", "2022-02-01", "Active"))
      q.processAllAvailable()
      input.addData(("456", "2022-02-01", "Active")) // cross-batch re-delivery
      q.processAllAvailable()
    } finally q.stop()

    def dimOf(silver: java.nio.file.Path) =
      GoldPipeline.silverToGold(spark, silver.toString).dimAccount
        .select("acc_no", "status", "type", "effective_start_date",
          "effective_end_date", "is_current")
        .orderBy("acc_no", "effective_start_date")
        .collect().map(_.toSeq).toSeq
    assert(dimOf(silverStream) == dimOf(silverBatch),
      "gold from streamed silver must equal gold from batch silver")
  }

  test("gold→DWH loads all five tables end-to-end (embedded Derby)") {
    // The reference's actual production act: five sequential JDBC bulk
    // loads (gold_sql_to_postgres.py:199-203). Full chain here: bronze
    // fixtures → silver CDC merge → star schema → Derby → read back.
    val bronze = Files.createTempDirectory("graft-bronze3")
    val silver = Files.createTempDirectory("graft-silver3")
    writeFixtures(bronze)
    GoldPipeline.bronzeToSilver(spark, bronze.toString, silver.toString)
    val gold = GoldPipeline.silverToGold(spark, silver.toString)

    val dbDir = Files.createTempDirectory("graft-dwh").toString + "/db"
    val cfg = graft.sources.Sinks.JdbcConfig(
      url = s"jdbc:derby:$dbDir;create=true",
      user = "app",
      password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      batchSize = 100)

    GoldPipeline.loadToDwh(gold, cfg, numPartitions = 2)

    def readBack(table: String) = spark.read.format("jdbc")
      .option("url", cfg.url).option("dbtable", table)
      .option("driver", cfg.driver).load()

    // Every table arrived with the exact row count the gold frames hold.
    GoldPipeline.dwhTables(gold).foreach { case (name, df) =>
      assert(readBack(name).count() == df.count(), s"$name: DWH row count mismatch")
    }

    // Keys survive the trip: the fact's surrogate keys must all resolve
    // against the loaded dim_account (referential integrity in the DWH,
    // not just in Spark).
    val dimSks = readBack("dim_account").select("account_sk")
      .collect().map(_.getLong(0)).toSet
    val factSks = readBack("fact_account_snapshot").select("account_sk")
      .collect().map(_.getLong(0)).toSet
    assert(factSks.nonEmpty && factSks.subsetOf(dimSks),
      "every loaded fact SK must exist in the loaded dim")

    // SCD2 shape survives: exactly one current version per account.
    val current = readBack("dim_account").where(col("is_current"))
      .groupBy("acc_no").count().collect()
    assert(current.forall(_.getLong(1) == 1L), "one is_current row per acc_no")

    // Reload is idempotent (nightly full reload): same counts second time.
    GoldPipeline.loadToDwh(gold, cfg, numPartitions = 2)
    GoldPipeline.dwhTables(gold).foreach { case (name, df) =>
      assert(readBack(name).count() == df.count(), s"$name: reload must replace, not append")
    }
  }

  test("Postgres dialect contract: option map and gold DDL pinned to the reference") {
    // No live Postgres exists in this sandbox; the reference's JDBC
    // contract (gold_sql_to_postgres.py:31-44,199-203) is pinned at the
    // two seams that fully determine the server-side behavior: the exact
    // option map handed to Spark's JDBC writer, and the PostgresDialect
    // DDL Spark would issue for each gold table.
    val cfg = graft.sources.Sinks.JdbcConfig(
      url = "jdbc:postgresql://postgres:5432/dwh",
      user = "pguser",
      password = "pgpass")
    assert(graft.sources.Sinks.jdbcOptions(cfg, "gold.dim_account", 16) == Map(
      "url" -> "jdbc:postgresql://postgres:5432/dwh",
      "dbtable" -> "gold.dim_account",
      "user" -> "pguser",
      "password" -> "pgpass",
      "driver" -> "org.postgresql.Driver",
      "truncate" -> "true",
      "batchsize" -> "20000",
      "stringtype" -> "unspecified",
      "numPartitions" -> "16"))
    // Postgres-only properties must NOT leak to other drivers (Derby tests)
    val derby = cfg.copy(url = "jdbc:derby:/tmp/x", driver = "org.apache.derby.jdbc.EmbeddedDriver")
    assert(!graft.sources.Sinks.jdbcOptions(derby, "T", 2).contains("stringtype"))
    // per-table writer parallelism matches the reference's five load calls
    assert(GoldPipeline.DwhPartitions == Map(
      "dim_account" -> 16, "dim_person" -> 16, "bridge_account_person" -> 8,
      "dim_date" -> 8, "fact_account_snapshot" -> 16))

    val bronze = Files.createTempDirectory("graft-bronze4")
    val silver = Files.createTempDirectory("graft-silver4")
    writeFixtures(bronze)
    GoldPipeline.bronzeToSilver(spark, bronze.toString, silver.toString)
    val gold = GoldPipeline.silverToGold(spark, silver.toString)
    val ddl = GoldPipeline.postgresGoldDdl(gold).toMap
    assert(ddl.keySet == GoldPipeline.DwhPartitions.keySet)
    ddl.values.foreach(s => assert(s.startsWith("CREATE TABLE gold."), s))
    // the SCD2 dim's shape through Spark's own PostgresDialect mapping:
    // surrogate key BIGINT, attributes TEXT, validity window DATE, flag BOOLEAN
    val dim = ddl("dim_account")
    Seq("\"account_sk\" BIGINT", "\"acc_no\" TEXT", "\"status\" TEXT",
      "\"type\" TEXT", "\"effective_start_date\" DATE",
      "\"effective_end_date\" DATE", "\"is_current\" BOOLEAN")
      .foreach(f => assert(dim.contains(f), s"dim_account DDL missing `$f`:\n$dim"))
    val fact = ddl("fact_account_snapshot")
    Seq("\"snapshot_date\" DATE", "\"acc_no\" TEXT", "\"account_sk\" BIGINT")
      .foreach(f => assert(fact.contains(f), s"fact DDL missing `$f`:\n$fact"))
  }
}
