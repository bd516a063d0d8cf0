package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcSource, Sinks}

class JdbcSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Uppercase, unquoted identifiers: Derby stores unquoted DDL names
  // uppercase, and uppercase round-trips whether or not a layer quotes.
  private lazy val cfg = {
    val dbDir = Files.createTempDirectory("jdbc-src").toString + "/db"
    val c = Sinks.JdbcConfig(
      url = s"jdbc:derby:$dbDir;create=true",
      user = "app", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      batchSize = 100)
    Class.forName(c.driver)
    val conn = java.sql.DriverManager.getConnection(c.url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE ORDERS_SRC (WM BIGINT NOT NULL, PAYLOAD VARCHAR(20))")
      (1 to 50).foreach(i =>
        st.execute(s"INSERT INTO ORDERS_SRC VALUES ($i, 'row_$i')"))
    } finally conn.close()
    c
  }

  test("full read fans out over watermark ranges and returns every row") {
    val df = JdbcSource.read(spark, cfg, "ORDERS_SRC", "WM", numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4, "range read must fan out")
    assert(df.select("WM").as[Long].collect().sorted.toSeq === (1L to 50L))
  }

  test("incremental pull ships the watermark predicate to the database") {
    val inc = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", lastSeen = 40L)
    assert(inc.select("WM").as[Long].collect().sorted.toSeq === (41L to 50L))
  }

  test("no new rows → empty frame with the source schema, no fan-out") {
    val inc = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", lastSeen = 50L)
    assert(inc.isEmpty)
    assert(inc.columns.map(_.toUpperCase).toSeq === Seq("WM", "PAYLOAD"))
  }

  test("bootstrap from Long.MinValue reads everything") {
    val inc = JdbcSource.readIncremental(
      spark, cfg, "ORDERS_SRC", "WM", lastSeen = Long.MinValue)
    assert(inc.count() === 50L)
  }

  test("nextWatermark advances on landed rows and holds on empty pulls") {
    val inc = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", lastSeen = 40L)
    assert(JdbcSource.nextWatermark(inc, "WM", 40L) === 50L)
    val none = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", lastSeen = 50L)
    assert(JdbcSource.nextWatermark(none, "WM", 50L) === 50L)
  }

  test("crash re-pull composes with CdcMerge into exactly-once (the documented loop)") {
    // Simulate the documented failure: a pull lands but its watermark
    // checkpoint is lost, so the SAME rows are pulled again. The keyed
    // merge must absorb the replay — snapshot identical to one delivery.
    val first = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", lastSeen = 40L)
    val snapshot = graft.operators.CdcMerge.mergeFullHistory(None, first, Seq("WM"))
    val replay = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", lastSeen = 40L)
    val after = graft.operators.CdcMerge.mergeFullHistory(Some(snapshot), replay, Seq("WM"))
    assert(after.count() === 10L, "replayed rows must not duplicate")
    assert(after.select("WM").as[Long].collect().sorted.toSeq === (41L to 50L))
  }

  test("spliced identifiers are validated — injection shapes fail before any SQL") {
    Seq(
      "ORDERS_SRC; DROP TABLE ORDERS_SRC",
      "WM > 0 OR 1=1",
      "T (SELECT 1)",
      "") foreach { bad =>
      intercept[IllegalArgumentException] {
        JdbcSource.readIncremental(spark, cfg, bad, "WM", 0L)
      }
      intercept[IllegalArgumentException] {
        JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", bad, 0L)
      }
      intercept[IllegalArgumentException] {
        JdbcSource.read(spark, cfg, bad, "WM", 2)
      }
    }
    // legitimate shapes still pass: schema-qualified and quoted names
    JdbcSource.requireIdentifier("APP.ORDERS_SRC", "table")
    JdbcSource.requireIdentifier("\"Mixed Case\".\"col name\"", "col")
  }

  test("the incremental loop converges: successive pulls partition the table") {
    var seen = Vector.empty[Long]
    var wm = Long.MinValue
    var pulls = 0
    var go = true
    while (go && pulls < 10) {
      val batch = JdbcSource.readIncremental(spark, cfg, "ORDERS_SRC", "WM", wm, 2)
      val rows = batch.select("WM").as[Long].collect().sorted
      if (rows.isEmpty) go = false
      else {
        seen ++= rows
        wm = JdbcSource.nextWatermark(batch, "WM", wm)
        pulls += 1
      }
    }
    assert(seen === (1L to 50L).toVector, "each row exactly once across pulls")
    assert(pulls === 1, "no rows inserted between pulls → one non-empty pull")
  }
}
