package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pseudonym: JDK-verified digests, NULL-preserving, join-consistent") {
    val df = Seq(
      (1L, "alice@example.com"),
      (2L, "bob@example.com"),
      (3L, null.asInstanceOf[String]),
      (4L, "alice@example.com")).toDF("id", "email")
    val got = Privacy.pseudonymize(df, Seq("email"), salt = "s3cret")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some(sha256Hex("s3cret" + "alice@example.com")))
    assert(got(2L) === Some(sha256Hex("s3cret" + "bob@example.com")))
    assert(got(3L) === None, "NULL must stay NULL, not hash to a shared token")
    assert(got(1L) === got(4L), "equal values must map to equal tokens (joins survive)")
    assert(got(1L) !== got(2L))
  }

  test("pseudonymize: different salt breaks linkage; untouched columns ride through") {
    val df = Seq((1L, "k1", 10.5)).toDF("id", "key", "score")
    val a = Privacy.pseudonymize(df, Seq("key"), "saltA").head()
    val b = Privacy.pseudonymize(df, Seq("key"), "saltB").head()
    assert(a.getString(1) !== b.getString(1))
    assert(a.getLong(0) === 1L && a.getDouble(2) === 10.5)
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(df, Seq("nope"), "s")
    }
  }

  test("corpusChecksum: hand-computed on two rows; NULL distinct from the string 'NULL'") {
    def h(key: String): Long = {
      val md5 = MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(12), 16)
    }
    val df = Seq((1L, "aa"), (2L, null.asInstanceOf[String])).toDF("id", "s")
    val row = Privacy.corpusChecksum(df, Seq("id", "s")).head()
    assert(row.getLong(0) === 2L)
    val expected = BigDecimal(h("1\u0001aa")) + BigDecimal(h("2\u0001\u0002NULL"))
    assert(BigDecimal(row.getDecimal(1)) === expected)
    // a literal "NULL" string must checksum differently from a NULL
    val lit = Privacy.corpusChecksum(
      Seq((2L, "NULL")).toDF("id", "s"), Seq("id", "s")).head()
    assert(BigDecimal(lit.getDecimal(1)) === BigDecimal(h("2\u0001NULL")))
    assert(lit.getDecimal(1).longValue() !== h("2\u0001\u0002NULL"))
  }

  test("corpusChecksum: invariant to partitioning and row order; sensitive to one char") {
    val docs = (1 to 500).map(i => (i.toLong, s"doc number $i", s"s${i % 7}"))
    val a = Privacy.corpusChecksum(
      docs.toDF("id", "t", "src").repartition(13), Seq("id", "t", "src")).head()
    val b = Privacy.corpusChecksum(
      docs.reverse.toDF("id", "t", "src").repartition(3, col("src")), Seq("id", "t", "src")).head()
    assert(a === b, "checksum must not depend on order or partitioning")
    val mutated = docs.updated(250, (251L, "doc number 251x", "s6"))
    val c = Privacy.corpusChecksum(mutated.toDF("id", "t", "src"), Seq("id", "t", "src")).head()
    assert(c.getDecimal(1) !== a.getDecimal(1), "a one-char edit must move the checksum")
  }

  test("kAnonymityReport: class sizes, distinct sensitive counts, and flags by hand") {
    val rows = Seq(
      // class (US, a): 3 members, 3 distinct diagnoses → k=3 ok, l=2 ok
      ("US", "a", "flu"), ("US", "a", "cold"), ("US", "a", "ok"),
      // class (US, b): 2 members, 1 diagnosis → fails both at k=3, l=2
      ("US", "b", "flu"), ("US", "b", "flu"),
      // class (DE, a): 4 members, 2 diagnoses → ok
      ("DE", "a", "flu"), ("DE", "a", "flu"), ("DE", "a", "ok"), ("DE", "a", "ok"))
      .toDF("country", "seg", "diag")
    val got = Privacy.kAnonymityReport(rows, Seq("country", "seg"), "diag", k = 3L, l = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    def row(k: (String, String)) = {
      val r = got(k)
      (r.getAs[Long]("class_size"), r.getAs[Long]("n_sensitive"),
        r.getAs[Boolean]("k_anonymous"), r.getAs[Boolean]("l_diverse"),
        r.getAs[Boolean]("at_risk"))
    }
    assert(row(("US", "a")) === ((3L, 3L, true, true, false)))
    assert(row(("US", "b")) === ((2L, 1L, false, false, true)))
    assert(row(("DE", "a")) === ((4L, 2L, true, true, false)))
  }

  test("kAnonymityReport: NULL is a value for both quasi and sensitive columns") {
    val rows = Seq(
      (null: String, "a", "x"), (null: String, "a", null: String),
      (null: String, "a", null: String))
      .toDF("country", "seg", "diag")
    val r = Privacy.kAnonymityReport(rows, Seq("country", "seg"), "diag", k = 2L, l = 2L)
      .collect()
    assert(r.length === 1, "NULL quasi tuples group into one class")
    assert(r.head.getAs[Long]("class_size") === 3L)
    assert(r.head.getAs[Long]("n_sensitive") === 2L,
      "NULL sensitive counts as one observed value, not zero")
    assert(r.head.getAs[Boolean]("l_diverse"))
  }

  test("kAnonymityReport: guards, and no COUNT(DISTINCT) Expand in the plan") {
    val df = Seq(("a", "b", "c")).toDF("q1", "q2", "s")
    intercept[IllegalArgumentException](
      Privacy.kAnonymityReport(df, Seq.empty, "s", 2L, 2L))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityReport(df, Seq("q1", "s"), "s", 2L, 2L))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityReport(df, Seq("q1"), "s", 0L, 2L))
    val out = Privacy.kAnonymityReport(df, Seq("q1", "q2"), "s", 2L, 2L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), s"two stacked aggs, not COUNT(DISTINCT):\n$plan")
  }
}
