package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def dim(nullSafe: Boolean, rows: Seq[(String, String, Option[String])]) = {
    val timeline = rows
      .map { case (k, d, v) => (k, Date.valueOf(d), v.orNull) }
      .toDF("k", "change_date", "attr")
    Scd2.build(
      timeline,
      Scd2.Config(Seq("k"), "change_date", Seq("attr"), nullSafe = nullSafe))
  }

  test("basic interval chain: change detection, close-out, is_current") {
    val d = dim(nullSafe = true, Seq(
      ("a", "2022-01-01", Some("Active")),
      ("a", "2022-02-01", Some("Active")),   // no change → absorbed
      ("a", "2022-03-01", Some("Inactive")), // change → new version
      ("b", "2022-01-15", Some("Active"))))
      .orderBy("k", "effective_start_date")
      .collect()
    assert(d.length == 3)
    val a0 = d(0)
    assert(a0.getAs[Date]("effective_start_date").toString == "2022-01-01")
    assert(a0.getAs[Date]("effective_end_date").toString == "2022-02-28")
    assert(!a0.getAs[Boolean]("is_current"))
    val a1 = d(1)
    assert(a1.getAs[Date]("effective_start_date").toString == "2022-03-01")
    assert(a1.getAs[Date]("effective_end_date").toString == "9999-12-31")
    assert(a1.getAs[Boolean]("is_current"))
  }

  test("nullSafe mode keeps a key whose first rows have all-NULL tracked attrs") {
    val d = dim(nullSafe = true, Seq(
      ("n", "2022-01-01", None),          // all tracked attrs NULL on first row
      ("n", "2022-02-01", None),          // still NULL → absorbed, not a change
      ("n", "2022-03-01", Some("X"))))    // NULL → X is a change
    val rows = d.orderBy("effective_start_date").collect()
    assert(rows.length == 2, "first all-NULL version must not vanish")
    assert(rows(0).getAs[String]("attr") == null)
    assert(rows(0).getAs[Date]("effective_start_date").toString == "2022-01-01")
    assert(rows(1).getAs[String]("attr") == "X")
  }

  test("faithful (null-unsafe) mode also keeps the all-NULL first row") {
    val d = dim(nullSafe = false, Seq(
      ("n", "2022-01-01", None),
      ("n", "2022-03-01", Some("X"))))
    assert(d.count() == 2)
  }

  test("nullSafe detects value→NULL transitions that faithful mode misses") {
    val rows = Seq(
      ("k", "2022-01-01", Some("X")),
      ("k", "2022-02-01", None)) // X → NULL
    assert(dim(nullSafe = true, rows).count() == 2)
    assert(dim(nullSafe = false, rows).count() == 1) // reference semantics
  }

  test("hash surrogate keys are deterministic across reruns") {
    val rows = Seq(("a", "2022-01-01", Some("v1")), ("a", "2022-02-01", Some("v2")))
    val sk1 = Scd2.withHashSk(dim(nullSafe = true, rows), "sk", Seq("k"))
      .select("sk").as[Long].collect().sorted
    val sk2 = Scd2.withHashSk(dim(nullSafe = true, rows), "sk", Seq("k"))
      .select("sk").as[Long].collect().sorted
    assert(sk1.sameElements(sk2))
    assert(sk1.distinct.length == 2)
  }
}
