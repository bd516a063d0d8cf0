package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations.Rule

class ExpectationsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), "a@x.io"),
    (Some(2L), Some(200.0), "nope"),   // range violation
    (None, Some(5.0), "b@y.io"),       // null id
    (Some(4L), None, "c@z.io")         // null amount → range violation
  ).toDF("id", "amt", "email")

  private def score(rules: Seq[Rule]): Map[String, (Long, Long, Boolean)] =
    Expectations.check(df, rules).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("total"), r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))))
      .toMap

  test("row-predicate rules count violations in one pass; nulls fail ranges") {
    val got = score(Seq(
      Expectations.notNull("id"),
      Expectations.inRange("amt", 0, 100),
      Expectations.matchesRegex("email", "^[^@]+@[^@]+$", "email_shape")))
    assert(got("not_null_id") === ((4L, 1L, false)))
    assert(got("range_amt") === ((4L, 2L, false))) // 200 out of range, null fails
    assert(got("email_shape") === ((4L, 1L, false)))
  }

  test("a fully-passing rule reports pass = true") {
    val got = score(Seq(Expectations.notNull("email")))
    assert(got("not_null_email") === ((4L, 0L, true)))
  }

  test("the whole ruleset evaluates in a single aggregation over one scan") {
    val plan = Expectations.check(df, Seq(
      Expectations.notNull("id"),
      Expectations.inRange("amt", 0, 100),
      Expectations.matchesRegex("email", "@", "has_at")))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"n rules must not mean n jobs/exchanges:\n$plan")
    assert(!plan.toLowerCase.contains("union"), "rules fold into one aggregate, not a union of scans")
  }

  test("uniqueKey counts surplus rows per duplicated key") {
    val dup = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "sub")
    val byBoth = Expectations.uniqueKey(dup, Seq("k", "sub")).head()
    assert(byBoth.getAs[Long]("violations") === 1L) // (1,a) twice
    val byK = Expectations.uniqueKey(dup, Seq("k")).head()
    assert(byK.getAs[Long]("violations") === 2L) // three rows of k=1
    assert(!byK.getAs[Boolean]("pass"))
  }

  test("refIntegrity counts orphans; null child keys are orphans") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    val r = Expectations.refIntegrity(child, Seq("fk"), parent, Seq("pk")).head()
    assert(r.getAs[Long]("total") === 4L)
    assert(r.getAs[Long]("violations") === 2L) // fk=3 and fk=null
    assert(!r.getAs[Boolean]("pass"))
  }

  test("refIntegrity dedups the parent before joining — duplicate parents cannot multiply child rows") {
    val parent = Seq(1L, 1L, 1L).toDF("pk")
    val child = Seq(1L, 1L).toDF("fk")
    val r = Expectations.refIntegrity(child, Seq("fk"), parent, Seq("pk")).head()
    assert(r.getAs[Long]("total") === 2L && r.getAs[Long]("violations") === 0L)
  }

  test("the three shapes union into one scorecard") {
    val parent = Seq(1L, 2L, 4L).toDF("pk")
    val board = Expectations.check(df, Seq(Expectations.notNull("id")))
      .unionByName(Expectations.uniqueKey(df, Seq("id")))
      .unionByName(Expectations.refIntegrity(df, Seq("id"), parent, Seq("pk")))
    assert(board.count() === 3L)
    assert(board.columns.toSeq === Seq("rule", "total", "violations", "pass"))
  }

  test("rule names must be identifier-safe (they transit generated SQL)") {
    intercept[IllegalArgumentException] {
      Rule("bad name'; --", lit(true))
    }
  }

  test("rule names must not shadow scorecard or internal columns") {
    Seq("__total", "rule", "violations", "total", "pass").foreach { bad =>
      intercept[IllegalArgumentException] { Rule(bad, lit(true)) }
    }
  }
}
