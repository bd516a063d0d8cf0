package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

class BoilerplateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "SITE NAV\nreal content one\n\nCOPYRIGHT 2020"),
    (2L, "SITE NAV\nreal content two\nCOPYRIGHT 2020"),
    (3L, "SITE NAV\nunique thoughts\n  SITE NAV  \nCOPYRIGHT 2020"),
    (4L, "only original text here")
  ).toDF("doc_id", "text")

  test("lineDf counts every occurrence of a trimmed non-empty line") {
    val df = Boilerplate.lineDf(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("SITE NAV") === 4L, "within-doc repeat and padded variant both count")
    assert(df("COPYRIGHT 2020") === 3L)
    assert(df("real content one") === 1L)
    assert(!df.contains(""), "blank lines are structure, not keys")
  }

  test("stripCommonLines removes df>=minDf lines, keeps order, blanks, and unique text") {
    val got = Boilerplate.stripCommonLines(docs, "text", minDf = 3L)
      .select("doc_id", "text_clean", "n_lines_dropped")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("real content one\n", 2L)), "blank line survives")
    assert(got(2L) === (("real content two", 2L)))
    assert(got(3L) === (("unique thoughts", 3L)), "padded repeat matches after trim")
    assert(got(4L) === (("only original text here", 0L)))
  }

  test("a threshold nothing reaches leaves every document intact") {
    val got = Boilerplate.stripCommonLines(docs, "text", minDf = 100L)
    assert(got.where(col("text_clean") =!= col("text")).count() === 0L)
    assert(got.agg(sum("n_lines_dropped")).as[Long].head() === 0L)
  }

  test("the common-line cap fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Boilerplate.stripCommonLines(docs, "text", minDf = 3L, maxCommonLines = 1)
    }
    assert(e.getMessage.contains("maxCommonLines"))
  }

  test("the strip pass is a pure map: no exchange in the returned plan") {
    val plan = Boilerplate.stripCommonLines(docs, "text", minDf = 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("membership is the hashed-set probe, one filter pass over the lines") {
    // analyzed plan: the local test relation constant-folds away in the
    // optimized plan, taking the expressions under inspection with it
    val plan = Boilerplate.stripCommonLines(docs, "text", minDf = 3L)
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_set_contains"), s"expected the hashed probe:\n$plan")
    assert(!plan.contains("array_contains"),
      s"the O(|common|) literal-array scan must be gone:\n$plan")
    // one kept-lines filter computes both outputs (clean text via
    // array_join, dropped count via the size delta) — a second
    // membership pass over the array would show as a third filter()
    assert("filter\\(".r.findAllIn(plan).size <= 2,
      s"strip stage must not re-scan the lines per output column:\n$plan")
  }
}
