package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.text

class NormalizeUnicodeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(form: String, inputs: String*): Seq[String] =
    inputs.toDF("s")
      .select(text.normalizeUnicode(col("s"), form).as("n"))
      .collect().map(_.getString(0)).toSeq

  private val nasty = Seq(
    "cafe\u0301",        // combining acute -> composed e-acute
    "\u212B",            // ANGSTROM SIGN -> U+00C5 (singleton replacement)
    "o\u0308\u0301",      // stacked marks (canonical order)
    "\uFB01n",           // fi ligature (NFKC folds, NFC keeps)
    "\uFF11\uFF12\uFF13",  // fullwidth digits (NFKC folds to 123)
    "plain ascii",
    "")

  test("every form matches java.text.Normalizer on nasty and plain inputs") {
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val expected = nasty.map(Normalizer.normalize(_, Normalizer.Form.valueOf(form)))
      assert(run(form, nasty: _*) === expected, s"form $form diverged")
    }
  }

  test("NFC composes, NFKC additionally folds compatibility forms; both idempotent") {
    assert(run("NFC", "cafe\u0301") === Seq("caf\u00e9"))
    assert(run("NFC", "\uFB01n") === Seq("\uFB01n"), "NFC must keep the ligature")
    assert(run("NFKC", "\uFB01n") === Seq("fin"), "NFKC must fold the ligature")
    assert(run("NFKC", "\uFF11\uFF12\uFF13") === Seq("123"))
    // idempotence: normalizing the normalized output is identity
    for (form <- Seq("NFC", "NFKC")) {
      val once = run(form, nasty: _*)
      assert(run(form, once: _*) === once, s"$form must be idempotent")
    }
  }

  test("NULL passes through; invalid form fails loudly at plan build") {
    val out = Seq(Option("a"), None).toDF("s")
      .select(text.normalizeUnicode(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("a"), None))
    intercept[IllegalArgumentException] {
      text.normalizeUnicode(col("s"), "NFX")
    }
  }

  test("graft_normalize is SQL-callable (default NFC; literal form argument)") {
    graft.expressions.GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_normalize('cafe\u0301') AS a, graft_normalize('\uFB01n', 'NFKC') AS b").head()
    assert(out.getString(0) === "caf\u00e9")
    assert(out.getString(1) === "fin")
  }

  test("normalization repairs fragmented dedup identities (the reason it exists)") {
    // same user-visible text, two byte sequences → two md5s raw, one normalized
    val df = Seq((1L, "café"), (2L, "café")).toDF("id", "t")
    val raw = df.select(text.fingerprintMd5(col("t")).as("f")).distinct().count()
    val norm = df.select(text.fingerprintMd5(text.normalizeUnicode(col("t"))).as("f"))
      .distinct().count()
    assert(raw === 2L && norm === 1L)
  }
}
