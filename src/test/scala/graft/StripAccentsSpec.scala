package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.text

class StripAccentsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(inputs: String*): Seq[String] =
    inputs.toDF("s")
      .select(text.stripAccents(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq

  /** Independent mirror: NFD, drop Mn/Mc/Me code points, NFC. */
  private def reference(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val kept = d.codePoints().toArray.filterNot { cp =>
      val t = Character.getType(cp)
      t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
    }
    Normalizer.normalize(new String(kept, 0, kept.length), Normalizer.Form.NFC)
  }

  test("composed and decomposed spellings of the same word fold identically") {
    assert(run("café", "café") === Seq("cafe", "cafe"))
    assert(run("Zürich", "Zürich") === Seq("Zurich", "Zurich"))
    assert(run("ö́mega") === Seq("omega"), "stacked marks all drop")
  }

  test("mark removal, not transliteration: no-decomposition letters survive") {
    assert(run("øre") === Seq("øre"), "ø has no canonical decomposition")
    assert(run("straße") === Seq("straße"), "ß is a letter, not a marked s")
    assert(run("đem") === Seq("đem"), "đ (stroke) is not a combining mark")
  }

  test("ASCII fast path is identity; NULL and empty pass through") {
    assert(run("plain ascii 42", "") === Seq("plain ascii 42", ""))
    val out = Seq(Option("á"), None).toDF("s")
      .select(text.stripAccents(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("a"), None))
  }

  test("supplementary-plane combining marks drop (code-point walk, not char walk)") {
    // MUSICAL SYMBOL combining stem U+1D165 (Mc) after a base note U+1D158
    val s = "x\uD834\uDD58\uD834\uDD65y"
    assert(run(s) === Seq(reference(s)))
    assert(!run(s).head.contains("\uD834\uDD65"), "the Mc mark must be gone")
  }

  test("matches the independent JDK mirror on random accented strings") {
    val rnd = new scala.util.Random(7)
    val pool = "abc \u00e9\u00e8\u00fc\u00f1\u00e7\u00f8\u00df".toCharArray ++
      Seq('\u0301', '\u0308', '\u0327', '\u212B')
    val cases = (1 to 200).map { _ =>
      (1 to rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    assert(run(cases: _*) === cases.map(reference))
  }

  test("graft_strip_accents is SQL-callable") {
    graft.expressions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_strip_accents('café') AS a").head().getString(0) === "cafe")
  }
}
