package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.text

class MultiPhraseMatchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(texts: Seq[String], phrases: Seq[String]): Seq[(String, Seq[String])] = {
    val df = texts.toDF("t")
    df.select(col("t"), text.matchPhrases(col("t"), phrases).as("m"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
  }

  test("matches equal the naive per-phrase contains scan, sorted and distinct") {
    // deterministic fuzz: random-ish texts over a tiny alphabet maximize
    // overlap/failure-link traffic (the 'aab' in 'aaab' class)
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val texts = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(40))).map(_ => alphabet(rnd.nextInt(3))).mkString)
    val phrases = Seq("a", "aa", "aab", "ab", "ba", "bca", "cab", "abcabc", "ccc")
    val got = run(texts, phrases)
    got.foreach { case (t, m) =>
      val want = phrases.filter(t.contains(_)).sorted
      assert(m === want, s"text '$t'")
    }
  }

  test("prefix-nested phrases and overlapping occurrences all surface") {
    val got = run(Seq("xtable valuey", "aaa"), Seq("table", "table value", "tab", "aa"))
    assert(got.head._2 === Seq("tab", "table", "table value"))
    assert(got(1)._2 === Seq("aa"), "overlapping occurrences dedup to one phrase")
  }

  test("multi-byte UTF-8 phrases match byte-exactly; no false mid-codepoint hits") {
    val phrases = Seq("café", "日本語", "naïve")
    val got = run(
      Seq("un café noir", "I study 日本語 daily", "cafe naive"), phrases)
    assert(got(0)._2 === Seq("café"))
    assert(got(1)._2 === Seq("日本語"))
    assert(got(2)._2 === Seq.empty, "ASCII lookalikes must not match the accented phrases")
  }

  test("NULL text stays NULL; hasAnyPhrase is the size predicate") {
    val df = Seq(Some("a zebra here"), None, Some("nothing")).toDF("t")
    val got = df.select(
      text.matchPhrases(col("t"), Seq("zebra")).as("m"),
      text.hasAnyPhrase(col("t"), Seq("zebra")).as("h")).collect()
    assert(got(0).getSeq[String](0) === Seq("zebra") && got(0).getBoolean(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(got(2).getSeq[String](0) === Seq.empty && !got(2).getBoolean(1))
  }

  test("empty dictionaries and empty phrases are rejected loudly") {
    val df = Seq("x").toDF("t")
    intercept[IllegalArgumentException] {
      df.select(text.matchPhrases(col("t"), Seq.empty)).collect()
    }
    intercept[IllegalArgumentException] {
      df.select(text.matchPhrases(col("t"), Seq("ok", ""))).collect()
    }
  }

  test("emission order is binary UTF-8, not UTF-16 (supplementary plane witness)") {
    // U+1F600 (surrogate pair in UTF-16, 0xF0.. lead byte in UTF-8) must
    // sort AFTER U+FFFD (0xEF..) in byte order; UTF-16 code-unit order
    // would put the surrogate (0xD83D) first
    val emoji = new String(Character.toChars(0x1F600))
    val got = run(Seq(s"x� y$emoji"), Seq(emoji, "�"))
    assert(got.head._2 === Seq("�", emoji))
  }

  test("a large dictionary builds and matches (one walk, many patterns)") {
    val phrases = (0 until 5000).map(i => s"phrase$i token")
    val got = run(Seq("has phrase4999 token and phrase12 token inside", "none"), phrases)
    assert(got.head._2 === Seq("phrase12 token", "phrase4999 token"))
    assert(got(1)._2 === Seq.empty)
  }
}
