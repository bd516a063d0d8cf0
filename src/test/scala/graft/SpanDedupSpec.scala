package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, SpanDedup}

/** Span-level repeated-window stripping: flagging, span union across
  * overlapping windows, within-doc-only repetition NOT flagged, edge
  * docs, and coverage totality.
  */
class SpanDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // "alpha beta gamma" is stamped into docs 1 and 2 (cross-doc boilerplate);
  // doc 3 repeats "echo echo echo" internally only; doc 4 is short; doc 5 null
  private val docs = Seq(
    (1L, "alpha beta gamma unique one tail"),
    (2L, "prefix alpha beta gamma and suffix"),
    (3L, "echo echo echo echo distinct words here"),
    (4L, "tiny doc"),
    (5L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  private def strip(l: Int, minDf: Long = 2L) = {
    val out = SpanDedup.stripRepeatedSpans(docs, "doc_id", "text", l, minDf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[String]("clean_text")), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"), r.getAs[Long]("n_windows"))))
      .toMap
    Caches.release()
    out
  }

  test("cross-doc repeated trigram is stripped from both docs, rest survives") {
    val out = strip(3)
    assert(out(1L) === ((Some("unique one tail"), 6L, 3L, 3L, 1L)))
    assert(out(2L) === ((Some("prefix and suffix"), 6L, 3L, 3L, 1L)))
  }

  test("within-doc-only repetition is not flagged") {
    val out = strip(3)
    assert(out(3L)._1 === Some("echo echo echo echo distinct words here"))
    assert(out(3L)._4 === 0L)
  }

  test("docs shorter than the window round-trip whole; null text stays null") {
    val out = strip(3)
    assert(out(4L)._1 === Some("tiny doc") && out(4L)._4 === 0L)
    assert(out(5L)._1 === None && out(5L)._2 === 0L && out(5L)._4 === 0L)
  }

  test("overlapping flagged windows union into one span") {
    // "a b c d" shared by both docs: windows (a b c), (b c d) both flagged
    // in each doc → 4 dropped tokens, not 6
    val d = Seq(
      (1L, "a b c d x y z"),
      (2L, "q a b c d r"))
      .toDF("doc_id", "text")
    val out = SpanDedup.stripRepeatedSpans(d, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_dropped"), r.getAs[Long]("n_windows"))))
      .toMap
    Caches.release()
    assert(out(1L) === (("x y z", 4L, 2L)))
    assert(out(2L) === (("q r", 4L, 2L)))
  }

  test("repeatedSpans audit lists exactly the flagged windows") {
    val got = SpanDedup.repeatedSpans(docs, "doc_id", "text", 3)
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((1L, 0, "alpha beta gamma"), (2L, 1, "alpha beta gamma")))
  }

  test("coverage is total: one output row per input doc, counts reconcile") {
    val out = strip(3)
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    out.values.foreach { case (_, nTok, nKept, nDrop, _) =>
      assert(nKept + nDrop === nTok)
    }
  }

  test("memorizationAudit: df counts docs not occurrences, single-doc repeats excluded, ranked") {
    import graft.operators.SpanDedup
    val docs = Seq(
      (1L, "x y z a b"),     // window "x y z" + others
      (2L, "x y z c d"),     // "x y z" again → df 2
      (3L, "x y z x y z"),   // "x y z" twice in ONE doc → df 3, occ 4 total
      (4L, "q q q q q"),     // within-doc-only repeats: "q q q" df 1 → excluded
      (5L, "a b"))           // shorter than l → no windows
      .toDF("doc_id", "text")
    val out = SpanDedup.memorizationAudit(docs, "doc_id", "text", l = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.head === (("x y z", 3L, 4L)),
      s"df must count distinct docs (3), occurrences all instances (4): ${out.toSeq}")
    assert(!out.exists(_._1 == "q q q"),
      "a window repeated only inside one doc is self-similarity, not memorization risk")
    // ranking is total: df desc, occurrences desc, gram asc
    val resorted = out.sortBy { case (g, df, occ) => (-df, -occ, g) }
    assert(out.toSeq === resorted.toSeq)
  }
}
