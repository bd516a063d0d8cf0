package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, Chunker}

class ChunkerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(s: String): Seq[String] = s.split("\\s+").filter(_.nonEmpty).toSeq

  test("documents within budget yield one chunk, identical to the tokenized text") {
    val docs = Seq((1L, "a b c"), (2L, "one two three four five")).toDF("id", "text")
    val out = Chunker.chunk(docs, "text", "id", maxTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSet == Set((1L, 0L, "a b c", 3L), (2L, 0L, "one two three four five", 5L)))
    Caches.release()
  }

  test("long documents split with the exact overlap, last chunk short") {
    // 12 tokens, maxTokens 5, overlap 2 → step 3 → starts 0,3,6 → ceil((12-5)/3)+1 = 4 chunks? (12-5+2)/3+1 = 4
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, words)).toDF("id", "text"), "text", "id", 5, 2)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.length == 4)
    assert(out(0) == ((0L, "w1 w2 w3 w4 w5", 5L)))
    assert(out(1) == ((1L, "w4 w5 w6 w7 w8", 5L)))
    assert(out(2) == ((2L, "w7 w8 w9 w10 w11", 5L)))
    assert(out(3) == ((3L, "w10 w11 w12", 3L)))
    // consecutive chunks share exactly `overlap` tokens
    out.sliding(2).foreach { case Array((_, a, _), (_, b, _)) =>
      assert(toks(a).takeRight(2) == toks(b).take(2))
    }
    Caches.release()
  }

  test("every token position is covered exactly once accounting for overlap") {
    val words = (1 to 101).map(i => s"t$i").mkString(" ")
    val chunks = Chunker.chunk(Seq((1L, words)).toDF("id", "text"), "text", "id", 40, 5)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val covered = chunks.flatMap { case (cid, text) =>
      toks(text).indices.map(_ + cid * 35)
    }.toSet
    assert(covered == (0L until 101L).toSet, "chunk windows must tile the document")
    val cov = Chunker.coverage(Seq((1L, words)).toDF("id", "text"), "text", "id", 40, 5)
      .collect().head
    assert(cov.getAs[Long]("covered_tokens") == 101L)
    Caches.release()
  }

  test("degenerate docs: empty text one empty chunk; null text no chunks") {
    val docs = Seq((1L, "   "), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Chunker.chunk(docs, "text", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "", 0L)), s"got ${out.toSeq}")
    Caches.release()
  }

  test("zero overlap is plain fixed-size splitting") {
    val words = (1 to 10).map(i => s"x$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, words)).toDF("id", "text"), "text", "id", 4, 0)
      .orderBy("chunk_id").collect().map(_.getString(2))
    assert(out.toSeq == Seq("x1 x2 x3 x4", "x5 x6 x7 x8", "x9 x10"))
    Caches.release()
  }

  test("chunking never shuffles: the plan has no Exchange") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("id", "text")
    val plan = Chunker.chunk(docs, "text", "id", 3, 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must stay narrow:\n$plan")
    Caches.release()
  }
}
