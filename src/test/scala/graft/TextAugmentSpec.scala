package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAugment

class TextAugmentSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = (0L until 60L)
    .map(i => (i, (1 to 40).map(k => s"w${i}_$k")))
    .toDF("id", "toks")

  test("spanCorrupt: lossless reconstruction, collapsed runs, exact mask accounting") {
    val out = TextAugment.spanCorrupt(docs, "id", "toks",
      startPermille = 120, spanLen = 3, seed = 5L)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[scala.collection.Seq[String]]("toks"),
        r.getAs[scala.collection.Seq[String]]("input_tokens"), r.getAs[scala.collection.Seq[String]]("target_tokens"),
        r.getAs[Long]("n_masked")))
    var sawMask = false
    for ((id, orig, inp, tgt, nm) <- out) {
      // the pair is LOSSLESS: splicing each target run back over its
      // sentinel reproduces the original token sequence exactly
      val runs = {
        // target = <mask> t1 t2 … <mask> t… — split on sentinels
        val b = scala.collection.mutable.ListBuffer.empty[List[String]]
        var cur: List[String] = null
        tgt.foreach { t =>
          if (t == TextAugment.Mask) { if (cur != null) b += cur; cur = Nil }
          else cur = cur :+ t
        }
        if (cur != null) b += cur
        b.toList
      }
      val it = runs.iterator
      val rebuilt = inp.flatMap {
        case TextAugment.Mask => it.next()
        case t => Seq(t)
      }
      assert(rebuilt === orig, s"doc $id must reconstruct")
      assert(!it.hasNext, s"doc $id: every target run consumed")
      // accounting: masked tokens = original − surviving
      assert(nm === (orig.size - inp.count(_ != TextAugment.Mask)).toLong)
      assert(nm === tgt.count(_ != TextAugment.Mask).toLong)
      // runs COLLAPSE: no two adjacent sentinels survive in the input
      assert(!inp.sliding(2).exists(p => p.forall(_ == TextAugment.Mask)), s"doc $id")
      sawMask ||= nm > 0
    }
    assert(sawMask, "the fixture must actually corrupt something")
    // corruption rate lands near startPermille·spanLen (pre-merge upper bound)
    val total = out.map(_._2.size).sum.toDouble
    val masked = out.map(_._5).sum.toDouble
    assert(masked / total > 0.10 && masked / total < 0.40,
      s"rate ${masked / total} wildly off 0.12·3 pre-merge expectation")
  }

  test("spanCorrupt is a pure function of (id, position, seed)") {
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, scala.collection.Seq[String]] =
      TextAugment.spanCorrupt(df, "id", "toks", 100, 2, seed = 9L)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[String]]("input_tokens")).toMap
    assert(run(docs) === run(docs.repartition(13)))
    // a different seed corrupts differently
    val other = TextAugment.spanCorrupt(docs, "id", "toks", 100, 2, seed = 10L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[String]]("input_tokens")).toMap
    assert(run(docs) !== other)
  }

  test("tokenDropout: deterministic subsequence, zero rate is identity") {
    val out = TextAugment.tokenDropout(docs, "id", "toks", dropPermille = 200, seed = 3L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[scala.collection.Seq[String]]("toks"),
        r.getAs[scala.collection.Seq[String]]("kept_tokens")))
    for ((id, orig, kept) <- out) {
      // kept is a SUBSEQUENCE of the original (order preserved)
      val it = orig.iterator
      assert(kept.forall(k => it.contains(k)), s"doc $id: order must survive")
    }
    val total = out.map(_._2.size).sum.toDouble
    val kept = out.map(_._3.size).sum.toDouble
    assert(kept / total > 0.7 && kept / total < 0.9, s"keep rate ${kept / total} vs 0.8")
    val id0 = TextAugment.tokenDropout(docs, "id", "toks", 0, seed = 3L)
      .collect().map(r => (r.getAs[scala.collection.Seq[String]]("toks"), r.getAs[scala.collection.Seq[String]]("kept_tokens")))
    assert(id0.forall(p => p._1 === p._2), "dropPermille 0 keeps everything")
  }

  test("empty and null token arrays pass through as empty outputs") {
    val edge = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "toks")
    val out = TextAugment.spanCorrupt(edge, "id", "toks", 500, 2, seed = 1L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[scala.collection.Seq[String]]("input_tokens"), r.getAs[Long]("n_masked")))).toMap
    assert(out(1L)._1.isEmpty && out(1L)._2 === 0L)
    assert(out(2L)._1.isEmpty && out(2L)._2 === 0L)
  }

  test("insertNeedle: splice law, recorded position is where the needle sits, NULL quarantine") {
    val texts = (0L until 40L).map(i => (i, "x" * (i % 7).toInt)).toDF("id", "text")
    val out = TextAugment.insertNeedle(texts, "id", "text", "<N>", seed = 5L).collect()
    out.foreach { r =>
      val (t, pos, planted) = (r.getAs[String]("text"),
        r.getAs[Long]("needle_pos"), r.getAs[String]("text_with_needle"))
      assert(pos >= 0 && pos <= t.length, "position lands inside [0, len]")
      assert(planted === t.substring(0, pos.toInt) + "<N>" + t.substring(pos.toInt),
        "the splice law: removing the needle at its recorded position restores the text")
      assert(planted.indexOf("<N>") === pos.toInt || t.contains("<N>"),
        "recorded position points at the needle")
      val frac = r.getAs[Double]("depth_frac")
      if (t.isEmpty) assert(frac === 0.0)
      else assert(frac === pos.toDouble / t.length)
    }
    val n = TextAugment.insertNeedle(Seq((1L, null: String)).toDF("id", "text"),
      "id", "text", "<N>", 5L).head()
    assert(n.isNullAt(n.fieldIndex("needle_pos")) &&
      n.isNullAt(n.fieldIndex("text_with_needle")), "NULL text quarantines")
  }

  test("fimSplit: reconstruction law, rate extremes, partition invariance, NULL quarantine") {
    val texts = (0L until 80L).map(i => (i, s"doc $i " + ("abcdefgh" * (1 + (i % 5).toInt))))
      .toDF("id", "text")
    val out = TextAugment.fimSplit(texts, "id", "text", fimPermille = 600, seed = 42L)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val applied = out.values.filter(_.getAs[Boolean]("fim_applied"))
    assert(applied.nonEmpty && applied.size < out.size, "both polarities at 600 permille")
    applied.foreach { r =>
      val (p, m, sfx) = (r.getAs[String]("fim_prefix"),
        r.getAs[String]("fim_middle"), r.getAs[String]("fim_suffix"))
      assert(p + m + sfx === r.getAs[String]("text"),
        "the three parts must reconstruct the document exactly")
      assert(r.getAs[String]("fim_text") ===
        s"<fim_prefix>$p<fim_suffix>$sfx<fim_middle>$m")
    }
    out.values.filterNot(_.getAs[Boolean]("fim_applied")).foreach { r =>
      assert(r.getAs[String]("fim_text") === r.getAs[String]("text"))
      assert(r.isNullAt(r.fieldIndex("fim_prefix")), "untouched rows carry NULL parts")
    }
    // rate extremes
    assert(TextAugment.fimSplit(texts, "id", "text", 0, 42L)
      .where(col("fim_applied")).count() === 0L)
    assert(TextAugment.fimSplit(texts, "id", "text", 1000, 42L)
      .where(!col("fim_applied")).count() === 0L)
    // pure function of (id, seed): physical layout cannot move a cut point
    val a = TextAugment.fimSplit(texts.repartition(13), "id", "text", 600, 42L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("fim_text"))).toSet
    assert(a === out.values.map(r => (r.getAs[Long]("id"), r.getAs[String]("fim_text"))).toSet)
    // NULL text quarantines
    val n = TextAugment.fimSplit(Seq((1L, null: String)).toDF("id", "text"),
      "id", "text", 1000, 42L).head()
    assert(!n.getAs[Boolean]("fim_applied") && n.isNullAt(n.fieldIndex("fim_text")))
  }
}
