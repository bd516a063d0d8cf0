package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Similarity}
import graft.sources.Tables

class QuantizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("sq8 round-trip: codes in [-127,127] as BYTES, reconstruction within scale/2 per component") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val enc = Quantize.sq8Encode(emb, "vec_id", "embedding")
    // storage contract: one BYTE per component — the 4x claim is the schema
    assert(enc.schema("codes").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, true))
    val joined = enc.join(emb, "vec_id")
      .select(col("vec_id"), col("codes"), col("amax"), col("embedding"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val codes = r.getSeq[Byte](1)
      val amax = r.getDouble(2)
      val orig = r.getSeq[Float](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      val scale = if (amax == 0.0) 0.0 else amax / 127.0
      codes.zip(orig).foreach { case (c, x) =>
        assert(math.abs(c * scale - x.toDouble) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: code $c decodes ${c * scale}, orig $x, scale $scale")
      }
    }
  }

  test("sq8 codes match a driver-side recompute, including the zero vector") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-0.003f, 0.001f, 0.002f, -0.0015f)))
      .toDF("vec_id", "embedding")
    val got = Quantize.sq8Encode(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Byte](1).toList, r.getDouble(2)))).toMap
    def ref(xs: Array[Float]): (List[Byte], Double) = {
      val amax = xs.map(x => math.abs(x.toDouble)).max
      val codes = xs.map(x =>
        if (amax == 0.0) 0.toByte
        else math.floor(x.toDouble * 127.0 / amax + 0.5).toByte).toList
      (codes, amax)
    }
    assert(got(1L) === ref(Array(0.5f, -1.0f, 0.25f, 0.0f)))
    assert(got(2L) === ((List[Byte](0, 0, 0, 0), 0.0)))
    assert(got(3L) === ref(Array(-0.003f, 0.001f, 0.002f, -0.0015f)))
  }

  test("sq8TopKExactInt: high recall vs float brute force; ranked by exact-int cosine; no global sort") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val enc = Quantize.sq8Encode(emb, "vec_id", "embedding")
    val df = Quantize.sq8TopKExactInt(enc, "vec_id", queryId = 0L, k = 20)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    // int8 keeps enough fidelity that the top-20 barely moves vs float
    val floatIds = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val overlap = rows.map(_._1).count(floatIds.contains)
    assert(overlap >= 16, s"SQ8 recall collapsed: $overlap/20 shared with float brute force")
    // ordering law: exact-int cosine desc, id asc
    val qn = {
      val qc = enc.where(col("vec_id") === 0L).select("codes").head().getSeq[Byte](0)
      math.sqrt(qc.map(c => c.toLong * c.toLong).sum.toDouble)
    }
    def score(dot: Long, n2: Long) =
      if (n2 == 0L) 0.0 else dot.toDouble / (math.sqrt(n2.toDouble) * qn)
    val resorted = rows.sortBy { case (id, dot, n2) => (-score(dot, n2), id) }
    assert(rows.toSeq === resorted.toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("sq8TopKExactInt fails loudly on an absent or NULL-codes query id") {
    val enc = Quantize.sq8Encode(
      Seq((1L, Array(0.5f, 0.5f)), (2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val missing = intercept[IllegalArgumentException] {
      Quantize.sq8TopKExactInt(enc, "vec_id", queryId = 99L, k = 5)
    }
    assert(missing.getMessage.contains("99"))
    val withNull = enc.unionByName(
      Seq((3L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
        .select(col("vec_id"), Quantize.sq8Codes(col("embedding")).as("codes"),
          lit(null).cast("double").as("amax")))
    val nullCodes = intercept[IllegalArgumentException] {
      Quantize.sq8TopKExactInt(withNull, "vec_id", queryId = 3L, k = 5)
    }
    assert(nullCodes.getMessage.toLowerCase.contains("null codes"))
  }

  test("signBits matches a driver-side pack; NULL stays NULL; bit 63 and zeros handled") {
    val rows = Seq(
      (1L, Some(Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f))),
      (2L, Some(Array.tabulate(64)(i => if (i == 63) 0.5f else 0.0f))), // ONLY the sign bit
      (3L, Some(Array.fill(64)(0.0f))), // exact zeros → no bits
      (4L, None))
    val df = rows.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), Quantize.signBits(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    def ref(v: Array[Float]): Long =
      v.zipWithIndex.filter(_._1 > 0f).map { case (_, i) => 1L << i }.sum
    assert(got(1L) === Some(ref(rows.head._2.get)))
    assert(got(2L) === Some(Long.MinValue), "bit 63 alone is the two's-complement minimum")
    assert(got(3L) === Some(0L))
    assert(got(4L) === None, "NULL vectors quarantine, never code to 0")
  }

  test("hammingTopK: exact distances vs a driver-side popcount; ties break on id; NULLs excluded") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val got = Similarity.hammingTopK(emb, "vec_id", "embedding", queryId = 7L, k = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val codes = emb.select(col("vec_id"), Quantize.signBits(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = codes.filter(_._1 != 7L).toSeq
      .map { case (id, c) => (id, java.lang.Long.bitCount(c ^ codes(7L))) }
      .sortBy { case (id, d) => (d, id) }.take(12)
    assert(got.toSeq === want, "all-integer face: set, values, AND order must be exact")
  }

  test("hammingRerankTopK: results come from the prefilter set; full prefilter equals brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count().toInt
    val pre = Similarity.hammingTopK(emb, "vec_id", "embedding", queryId = 7L, k = 40)
      .collect().map(_.getLong(0)).toSet
    val two = Similarity.hammingRerankTopK(emb, "vec_id", "embedding",
      queryId = 7L, k = 8, prefilterK = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(two.length === 8)
    assert(two.map(_._1).toSet.subsetOf(pre), "stage 2 can only rank stage-1 candidates")
    // prefilterK >= corpus: the rescoring stack degenerates to the exact face
    val full = Similarity.hammingRerankTopK(emb, "vec_id", "embedding",
      queryId = 7L, k = 8, prefilterK = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = Similarity.bruteForceTopKExactInt(emb, "vec_id", "embedding",
      queryId = 7L, k = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dot"), r.getAs[Long]("norm2")))
    assert(full.toSeq === brute.toSeq,
      "with every row in the prefilter, the two stages equal exact brute force bit-for-bit")
  }
}
