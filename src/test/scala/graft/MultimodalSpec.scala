package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def media(kind: String) =
    Multimodal.asMedia(Tables.load(spark, sfDir, "documents"), "doc_id", "text", kind)

  test("decodeStub: typed round-trip, deterministic metadata, no row loss") {
    val in = media("image")
    val out = Multimodal.decodeStub(spark, in)
    assert(out.count() == in.count())
    val twice = Multimodal.decodeStub(spark, in)
    assert(out.collect().sortBy(_.media_id).sameElements(twice.collect().sortBy(_.media_id)))
    assert(out.collect().forall(d => d.width >= 64 && d.height >= 64))
  }

  test("frameSample: ≤ maxFrames per asset, ordered indices, deterministic hashes") {
    val frames = Multimodal.frameSample(spark, media("video"), maxFrames = 4).collect()
    val byAsset = frames.groupBy(_.media_id)
    assert(byAsset.values.forall(_.length <= 4))
    byAsset.values.foreach { fs =>
      val idx = fs.sortBy(_.frame_idx).map(_.frame_idx)
      assert(idx.distinct.length == idx.length, "sampled frames must be distinct")
      assert(fs.forall(f => f.frame_ts_ms == f.frame_idx * 1000 / 30))
    }
    // images decode with n_frames=1 → exactly one frame row each
    val imgFrames = Multimodal.frameSample(spark, media("image"), maxFrames = 4)
    assert(imgFrames.count() == media("image").count())
  }

  test("resizePlan: aspect preserved, bounded by maxSide, no upscaling") {
    val plans = Multimodal.resizePlan(spark, media("image"), maxSide = 256).collect()
    plans.foreach { p =>
      assert(math.max(p.out_width, p.out_height) <= 256)
      assert(p.scale <= 1.0, "never upscale")
      val srcRatio = p.src_width.toDouble / p.src_height
      val outRatio = p.out_width.toDouble / p.out_height
      // relative drift: integer rounding shifts extreme ratios more in absolute terms
      assert(math.abs(srcRatio - outRatio) / srcRatio < 0.05,
        s"aspect drift: $srcRatio vs $outRatio")
    }
  }

  test("byteMeta matches bytes exactly (oracle-facing path)") {
    val m = Multimodal.byteMeta(media("text")).where(col("media_id") === 0).head()
    val raw = Tables.load(spark, sfDir, "documents").where(col("doc_id") === 0)
      .select(col("text")).head().getString(0)
    assert(m.getAs[Int]("byte_len") == raw.getBytes("UTF-8").length)
  }
}
