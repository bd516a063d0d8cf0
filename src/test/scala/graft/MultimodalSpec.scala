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

  test("decodeImages: real javax.imageio decode reports true geometry per format") {
    // PNG via the synthetic generator: dims are a pure function of id
    val png = Seq(0L, 1L, 31L, 32L, 1023L)
      .map(id => (id, "image", Multimodal.syntheticPng(id)))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.decodeImages(spark, png).collect().map(r => r.media_id -> r).toMap
    Seq(0L, 1L, 31L, 32L, 1023L).foreach { id =>
      val r = out(id)
      assert(r.width.contains(8 + (id % 32).toInt), s"id=$id width=${r.width}")
      assert(r.height.contains(8 + ((id / 32) % 32).toInt), s"id=$id height=${r.height}")
      assert(r.channels.contains(3))
      assert(r.byte_len > 0)
    }
    // a 4-channel (ARGB) and a grayscale image report their true band count
    def enc(img: java.awt.image.BufferedImage): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    val argb = new java.awt.image.BufferedImage(5, 7, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val gray = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val mixed = Seq((1L, "image", enc(argb)), (2L, "image", enc(gray)))
      .toDF("media_id", "kind", "bytes")
    val m = Multimodal.decodeImages(spark, mixed).collect().map(r => r.media_id -> r).toMap
    assert(m(1L).width.contains(5) && m(1L).height.contains(7) && m(1L).channels.contains(4))
    assert(m(2L).width.contains(3) && m(2L).height.contains(2) && m(2L).channels.contains(1))
  }

  test("decodeImages: undecodable payloads yield NULL dims, never a task failure") {
    val junk = Seq(
      (1L, "image", "not an image at all".getBytes("UTF-8")),
      (2L, "image", Array.empty[Byte]),
      (3L, "image", Multimodal.syntheticPng(3L).take(10))) // truncated header
      .toDF("media_id", "kind", "bytes")
    val rows = Multimodal.decodeImages(spark, junk).collect()
    assert(rows.length == 3, "every payload yields a row")
    assert(rows.forall(r => r.width.isEmpty && r.height.isEmpty && r.channels.isEmpty))
    // quarantine filter shape: NULL width routes out
    val ok = Multimodal.decodeImages(spark, junk).toDF().where(col("width").isNotNull)
    assert(ok.count() == 0)
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
