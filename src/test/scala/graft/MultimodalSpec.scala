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

  test("frameSample: real GIF decode — true frame counts, dims, sampled indices") {
    // ids chosen to cover n_frames = 1 (id 7 → 1 + 7%7) through 7 (id 6)
    val gifs = Seq(0L, 3L, 6L, 7L, 40L)
      .map(id => (id, "video", Multimodal.syntheticGif(id)))
      .toDF("media_id", "kind", "bytes")
    val frames = Multimodal.frameSample(spark, gifs, maxFrames = 4).collect()
    val byAsset = frames.groupBy(_.media_id)
    assert(byAsset.keySet == Set(0L, 3L, 6L, 7L, 40L), "every decodable asset yields rows")
    byAsset.foreach { case (id, fs) =>
      val nf = 1 + (id % 7).toInt
      assert(fs.forall(_.n_frames == nf), s"id=$id must report its true frame count $nf")
      assert(fs.length == math.min(4, nf), "k = min(maxFrames, n_frames) rows")
      val idx = fs.map(_.frame_idx).sorted
      assert(idx.distinct.length == idx.length, "sampled frames must be distinct")
      assert(idx.head == 0, "the first frame is always sampled")
      if (nf > 1) assert(idx.last == nf - 1, "the last frame is always sampled when n > 1")
      assert(fs.forall(f => f.width == 8 + (id % 32).toInt && f.height == 8 + ((id / 32) % 32).toInt),
        "decoded dims must be the encoded geometry")
    }
    // frames differ in content → distinct pixel hashes within an asset
    val multi = byAsset(6L)
    assert(multi.map(_.frame_hash).distinct.length == multi.length,
      "per-frame pixel hashes must reflect distinct decoded content")
    // determinism across runs
    val again = Multimodal.frameSample(spark, gifs, maxFrames = 4).collect()
    assert(frames.sortBy(f => (f.media_id, f.frame_idx)).toSeq ==
      again.sortBy(f => (f.media_id, f.frame_idx)).toSeq)
  }

  test("frameSample: undecodable payloads yield zero rows, single-frame PNGs one") {
    val junk = media("video") // text bytes are not a decodable container
    assert(Multimodal.frameSample(spark, junk, maxFrames = 4).count() == 0L)
    val png = Seq((1L, "image", Multimodal.syntheticPng(1L)))
      .toDF("media_id", "kind", "bytes")
    val rows = Multimodal.frameSample(spark, png, maxFrames = 4).collect()
    assert(rows.length == 1 && rows.head.frame_idx == 0 && rows.head.n_frames == 1)
  }

  test("decodeAudio: real WAV parse reports true format; junk quarantines as NULL") {
    val wavs = Seq(0L, 1L, 2L, 3L, 401L)
      .map(id => (id, "audio", Multimodal.syntheticWav(id)))
      .toDF("media_id", "kind", "bytes")
    val rows = Multimodal.decodeAudio(spark, wavs).collect().map(r => r.media_id -> r).toMap
    assert(rows.size == 5)
    val rates = Array(8000, 16000, 22050, 44100)
    rows.foreach { case (id, r) =>
      assert(r.sample_rate.contains(rates((id % 4).toInt)), s"id=$id rate=${r.sample_rate}")
      assert(r.channels.contains(1 + (id % 2).toInt))
      assert(r.n_samples.contains(100L + id % 400))
      val exp = (100L + id % 400) * 1000L / rates((id % 4).toInt)
      assert(r.duration_ms.contains(exp))
    }
    val junk = media("audio") // text bytes are not a PCM container
    val decoded = Multimodal.decodeAudio(spark, junk).collect()
    assert(decoded.length == junk.count(), "undecodable rows survive with NULL fields")
    assert(decoded.forall(r => r.sample_rate.isEmpty && r.n_samples.isEmpty))
  }

  test("JPEG rides the REAL image path: decode dims exact, resize output decodable") {
    val jpg = Seq(0L, 47L, 48L, 2303L)
      .map(id => (id, "image", Multimodal.syntheticJpeg(id)))
      .toDF("media_id", "kind", "bytes")
    val dec = Multimodal.decodeImages(spark, jpg).collect().map(r => r.media_id -> r).toMap
    assert(dec.keySet == Set(0L, 47L, 48L, 2303L))
    dec.foreach { case (id, r) =>
      assert(r.width.contains(8 + (id % 48).toInt), s"id=$id width=${r.width}")
      assert(r.height.contains(8 + ((id / 48) % 48).toInt))
      assert(r.channels.contains(3), "baseline JPEG decodes to 3 bands")
    }
    // resize accepts JPEG input like PNG: geometry law holds, output decodes
    val rs = Multimodal.resizeImages(spark, jpg, maxSide = 16).collect()
    assert(rs.length == 4)
    rs.foreach { r =>
      val w = r.src_width; val h = r.src_height
      val s = math.min(1.0, 16.0 / math.max(w, h))
      assert(r.out_width == math.max(1, math.round(w * s).toInt))
      assert(r.out_height == math.max(1, math.round(h * s).toInt))
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.out_bytes))
      assert(back != null && back.getWidth == r.out_width && back.getHeight == r.out_height)
    }
  }

  test("decodeAudio: unspecified frame length (AU unknown data size) quarantines, not -1") {
    // A valid AU container whose header declares data size 0xFFFFFFFF
    // ("unknown") — the JDK parses it but reports frameLength
    // NOT_SPECIFIED (-1); that must quarantine like malformed audio,
    // never surface as n_samples=-1 / negative duration_ms.
    val b = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(b)
    d.writeInt(0x2e736e64) // ".snd" magic
    d.writeInt(24)         // data offset
    d.writeInt(0xFFFFFFFF) // data size: unknown
    d.writeInt(3)          // encoding: 16-bit linear PCM
    d.writeInt(8000)       // sample rate
    d.writeInt(1)          // channels
    d.write(new Array[Byte](200))
    val au = Seq((7L, "audio", b.toByteArray)).toDF("media_id", "kind", "bytes")
    val rows = Multimodal.decodeAudio(spark, au).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.byte_len == 224)
    assert(r.sample_rate.isEmpty && r.channels.isEmpty &&
      r.n_samples.isEmpty && r.duration_ms.isEmpty,
      s"unspecified-length audio must NULL-quarantine, got $r")
  }

  test("resizeImages: real decode → rescale → re-encode; geometry exact, output decodable") {
    val png = Seq(0L, 31L, 40L, 1023L)
      .map(id => (id, "image", Multimodal.syntheticPng(id)))
      .toDF("media_id", "kind", "bytes")
    val rows = Multimodal.resizeImages(spark, png, maxSide = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(rows.keySet == Set(0L, 31L, 40L, 1023L))
    rows.foreach { case (id, r) =>
      val w = 8 + (id % 32).toInt
      val h = 8 + ((id / 32) % 32).toInt
      assert(r.src_width == w && r.src_height == h, s"id=$id true source dims")
      val s = math.min(1.0, 16.0 / math.max(w, h))
      assert(r.out_width == math.max(1, math.round(w * s).toInt))
      assert(r.out_height == math.max(1, math.round(h * s).toInt))
      // the emitted bytes are a REAL image: decode them back
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.out_bytes))
      assert(back.getWidth == r.out_width && back.getHeight == r.out_height,
        "re-encoded thumbnail must decode to the reported geometry")
    }
    // small sources (≤ maxSide) pass through unscaled
    val small = rows(0L) // 8×8
    assert(small.out_width == 8 && small.out_height == 8, "never upscale")
    // undecodable payloads are omitted, not nulled (exploding-op convention)
    assert(Multimodal.resizeImages(spark, media("image"), maxSide = 16).count() == 0L)
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
