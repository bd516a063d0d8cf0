package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside — the lakehouse-standard layout (one row per asset, bytes
  * inline for small assets; at 100 TB the bytes column would point into an
  * object store and only metadata travels through shuffles).
  *
  * IMAGE decode is REAL: [[decodeImages]] runs `javax.imageio` (JDK-public
  * PNG/JPEG/GIF/BMP decoders, no native deps) partition-wise and batched.
  * Audio resample and video frame-sample codecs are NOT on this classpath,
  * so `decodeStub` remains a clearly-marked DETERMINISTIC FAKE for those
  * kinds: it derives plausible metadata from the bytes alone. The
  * Spark-side plumbing — schema, batching, partition-wise execution, typed
  * Dataset round-trip — is identical in both; swap `fakeDecode` for an
  * FFM codec call and nothing else changes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class DecodedRow(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      content_hash: Long)

  /** Wrap any table into the media layout (id, kind, binary payload). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("bytes"))

  /** DETERMINISTIC FAKE of a codec: metadata derived purely from bytes.
    * Replace with a real decoder (libjpeg/ffmpeg via FFM) in production.
    */
  private[operators] def fakeDecode(r: MediaRow): DecodedRow = {
    val h = r.bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b) // FNV-ish rolling hash
    val w = 64 + math.floorMod(h, 1024).toInt
    DecodedRow(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = r.bytes.length,
      width = w,
      height = 64 + math.floorMod(h >> 10, 1024).toInt,
      n_frames = if (r.kind == "video") 1 + math.floorMod(h >> 20, 300).toInt else 1,
      content_hash = h)
  }

  /** Partition-wise batch decode: the per-partition iterator is consumed in
    * `batchSize` chunks (mirrors vectorized decode batches — a real codec
    * amortizes init per batch, not per row). No shuffle; scales with splits.
    */
  def decodeStub(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[DecodedRow] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // real impl: decoder.init(); batch.map(decoder.decode); decoder.close()
          batch.map(fakeDecode)
        }
      }
  }

  // --- Real image decode (javax.imageio — JDK-public, no native deps) ---

  final case class ImageRow(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int])

  /** REAL image decode over the binary payload via `javax.imageio` (PNG /
    * JPEG / GIF / BMP — the formats the JDK ships decoders for). Same
    * partition-wise batched shape as [[decodeStub]]; undecodable payloads
    * yield NULL dimensions instead of failing the task (corrupt assets are
    * routine at corpus scale — filter `width IS NULL` into quarantine).
    * ImageIO's disk-backed cache is disabled: decode stays in-memory and
    * per-task, nothing shared mutable across the 32 executor threads.
    */
  def decodeImages(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[ImageRow] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val img =
              try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
              catch { case scala.util.control.NonFatal(_) => None } // malformed headers throw more than IOException
            ImageRow(
              media_id = r.media_id,
              kind = r.kind,
              byte_len = r.bytes.length,
              width = img.map(_.getWidth),
              height = img.map(_.getHeight),
              channels = img.map(_.getRaster.getNumBands))
          }
        }
      }
  }

  /** Deterministic synthetic PNG: a real, decodable image whose geometry
    * is a pure function of `id` — width 8 + id % 32, height 8 + (id / 32)
    * % 32, 3 channels — so an external oracle can predict what
    * [[decodeImages]] must report without running a codec (the q41 gate:
    * Spark runs id → real PNG encode → real decode → dims; DuckDB runs
    * the arithmetic; they agree only if both codec passes are faithful).
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + math.floorMod(id, 32).toInt
    val h = 8 + math.floorMod(id / 32, 32).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (id + x * 31 + y * 131).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Pure-SQL metadata extraction (byte length + checksums) — the part of
    * the media path that needs no codec, kept codegen-friendly for oracles.
    */
  def byteMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).as("byte_len"),
      md5(col("bytes")).as("md5"))

  // --- Frame sampling & resize (stubbed codec, real plumbing) ---

  final case class FrameRow(
      media_id: Long,
      frame_idx: Int,
      frame_ts_ms: Long,
      frame_hash: Long)

  /** Sample up to `maxFrames` evenly spaced frames per video: decode
    * metadata (stubbed), then EXPLODE one row per sampled frame — the
    * shape a frame-level training pipeline consumes. The explode happens
    * map-side (no shuffle); downstream per-frame feature extraction
    * parallelizes over the exploded rows.
    */
  def frameSample(spark: SparkSession, media: DataFrame, maxFrames: Int = 8): Dataset[FrameRow] = {
    import spark.implicits._
    decodeStub(spark, media).flatMap { d =>
      val n = math.min(maxFrames, d.n_frames)
      val fps = 30.0 // stub codec reports fixed fps; a real decoder returns it
      (0 until n).map { i =>
        val srcFrame = if (n <= 1) 0 else (i.toLong * (d.n_frames - 1) / (n - 1)).toInt
        FrameRow(
          media_id = d.media_id,
          frame_idx = srcFrame,
          frame_ts_ms = (srcFrame * 1000L / fps).toLong,
          // deterministic per-frame stub "content": real impl hashes pixels
          frame_hash = d.content_hash * 31 + srcFrame)
      }
    }
  }

  final case class ResizedRow(
      media_id: Long,
      src_width: Int,
      src_height: Int,
      out_width: Int,
      out_height: Int,
      scale: Double)

  /** Aspect-preserving resize planning (the real resize kernel is the
    * stubbed codec step): computes target geometry per asset so the
    * pipeline's schema/batching is exercised end-to-end.
    */
  def resizePlan(spark: SparkSession, media: DataFrame, maxSide: Int = 256): Dataset[ResizedRow] = {
    import spark.implicits._
    decodeStub(spark, media).map { d =>
      val s = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
      ResizedRow(
        media_id = d.media_id,
        src_width = d.width,
        src_height = d.height,
        out_width = math.max(1, math.round(d.width * s).toInt),
        out_height = math.max(1, math.round(d.height * s).toInt),
        scale = s)
    }
  }
}
