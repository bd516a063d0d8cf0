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
  * FRAME SAMPLING is REAL too: [[frameSample]] walks a multi-frame
  * container (animated GIF — the multi-frame format the JDK ships a
  * decoder for) through `ImageReader.getNumImages`/`read(i)`, evenly
  * sampling up to `maxFrames` actually-decoded frames. AUDIO metadata
  * decode is REAL as well: [[decodeAudio]] parses PCM containers
  * (WAV/AIFF/AU) through `javax.sound.sampled` — headless-safe, JDK-only.
  * JPEG is fully inside the real path too — `javax.imageio` ships both
  * the baseline decoder and an encoder, so [[decodeImages]] /
  * [[frameSample]] / [[resizeImages]] handle JPEG payloads exactly like
  * PNG (oracle-gated by q95 via [[syntheticJpeg]]).
  *
  * UNSUPPORTED-FORMAT CONTRACT (no fake entry point): bitstreams the JDK
  * has no decoder for — MP3/AAC audio, video codecs (H.264 etc.) — ride
  * the SAME real decoders and quarantine by each operator's existing
  * convention: [[decodeImages]] emits the row with NULL dimensions,
  * [[frameSample]] and [[resizeImages]] omit the asset (exploding-op
  * convention), [[decodeAudio]] emits NULL format fields. Nothing throws,
  * nothing fabricates metadata; `WHERE width IS NULL` (or an anti-join
  * against the decoded ids) is the quarantine feed, and [[byteMeta]]
  * still profiles the undecoded payload. Adding a real codec via FFM
  * later changes which payloads decode, not any schema or plan shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Wrap any table into the media layout (id, kind, binary payload). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("bytes"))

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
    * partition-wise batched shape a vectorized codec wants; undecodable payloads
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

  /** Deterministic synthetic baseline JPEG — the [[syntheticPng]] gate
    * extended to the JDK's lossy codec: width 8 + id % 48, height
    * 8 + (id / 48) % 48, 3 channels (ImageIO ships a real JPEG
    * encoder/decoder; only pixel VALUES are lossy — geometry and band
    * count survive exactly, which is what the q95 oracle predicts).
    */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val w = 8 + math.floorMod(id, 48).toInt
    val h = 8 + math.floorMod(id / 48, 48).toInt
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
    javax.imageio.ImageIO.write(img, "jpg", out)
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

  // --- Frame sampling (REAL multi-frame decode) & resize planning ---

  final case class FrameRow(
      media_id: Long,
      frame_idx: Int,
      n_frames: Int,
      width: Int,
      height: Int,
      frame_hash: Long)

  /** Deterministic pixel-content hash of a decoded frame — the input to
    * downstream frame-level dedup/fingerprinting.
    */
  private def pixelHash(img: java.awt.image.BufferedImage): Long = {
    var h = 1125899906842597L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = h * 31 + img.getRGB(x, y)
        x += 1
      }
      y += 1
    }
    h
  }

  /** REAL frame sampling: open the payload with the JDK's `ImageReader`,
    * count its frames (`getNumImages(true)` — animated GIF is the
    * multi-frame container the JDK decodes), DECODE up to `maxFrames`
    * evenly spaced frames, and emit one row per sampled frame with its
    * true dimensions and pixel hash — the shape a frame-level training
    * pipeline consumes. The explode happens map-side (no shuffle);
    * downstream per-frame feature extraction parallelizes over the
    * exploded rows. Undecodable payloads yield ZERO rows (the width-NULL
    * quarantine convention of [[decodeImages]], adapted to an exploding
    * operator — corrupt assets are routine at corpus scale and must not
    * fail the task). Sampled indices are strictly increasing:
    * `i · (n−1) / (k−1)` for k = min(maxFrames, n) ≤ n.
    */
  def frameSample(spark: SparkSession, media: DataFrame, maxFrames: Int = 8): Dataset[FrameRow] = {
    import spark.implicits._
    require(maxFrames >= 1, "maxFrames must be at least 1")
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Nil }
          else {
            val reader = readers.next()
            try {
              // seekForwardOnly=false: getNumImages(true) walks the whole
              // container, then read(i) seeks back to the sampled frames
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              val k = math.min(maxFrames, n)
              (0 until k).map { i =>
                val src = if (k <= 1) 0 else (i.toLong * (n - 1) / (k - 1)).toInt
                val img = reader.read(src)
                FrameRow(r.media_id, src, n, img.getWidth, img.getHeight, pixelHash(img))
              }
            } catch {
              case scala.util.control.NonFatal(_) => Nil
            } finally {
              reader.dispose()
              iis.close()
            }
          }
        }
      }
  }

  // --- Real audio decode (javax.sound.sampled — JDK-public, no native deps) ---

  final case class AudioRow(
      media_id: Long,
      kind: String,
      byte_len: Int,
      sample_rate: Option[Int],
      channels: Option[Int],
      n_samples: Option[Long],
      duration_ms: Option[Long])

  /** REAL audio metadata decode over the binary payload via
    * `javax.sound.sampled.AudioSystem` (WAV / AIFF / AU — the PCM
    * containers the JDK ships parsers for; headless-safe, no native
    * deps). Same partition-wise batched shape and NULL-quarantine
    * convention as [[decodeImages]]: undecodable payloads keep their
    * row with NULL audio fields. `duration_ms` floors
    * (frames · 1000) / rate — exact integer arithmetic, so an oracle
    * can predict it.
    */
  def decodeAudio(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[AudioRow] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val meta =
              try {
                val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(r.bytes)))
                try {
                  val fmt = in.getFormat
                  // AudioSystem.NOT_SPECIFIED (-1) frame length means the
                  // container does not declare its sample count — treat as
                  // undecodable so it lands in the NULL-field quarantine
                  // rather than reporting n_samples=-1 / negative duration
                  if (in.getFrameLength < 0) None
                  else Some((fmt.getSampleRate.toInt, fmt.getChannels, in.getFrameLength))
                } finally in.close()
              } catch { case scala.util.control.NonFatal(_) => None }
            AudioRow(
              media_id = r.media_id,
              kind = r.kind,
              byte_len = r.bytes.length,
              sample_rate = meta.map(_._1),
              channels = meta.map(_._2),
              n_samples = meta.map(_._3),
              duration_ms = meta.map(m => m._3 * 1000L / m._1))
          }
        }
      }
  }

  /** Deterministic synthetic PCM WAV: a real, decodable audio payload
    * whose format is a pure function of `id` — sample rate one of
    * {8000, 16000, 22050, 44100} by id % 4, channels 1 + id % 2,
    * n_samples 100 + id % 400, 16-bit little-endian PCM — so an external
    * oracle predicts what [[decodeAudio]] must report without running a
    * parser (the q41/q42 gate, extended to audio).
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val rates = Array(8000, 16000, 22050, 44100)
    val rate = rates(math.floorMod(id, 4).toInt)
    val channels = 1 + math.floorMod(id, 2).toInt
    val nSamples = 100 + math.floorMod(id, 400).toInt
    val data = new Array[Byte](nSamples * channels * 2)
    var i = 0
    while (i < nSamples * channels) {
      val v = ((id + i * 2654435761L) % 65536 - 32768).toInt // deterministic content
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
    val out = new java.io.ByteArrayOutputStream()
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic synthetic animated GIF: a real, decodable multi-frame
    * container whose frame count and geometry are pure functions of `id`
    * — `n_frames = 1 + id % 7`, width/height the [[syntheticPng]]
    * arithmetic — so an external oracle predicts what [[frameSample]]
    * must report without running a codec (the q42 gate, the exact move
    * that flipped q41: Spark runs id → real GIF encode → real multi-frame
    * decode; DuckDB runs the arithmetic).
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = 8 + math.floorMod(id, 32).toInt
    val h = 8 + math.floorMod(id / 32, 32).toInt
    val n = 1 + math.floorMod(id, 7).toInt
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < n) {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (id + x * 31 + y * 131 + f * 7919).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  final case class ResizedImageRow(
      media_id: Long,
      src_width: Int,
      src_height: Int,
      out_width: Int,
      out_height: Int,
      out_bytes: Array[Byte])

  /** REAL aspect-preserving image resize: `javax.imageio` decode →
    * bilinear AWT rescale to fit `maxSide` (never upscale) → PNG
    * re-encode, all JDK-public. One row per DECODABLE asset
    * (undecodable payloads quarantine by omission — the [[frameSample]]
    * convention; pair with [[decodeImages]]'s NULL rows to audit them).
    * The output geometry is exact integer arithmetic on the true source
    * dims, so an oracle predicts it; `out_bytes` is a real re-encoded
    * image for downstream storage, deterministic given the decoded
    * pixels. Partition-wise, zero shuffle — 100 TB of thumbnails is one
    * scan emitting thumbnail rows.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, maxSide: Int = 256): Dataset[ResizedImageRow] = {
    import spark.implicits._
    require(maxSide >= 1, "maxSide must be at least 1")
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val src =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          src.map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val s = math.min(1.0, maxSide.toDouble / math.max(w, h))
            val ow = math.max(1, math.round(w * s).toInt)
            val oh = math.max(1, math.round(h * s).toInt)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, ow, oh, null)
            } finally g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            ResizedImageRow(r.media_id, w, h, ow, oh, buf.toByteArray)
          }
        }
      }
  }

  // --- Perceptual fingerprints (image dHash, audio energy envelope) ---

  final case class DHashRow(
      media_id: Long,
      width: Option[Int],
      height: Option[Int],
      dhash: Option[Long])

  /** Perceptual 64-bit image dHash over the REAL decoded pixels — the
    * near-dup fingerprint for image corpora ([[pixelHash]] is EXACT
    * content identity; this survives re-encoding and mild edits). All
    * arithmetic is EXACT integers so an external engine can replay it
    * from a pixel formula:
    *
    *  - gray(x,y) = (299·r + 587·g + 114·b) div 1000 (integer luma);
    *  - a 9×8 POINT-SAMPLED grid (never a resampling kernel — kernels
    *    are codec-private): column x_i = i·w div 9 for i ∈ 0..8, row
    *    y_j = j·h div 8 for j ∈ 0..7 (always in-bounds for w,h ≥ 1);
    *  - bit (j·8+i) = 1 iff gray(x_{i+1}, y_j) > gray(x_i, y_j) — the
    *    classic horizontal-gradient sign.
    *
    * Undecodable payloads quarantine with NULL dims AND NULL dhash (the
    * [[decodeImages]] convention) — and [[graft.operators.Dedup
    * .hammingPairs64]] drops NULL signatures rather than flooding a
    * bucket. Partition-wise, zero shuffle; the pairing step downstream
    * is the only exchange.
    */
  def dHashImages(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[DHashRow] = {
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
              catch { case scala.util.control.NonFatal(_) => None }
            DHashRow(
              media_id = r.media_id,
              width = img.map(_.getWidth),
              height = img.map(_.getHeight),
              dhash = img.map(dHash))
          }
        }
      }
  }

  /** The dHash bit fold of [[dHashImages]], exposed for frame-level use. */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    def gray(x: Int, y: Int): Int = {
      val v = img.getRGB(x, y) & 0xffffff
      (299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255) + 114 * (v & 255)) / 1000
    }
    var acc = 0L
    var j = 0
    while (j < 8) {
      val y = j * h / 8
      var i = 0
      while (i < 8) {
        if (gray((i + 1) * w / 9, y) > gray(i * w / 9, y)) acc |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    acc
  }

  /** Image near-dup pairs: [[dHashImages]] fingerprints through the
    * banded-Hamming machinery ([[graft.operators.Dedup.hammingPairs64]] —
    * 16-bit×4-band blocking, exact recall for `maxHamming ≤ 3`, hot-bucket
    * cap as the boilerplate-corpus scale path). Emits
    * `(id_a, id_b, hamming)` with `id_a < id_b`. ONE decode pass over the
    * corpus (fingerprints are 8 bytes/image from there on), one banding
    * exchange — the 100 TB image-dedup shape; never all-pairs.
    */
  def imageNearDupPairs(
      spark: SparkSession,
      media: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame =
    Dedup.hammingPairs64(
      dHashImages(spark, media).toDF().where(col("dhash").isNotNull),
      "media_id", "dhash", maxHamming, maxBucket)

  final case class AudioFpRow(
      media_id: Long,
      n_interleaved: Option[Long],
      fingerprint: Option[Long])

  /** Perceptual audio fingerprint over the REAL decoded PCM stream: the
    * energy-envelope gradient ([[dHashImages]]'s move on audio). The
    * interleaved 16-bit samples are cut into `frames` equal-index frames
    * (default 33 → a 32-bit fingerprint, the q125 oracle face; use 65 →
    * 64 bits when the fingerprint feeds the banded pairing machinery,
    * whose 4×16-bit geometry assumes signature entropy in every band —
    * [[audioNearDupPairs]] does this). Frame f covers interleaved
    * indices [f·N div frames, (f+1)·N div frames); frame energy = mean
    * |amplitude| under truncating integer division; bit f = 1 iff
    * energy(f+1) > energy(f).
    * Exact integer arithmetic end-to-end, so an oracle replays it from a
    * sample formula. Interleaved — not per-channel — framing: for
    * multi-channel audio each frame averages over all channels, so the
    * envelope is channel-agnostic (a mono mixdown's coarse shape, not an
    * exact channel-permutation invariant — frame cuts can split a sample
    * group); empty frames are impossible for N ≥ 33 and clips
    * shorter than that quarantine (NULL fingerprint, the
    * [[decodeAudio]] convention). Streams that do not declare a frame
    * length, or decline to decode to PCM, quarantine the same way
    * (as do clips shorter than `frames` interleaved samples).
    */
  def audioFingerprint(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64,
      frames: Int = 33): Dataset[AudioFpRow] = {
    require(frames >= 2 && frames <= 65, "frames-1 gradient bits must fit a long")
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val samples =
              try {
                val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(r.bytes)))
                try {
                  val fmt = in.getFormat
                  if (in.getFrameLength < 0 || fmt.getSampleSizeInBits != 16 ||
                    fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                    None
                  else {
                    val bytes = in.readAllBytes()
                    val n = bytes.length / 2
                    val out = new Array[Int](n)
                    var i = 0
                    if (fmt.isBigEndian)
                      while (i < n) {
                        out(i) = (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff); i += 1
                      }
                    else
                      while (i < n) {
                        out(i) = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff); i += 1
                      }
                    Some(out)
                  }
                } finally in.close()
              } catch { case scala.util.control.NonFatal(_) => None }
            val fp = samples.filter(_.length >= frames).map { s =>
              val n = s.length
              def energy(f: Int): Long = {
                val lo = f * n / frames
                val hi = (f + 1) * n / frames
                var sum = 0L
                var i = lo
                while (i < hi) { sum += math.abs(s(i).toLong); i += 1 }
                sum / (hi - lo)
              }
              var acc = 0L
              var f = 0
              var prev = energy(0)
              while (f < frames - 1) {
                val next = energy(f + 1)
                if (next > prev) acc |= 1L << f
                prev = next
                f += 1
              }
              acc
            }
            AudioFpRow(
              media_id = r.media_id,
              n_interleaved = samples.map(_.length.toLong),
              fingerprint = fp)
          }
        }
      }
  }
  /** Audio NEAR-DUP pairs: 64-bit energy-envelope fingerprints (65
    * frames) through [[graft.operators.Dedup.hammingPairs64]] — the
    * [[imageNearDupPairs]] shape on the audio modality. A 32-bit
    * fingerprint would leave bands 2–3 all-zero (every clip in one
    * bucket — a flood that degenerates to all-pairs), which is why the
    * pairing face widens to 64 bits rather than reusing the q125 oracle
    * face's 33 frames. Emits `(id_a, id_b, hamming)`, NULL fingerprints
    * quarantined.
    */
  def audioNearDupPairs(
      spark: SparkSession,
      media: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame =
    Dedup.hammingPairs64(
      audioFingerprint(spark, media, frames = 65).toDF()
        .where(col("fingerprint").isNotNull),
      "media_id", "fingerprint", maxHamming, maxBucket)

  final case class FrameDHashRow(
      media_id: Long,
      frame_idx: Int,
      n_frames: Int,
      dhash: Long)

  /** Frame-level dHash over a multi-frame container (animated GIF — the
    * video-shaped format the JDK decodes): [[frameSample]]'s REAL
    * `ImageReader` walk emitting the perceptual [[dHash]] per sampled
    * frame instead of the exact pixel hash — the input to video-style
    * near-dup. Undecodable payloads yield zero rows (the frameSample
    * exploding-op convention); single-frame images emit one row, so
    * stills and clips share one fingerprint space.
    */
  def frameDHashes(
      spark: SparkSession, media: DataFrame, maxFrames: Int = 8): Dataset[FrameDHashRow] = {
    import spark.implicits._
    require(maxFrames >= 1, "maxFrames must be at least 1")
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Seq.empty }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              val k = math.min(maxFrames, n)
              (0 until k).flatMap { i =>
                val src = if (k <= 1) 0 else (i.toLong * (n - 1) / (k - 1)).toInt
                try {
                  val img = reader.read(src)
                  Some(FrameDHashRow(r.media_id, src, n, dHash(img)))
                } catch { case scala.util.control.NonFatal(_) => None }
              }
            } catch { case scala.util.control.NonFatal(_) => Seq.empty }
            finally { reader.dispose(); iis.close() }
          }
        }
      }
  }

  /** Multi-frame asset near-dup: two assets pair when they share at
    * least `minShared` identical FRAME fingerprints — the clip-level
    * dedup a video corpus needs (re-encoded or re-containered clips
    * keep their frame dHashes; trimmed clips keep most). The join is on
    * the 8-byte frame fingerprint (never pixels), distinct-counted per
    * asset pair; at scale this is one exchange keyed on dhash whose
    * per-key fan-out is the number of assets sharing a frame — cap
    * boilerplate frames (intros, test patterns) upstream with a
    * frequency filter if a corpus has them.
    */
  def multiFrameNearDupPairs(
      spark: SparkSession,
      media: DataFrame,
      maxFrames: Int = 8,
      minShared: Int = 2): DataFrame = {
    val frames = Caches.pin(
      frameDHashes(spark, media, maxFrames).toDF()
        .select(col("media_id"), col("dhash")).distinct())
    val a = frames.select(col("media_id").as("id_a"), col("dhash"))
    val b = frames.select(col("media_id").as("id_b"), col("dhash"))
    a.join(b, Seq("dhash"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

}
