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
  * The actual codec work (JPEG decode, audio resample, video frame-sample)
  * requires native libraries not present in this container, so `decodeStub`
  * is a clearly-marked DETERMINISTIC FAKE: it derives plausible metadata
  * from the bytes alone. The Spark-side plumbing — schema, batching,
  * partition-wise execution, typed Dataset round-trip — is real and is what
  * the tests cover. Swap `fakeDecode` for a JNI/FFM codec call and nothing
  * else changes.
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

  /** Pure-SQL metadata extraction (byte length + checksums) — the part of
    * the media path that needs no codec, kept codegen-friendly for oracles.
    */
  def byteMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).as("byte_len"),
      md5(col("bytes")).as("md5"))
}
