package graft.sources

import java.io.{BufferedInputStream, EOFException, IOException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WET (WARC `conversion` records — the Common Crawl extracted-text
  * format) source and sink. This is the file format a crawl-derived
  * corpus actually ARRIVES in, so ingesting it natively removes the
  * usual "someone else converts WET→parquet first" preprocessing hop.
  *
  * Parsing discipline: a WARC record's payload length comes ONLY from
  * its `Content-Length` header (bytes, not chars) — the payload may
  * itself contain blank lines or literal `WARC/1.0` text, so splitting
  * on separators is wrong by construction. The reader consumes exactly
  * `Content-Length` bytes per record and then the two CRLF record
  * delimiters, and fails LOUDLY (file + record context) on a malformed
  * header rather than resynchronizing heuristically: a corrupt shard is
  * quarantined by the caller, not silently half-read.
  *
  * Scale model: one task per WET shard (`binaryFiles` streams each file;
  * nothing is materialized whole). Gzip shards are unsplittable — the
  * crawl convention is per-RECORD gzip members concatenated into one
  * `.warc.wet.gz`, which `GZIPInputStream` reads transparently as one
  * stream — so shard size (CC uses ~150 MB) is the read-parallelism
  * knob, exactly as with the JSONL shards of [[JsonlSource]].
  */
object Wet {

  val schema: StructType = StructType(Seq(
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("record_id", StringType),
    StructField("content_language", StringType),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content", StringType, nullable = false)))

  private final case class Rec(
      warcType: String,
      uri: Option[String],
      date: Option[String],
      id: Option[String],
      lang: Option[String],
      payload: Array[Byte])

  /** One parsed conversion record, encoder-friendly for streaming use. */
  final case class WetRecord(
      target_uri: String,
      warc_date: String,
      record_id: String,
      content_language: String,
      n_bytes: Long,
      content: String)

  /** Parse one shard ALREADY IN MEMORY — the shape Structured
    * Streaming's `binaryFile` source hands over (whole file per row).
    * Same strict Content-Length parser as [[read]]; gzip by extension.
    * Shard size is bounded by the crawl convention (~150 MB), so the
    * in-memory form is safe where a whole TABLE in memory would not be.
    */
  def parseShard(file: String, bytes: Array[Byte]): Iterator[WetRecord] = {
    val raw = new java.io.ByteArrayInputStream(bytes)
    val in: InputStream =
      if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
    recordIterator(in, file)
      .filter(_.warcType.equalsIgnoreCase("conversion"))
      .map(r => WetRecord(
        r.uri.orNull, r.date.orNull, r.id.orNull, r.lang.orNull,
        r.payload.length.toLong, new String(r.payload, UTF_8)))
  }

  /** Read every `conversion` record under `path` (a directory of
    * `.warc.wet[.gz]` shards or a single shard). Non-conversion records
    * (`warcinfo`, `metadata`, …) are structural and skipped. Payloads
    * decode as UTF-8 (the WET contract); `n_bytes` preserves the
    * on-the-wire byte length so byte-budget accounting survives decode.
    */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions
                else spark.sparkContext.defaultMinPartitions
    val rdd = spark.sparkContext.binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        val in: InputStream =
          if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
        recordIterator(in, file)
      }
      .filter(_.warcType.equalsIgnoreCase("conversion"))
      .map(r => Row(
        r.uri.orNull, r.date.orNull, r.id.orNull, r.lang.orNull,
        r.payload.length.toLong, new String(r.payload, UTF_8)))
    spark.createDataFrame(rdd, schema)
  }

  // ---------------------------------------------------------------
  // parser
  // ---------------------------------------------------------------

  /** One record at a time off the stream; closes `in` at clean EOF. */
  private def recordIterator(in: InputStream, file: String): Iterator[Rec] =
    new Iterator[Rec] {
      private var nextRec: Rec = _
      private var done = false
      private var recNo = 0

      private def ctx = s"$file record #$recNo"

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }

      override def next(): Rec = {
        if (!hasNext) throw new NoSuchElementException(ctx)
        val r = nextRec; nextRec = null; r
      }

      private def advance(): Unit = {
        // Tolerate any run of blank lines between records (writers vary
        // between one and two trailing CRLFs per record).
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; in.close(); return }
        recNo += 1
        if (!line.startsWith("WARC/"))
          throw new IOException(s"$ctx: expected WARC version line, got '${line.take(80)}'")
        var warcType: String = null
        var uri, date, id, lang: Option[String] = None
        var len = -1L
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val colon = h.indexOf(':')
          if (colon < 0) throw new IOException(s"$ctx: malformed header line '${h.take(80)}'")
          val k = h.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val v = h.substring(colon + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = Some(v)
            case "warc-date" => date = Some(v)
            case "warc-record-id" => id = Some(v)
            case "warc-identified-content-language" => lang = Some(v)
            case "content-length" => len = v.toLong
            case _ => // other headers are legal and irrelevant here
          }
          h = readLine(in)
        }
        if (h == null) throw new IOException(s"$ctx: EOF inside header block")
        if (len < 0) throw new IOException(s"$ctx: missing Content-Length")
        if (warcType == null) throw new IOException(s"$ctx: missing WARC-Type")
        val payload = new Array[Byte](len.toInt)
        var off = 0
        while (off < payload.length) {
          val n = in.read(payload, off, payload.length - off)
          if (n < 0) throw new EOFException(
            s"$ctx: EOF at payload byte $off of ${payload.length}")
          off += n
        }
        nextRec = Rec(warcType, uri, date, id, lang, payload)
      }
    }

  /** Read one header line: bytes to LF, strip trailing CR, decode UTF-8.
    * Returns null at EOF before any byte. Byte-level on purpose — the
    * payload that follows is counted in bytes, so no decoding Reader may
    * ever buffer ahead of the header block.
    */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, UTF_8)
  }

  // ---------------------------------------------------------------
  // writer
  // ---------------------------------------------------------------

  /** Write `df` as a directory of WET shards: one `part-NNNNN.warc.wet
    * [.gz]` per non-empty partition, each headed by a `warcinfo` record,
    * then one `conversion` record per row. Gzip shards follow the crawl
    * convention of one gzip MEMBER per record (readable as one stream,
    * seekable per-record by an index-holding consumer).
    *
    * Deterministic by contract: record IDs are name-based UUIDs of the
    * target URI and `warcDate` is caller-supplied, so the same frame
    * writes byte-identical shards on every run (modulo row partitioning —
    * pin with a `repartition`/`sortWithinPartitions` upstream if exact
    * file bytes matter). NULL uri or content fails loudly: WET has no
    * null payload concept — filter or coalesce upstream.
    *
    * The write stages into a sibling directory and renames in — atomic
    * on HDFS/local (on object stores, front with a manifest commit). On
    * a real cluster pass the driver's serialized Hadoop conf instead of
    * the executor-local `new Configuration()` used here.
    */
  def write(
      df: DataFrame,
      uriCol: String,
      contentCol: String,
      path: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      langCol: Option[String] = None,
      gzip: Boolean = true,
      numShards: Option[Int] = None): Unit = {
    numShards.foreach(n => require(n > 0, s"numShards must be positive, got $n"))
    val cols = Seq(uriCol, contentCol) ++ langCol.toSeq
    val slim0 = df.selectExpr(cols.map(c => s"`$c`"): _*)
    // one shard per partition: by default write parallelism FOLLOWS the
    // input's partitioning (the 100 TB shape — a 10k-partition corpus
    // writes 10k shards in parallel); numShards is the explicit knob
    // for fixtures and ~150 MB shard-size targeting, never a default
    val slim = numShards.fold(slim0)(n => slim0.repartition(n))
    val staging = path + ".__wet_staging"
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val stagePath = new Path(staging)
    val fs = stagePath.getFileSystem(conf)
    fs.delete(stagePath, true)
    fs.mkdirs(stagePath)
    val ext = if (gzip) ".warc.wet.gz" else ".warc.wet"
    val hasLang = langCol.isDefined
    slim.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val file = new Path(staging, f"part-$pid%05d$ext")
        val out = file.getFileSystem(new Configuration()).create(file, true)
        try {
          writeRecord(out, gzip, warcinfoHeaders(warcDate),
            "software: graft-wet/1.0\r\n".getBytes(UTF_8))
          rows.foreach { row =>
            if (row.isNullAt(0)) throw new IOException(
              s"NULL $uriCol in WET write (partition $pid): WET records require a target URI")
            if (row.isNullAt(1)) throw new IOException(
              s"NULL $contentCol in WET write (partition $pid): WET has no null payload; filter or coalesce upstream")
            val uri = row.getString(0)
            val payload = row.getString(1).getBytes(UTF_8)
            val lang = if (hasLang && !row.isNullAt(2)) Some(row.getString(2)) else None
            writeRecord(out, gzip, conversionHeaders(uri, warcDate, lang, payload.length), payload)
          }
        } finally out.close()
      }
    }
    val target = new Path(path)
    fs.delete(target, true)
    if (!fs.rename(stagePath, target))
      throw new IOException(s"could not commit WET output $staging -> $path")
  }

  private def warcinfoHeaders(date: String): String =
    "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes("warcinfo".getBytes(UTF_8))}>\r\n" +
      "Content-Type: application/warc-fields\r\n"

  private def conversionHeaders(
      uri: String, date: String, lang: Option[String], len: Int): String =
    "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes(uri.getBytes(UTF_8))}>\r\n" +
      lang.map(l => s"WARC-Identified-Content-Language: $l\r\n").getOrElse("") +
      "Content-Type: text/plain\r\n"

  /** One record = headers + Content-Length + blank line + payload + two
    * CRLFs; under gzip, the whole record is one gzip member (`finish()`
    * seals the member without closing the shard stream).
    */
  private def writeRecord(
      out: OutputStream, gzip: Boolean, headersNoLen: String, payload: Array[Byte]): Unit = {
    val sink: OutputStream = if (gzip) new GZIPOutputStream(out, 1 << 16) else out
    sink.write((headersNoLen + s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8))
    sink.write(payload)
    sink.write("\r\n\r\n".getBytes(UTF_8))
    sink match {
      case gz: GZIPOutputStream => gz.finish()
      case _ => sink.flush()
    }
  }
}
