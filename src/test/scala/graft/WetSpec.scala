package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Wet

class WetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_wet_spec").toString

  private def roundTrip(
      docs: Seq[(String, String)],
      gzip: Boolean,
      lang: Option[Seq[String]] = None): Map[String, String] = {
    val path = tmp() + "/shards"
    val df = lang match {
      case Some(ls) =>
        docs.zip(ls).map { case ((u, c), l) => (u, c, l) }.toDF("uri", "content", "lang")
      case None => docs.toDF("uri", "content")
    }
    Wet.write(df, "uri", "content", path,
      langCol = if (lang.isDefined) Some("lang") else None, gzip = gzip)
    Wet.read(spark, path).collect()
      .map(r => r.getAs[String]("target_uri") -> r.getAs[String]("content")).toMap
  }

  test("round trip: payloads with blank lines, CRLF runs, and WARC literals survive byte-exact") {
    // These payloads are adversarial for any separator-splitting parser:
    // only Content-Length discipline reads them back correctly.
    val docs = Seq(
      "https://a/1" -> "plain text",
      "https://a/2" -> "first\r\n\r\nsecond paragraph\n\nthird",
      "https://a/3" -> "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nnot a real record",
      "https://a/4" -> "",
      "https://a/5" -> "trailing newlines\r\n\r\n")
    assert(roundTrip(docs, gzip = false) === docs.toMap)
    assert(roundTrip(docs, gzip = true) === docs.toMap)
  }

  test("round trip: Content-Length counts UTF-8 bytes, not chars") {
    val docs = Seq(
      "https://b/1" -> "café 中文 مرحبا",
      "https://b/2" -> "🙂 surrogate pair emoji", // non-BMP via surrogate pair
      "https://b/3" -> "ascii only")
    val back = roundTrip(docs, gzip = true)
    assert(back === docs.toMap)
    // n_bytes must be the UTF-8 length, larger than the char count for doc 1
    val row = Wet.read(spark, writeOnce(docs)).where($"target_uri" === "https://b/1")
      .select("n_bytes", "content").head()
    assert(row.getLong(0) === docs.head._2.getBytes(UTF_8).length.toLong)
    assert(row.getLong(0) > docs.head._2.length.toLong)
  }

  private def writeOnce(docs: Seq[(String, String)]): String = {
    val path = tmp() + "/shards"
    Wet.write(docs.toDF("uri", "content"), "uri", "content", path, gzip = true)
    path
  }

  test("warcinfo records are skipped; content_language header round-trips") {
    val docs = Seq("https://c/1" -> "hello", "https://c/2" -> "bonjour")
    val path = tmp() + "/shards"
    Wet.write(docs.toDF("uri", "content").withColumn("lang",
      org.apache.spark.sql.functions.when($"uri".endsWith("1"), "en").otherwise("fr")),
      "uri", "content", path, langCol = Some("lang"), gzip = false)
    val back = Wet.read(spark, path).collect()
    assert(back.length === 2, "warcinfo must not surface as a row")
    val langs = back.map(r => r.getAs[String]("target_uri") -> r.getAs[String]("content_language")).toMap
    assert(langs === Map("https://c/1" -> "en", "https://c/2" -> "fr"))
    assert(back.forall(_.getAs[String]("record_id").startsWith("<urn:uuid:")))
  }

  test("gzip shards are per-record multi-member and read back as one stream") {
    val docs = (1 to 50).map(i => s"https://d/$i" -> s"payload number $i with some body text")
    val path = tmp() + "/shards"
    Wet.write(docs.toDF("uri", "content").repartition(1), "uri", "content", path, gzip = true)
    val shard = new java.io.File(path).listFiles().filter(_.getName.endsWith(".gz")).head
    val bytes = Files.readAllBytes(shard.toPath)
    // count gzip member headers (magic 1f 8b 08): warcinfo + 50 records
    var members = 0
    for (i <- 0 until bytes.length - 2)
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b && bytes(i + 2) == 8)
        members += 1
    assert(members === 51, s"expected one gzip member per record, found $members")
    assert(Wet.read(spark, path).count() === 50L)
  }

  test("deterministic output: same frame, same partitioning => byte-identical shards") {
    val docs = (1 to 20).map(i => s"https://e/$i" -> s"doc $i")
    val p1 = tmp() + "/a"; val p2 = tmp() + "/b"
    val df = docs.toDF("uri", "content").repartition(2, $"uri").sortWithinPartitions("uri")
    Wet.write(df, "uri", "content", p1, gzip = false)
    Wet.write(df, "uri", "content", p2, gzip = false)
    def digest(dir: String): Seq[(String, String)] =
      new java.io.File(dir).listFiles().sortBy(_.getName).toSeq.map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
      }
    assert(digest(p1) === digest(p2))
  }

  test("write parallelism follows input partitioning by default; numShards is the explicit knob") {
    val docs = (1 to 40).map(i => (s"http://h/$i", s"doc $i"))
    def shardCount(path: String): Int =
      new java.io.File(path).listFiles.count(_.getName.endsWith(".warc.wet.gz"))
    val p1 = tmp() + "/byinput"
    Wet.write(docs.toDF("uri", "content").repartition(7), "uri", "content", p1, gzip = true)
    assert(shardCount(p1) === 7,
      "default: one shard per input partition — a 10k-partition corpus writes 10k shards in parallel")
    val p2 = tmp() + "/explicit"
    Wet.write(docs.toDF("uri", "content").repartition(7), "uri", "content", p2,
      gzip = true, numShards = Some(3))
    assert(shardCount(p2) === 3, "numShards overrides, for fixtures / shard-size targeting")
    assert(Wet.read(spark, p2).count() === 40L)
  }

  test("NULL uri or content fails loudly at write; malformed shard fails loudly at read") {
    val path = tmp() + "/shards"
    val nullContent = Seq(("https://f/1", "ok"), ("https://f/2", null: String)).toDF("uri", "content")
    val e1 = intercept[org.apache.spark.SparkException] {
      Wet.write(nullContent, "uri", "content", path, gzip = false)
    }
    assert(e1.getMessage.contains("NULL") || e1.getCause != null)

    val badDir = tmp() + "/bad"
    Files.createDirectories(java.nio.file.Paths.get(badDir))
    Files.write(java.nio.file.Paths.get(badDir, "junk.warc.wet"),
      "this is not a WARC file\r\n\r\n".getBytes(UTF_8))
    val e2 = intercept[org.apache.spark.SparkException] {
      Wet.read(spark, badDir).count()
    }
    assert(e2.getMessage.contains("WARC version line") ||
      String.valueOf(e2.getCause).contains("WARC version line"))
  }

  test("truncated payload (EOF before Content-Length bytes) fails loudly, never silently short-reads") {
    val dir = tmp() + "/trunc"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val rec = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://g/1\r\n" +
      "Content-Length: 1000\r\n\r\nonly a few bytes"
    Files.write(java.nio.file.Paths.get(dir, "t.warc.wet"), rec.getBytes(UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      Wet.read(spark, dir).count()
    }
    assert(e.getMessage.contains("EOF at payload byte") ||
      String.valueOf(e.getCause).contains("EOF at payload byte"))
  }

  test("reads real-shaped foreign WET bytes (LF-only writer variant, extra headers)") {
    // Hand-built shard from a hypothetical other writer: LF line ends,
    // unknown headers, single trailing blank line. The parser must not
    // depend on our own writer's CRLF conventions.
    val dir = tmp() + "/foreign"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val payload = "foreign body\nwith two lines"
    val shard =
      "WARC/1.1\n" +
        "WARC-Type: conversion\n" +
        "WARC-Target-URI: https://h/1\n" +
        "X-Custom-Header: whatever\n" +
        s"Content-Length: ${payload.getBytes(UTF_8).length}\n" +
        "\n" + payload + "\n\n"
    Files.write(java.nio.file.Paths.get(dir, "f.warc.wet"), shard.getBytes(UTF_8))
    val rows = Wet.read(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("content") === payload)
  }
}
