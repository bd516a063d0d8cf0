package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BloomSkip

class BloomSkipSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString

  /** 200 high-cardinality keys HASH-spread into 10 files: every file's
    * [min, max] spans nearly the whole domain — the layout where zone
    * maps cannot skip anything and membership filters are the only
    * file-level signal.
    */
  private def writeSpread(dir: String): Unit =
    (0 until 200).map(i => (i.toLong * 1000003L % 999983L, s"v$i")).toDF("k", "v")
      .repartition(10, col("k") * 7L) // not the probe key function
      .write.mode(SaveMode.Overwrite).parquet(dir)

  test("prunedRead equals the full-scan equality while reading fewer files; zone maps could not skip") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeSpread(data)
    BloomSkip.save(spark, data, mf, "k", bits = 1 << 12)
    val probe = 42L * 1000003L % 999983L // present key
    val pruned = BloomSkip.prunedRead(spark, data, mf, "k", probe)
    val full = spark.read.parquet(data).where(col("k") === probe)
    assert(pruned.collect().map(_.getAs[String]("v")).sorted.toSeq ===
      full.collect().map(_.getAs[String]("v")).sorted.toSeq)
    assert(pruned.inputFiles.length < spark.read.parquet(data).inputFiles.length,
      "the bloom manifest must actually skip files")
    // the contrast claim: min/max zone maps CANNOT skip for this layout
    val zm = graft.sources.ZoneMaps.build(spark, data, Seq("k")).collect()
    val zmSurvivors = zm.count(r =>
      r.getAs[Long]("max_k") >= probe && r.getAs[Long]("min_k") <= probe)
    assert(zmSurvivors === zm.length,
      "hash-spread layout: every file's [min,max] must straddle the probe — the bloom is the only signal")
  }

  test("no false drops over EVERY present key; absent keys usually skip everything") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeSpread(data)
    BloomSkip.save(spark, data, mf, "k", bits = 1 << 12)
    val allKeys = (0 until 200).map(i => i.toLong * 1000003L % 999983L)
    allKeys.foreach { k =>
      val got = BloomSkip.prunedRead(spark, data, mf, "k", k).count()
      val want = spark.read.parquet(data).where(col("k") === k).count()
      assert(got === want, s"false drop for present key $k")
    }
    // absent keys: the filter may false-positive a file or two, never all
    val absentSurvivors = (0 until 50)
      .map(i => BloomSkip.candidateFiles(spark, data, mf, "k", Seq(10000000L + i)).length)
    assert(absentSurvivors.sum < 50 * 10 / 2,
      s"absent keys should skip most files, got $absentSurvivors")
  }

  test("IN-list probe unions survivors; empty-match keeps schema; null probe refused") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeSpread(data)
    BloomSkip.save(spark, data, mf, "k", bits = 1 << 12)
    val ks = Seq(0L, 1000003L % 999983L, 77L * 1000003L % 999983L)
    val got = BloomSkip.prunedReadIn(spark, data, mf, "k", ks)
      .select("v").as[String].collect().toSet
    val want = spark.read.parquet(data).where(col("k").isin(ks: _*))
      .select("v").as[String].collect().toSet
    assert(got === want)
    val none = BloomSkip.prunedRead(spark, data, mf, "k", 123456789L)
    assert(none.columns.toSeq === Seq("k", "v"))
    assert(none.count() >= 0L) // evaluates without error even when no file survives
    intercept[IllegalArgumentException] {
      BloomSkip.prunedRead(spark, data, mf, "k", null)
    }
  }

  test("staleness: files landed after the manifest are always read; update() folds them in") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeSpread(data)
    BloomSkip.save(spark, data, mf, "k", bits = 1 << 12)
    Seq((424242L, "late")).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(data)
    val got = BloomSkip.prunedRead(spark, data, mf, "k", 424242L)
      .select("v").as[String].collect().toSet
    assert(got === Set("late"),
      "a stale manifest must degrade to reading more, never to missing rows")
    // update stats ONLY the fresh file and the listing-free probe then sees it
    BloomSkip.update(spark, data, mf)
    val files = BloomSkip.prunedFilesManifestOnly(spark, mf, "k", Seq(424242L))
    assert(files.nonEmpty)
    val reread = BloomSkip.prunedRead(spark, data, mf, "k", 424242L)
    assert(reread.select("v").as[String].collect().toSet === Set("late"))
    assert(reread.inputFiles.length < spark.read.parquet(data).inputFiles.length,
      "after update the late key must probe selectively again")
  }

  test("cross-type probe of a DOUBLE column: the col_type cast prevents the \"7\" vs \"7.0\" false drop") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    Seq((7.0, "a"), (9.5, "b"), (11.0, "c")).toDF("d", "v")
      .repartition(2).write.mode(SaveMode.Overwrite).parquet(data)
    BloomSkip.save(spark, data, mf, "d", bits = 1 << 12)
    // build hashed cast(7.0 AS STRING) = "7.0"; an uncast Int probe would
    // hash "7", miss every bit, and return empty DESPITE the row existing
    val got = BloomSkip.prunedRead(spark, data, mf, "d", 7)
      .select("v").as[String].collect().toSeq
    assert(got === Seq("a"), s"Int probe of a double column must not false-drop: $got")
  }

  test("NULL column values set no bits; an all-null file is skipped for every probe") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    Seq((Option(5L), "a"), (Option(9L), "b"), (Option(13L), "c")).toDF("k", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(data)
    Seq((None: Option[Long], "n1"), (None: Option[Long], "n2")).toDF("k", "v")
      .coalesce(1).write.mode(SaveMode.Append).parquet(data)
    BloomSkip.save(spark, data, mf, "k", bits = 1 << 12)
    val m = BloomSkip.build(spark, data, "k", bits = 1 << 12).collect()
    assert(m.length === 2)
    val nullFile = m.find(_.getAs[Long]("rows") == 2L).get
    assert(nullFile.getSeq[Long](nullFile.fieldIndex("words")).forall(_ == 0L),
      "all-null file must carry an all-zero filter")
    val cand = BloomSkip.candidateFiles(spark, data, mf, "k", Seq(5L))
    assert(cand.length === 1, "the all-null file is provably skippable for any equality probe")
    assert(BloomSkip.prunedRead(spark, data, mf, "k", 5L)
      .select("v").as[String].collect().toSeq === Seq("a"))
  }

  test("probe geometry comes from the manifest; column mismatch is loud") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeSpread(data)
    BloomSkip.save(spark, data, mf, "k", bits = 1 << 8, hashes = 3)
    // a probe never passes bits/hashes — the predicate reads them from
    // the manifest ROW it tests, so there is nothing to drift; asking
    // for the wrong column raises inside the one probe action
    val ex = intercept[Exception] {
      BloomSkip.candidateFiles(spark, data, mf, "v", Seq("x"))
    }
    assert(ex.getMessage.contains("indexes ('k'"))
    // and the stored geometry round-trips, col_type included
    val row = spark.read.parquet(mf).head()
    assert(row.getAs[Int]("bits") === (1 << 8) && row.getAs[Int]("hashes") === 3)
    assert(row.getAs[String]("col_type") === "bigint")
    assert(row.getSeq[Long](row.fieldIndex("words")).length === (1 << 8) / 64)
    // a probe literal of a DIFFERENT Scala type is cast to the column's
    // type before hashing — an Int probe of a bigint column must not
    // false-drop (build hashed "42…", an uncast Int would hash the same
    // here, but a Double column would hash "7.0" vs "7" — the cast is
    // what makes the no-false-drop contract real across types)
    val probe = (42L * 1000003L % 999983L).toInt
    val viaInt = BloomSkip.prunedRead(spark, data, mf, "k", probe).count()
    val direct = spark.read.parquet(data).where(col("k") === probe.toLong).count()
    assert(viaInt === direct && direct > 0L, "typed-cast probe must find the present key")
  }
}
