package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZoneMaps

class ZoneMapsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_zonemap").toString

  /** 100 rows of k ∈ [0, 100), range-clustered into 10 files so each file
    * covers a narrow k band — the written shape z-order produces.
    */
  private def writeClustered(dir: String): Unit =
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(10, col("k"))
      .write.mode(SaveMode.Overwrite).parquet(dir)

  test("prunedRead equals the full-scan filter while reading fewer files") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val pruned = ZoneMaps.prunedRead(spark, data, mf, "k", 42L, 47L)
    val full = spark.read.parquet(data).where(col("k") >= 42L && col("k") <= 47L)
    assert(pruned.collect().map(_.getAs[Long]("k")).sorted.toSeq ===
      full.collect().map(_.getAs[Long]("k")).sorted.toSeq)
    assert(pruned.inputFiles.length < spark.read.parquet(data).inputFiles.length,
      "the manifest must actually skip files")
    assert(pruned.inputFiles.nonEmpty)
  }

  test("a range matching nothing reads no files but keeps the schema") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val out = ZoneMaps.prunedRead(spark, data, mf, "k", 1000L, 2000L)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("k", "v"))
  }

  test("staleness: files landed after the manifest are still read") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    // land a late file whose range the manifest has never seen
    Seq((45L, "late")).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(data)
    val got = ZoneMaps.prunedRead(spark, data, mf, "k", 45L, 45L)
      .select("v").as[String].collect().toSet
    assert(got === Set("v45", "late"),
      "a stale manifest must degrade to reading more, never to missing rows")
  }

  test("all-null stats files are skipped — range predicates never match NULL") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    Seq(Some(1L), Some(2L)).toDF("k").write.mode(SaveMode.Overwrite).parquet(data)
    Seq(Option.empty[Long]).toDF("k").write.mode(SaveMode.Append).parquet(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val out = ZoneMaps.prunedRead(spark, data, mf, "k", 0L, 10L)
    assert(out.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("prunedFilesDistributed matches the local prune across stale/null-stat cases") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    // a known file with all-null stats (must be SKIPPED: pred null)
    Seq(Option.empty[Long]).toDF("k").withColumn("v", lit("nullfile"))
      .write.mode(SaveMode.Append).parquet(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    // a manifest-unknown late file (must be READ: staleness degrades)
    Seq((45L, "late")).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(data)
    def key(uri: String) = new org.apache.hadoop.fs.Path(uri).toUri.getPath
    val ranges = Seq(("k", 42L: Any, 47L: Any))
    val dist = ZoneMaps.prunedFilesDistributed(spark, data, mf, ranges)
      .map(key).toSet
    val local = ZoneMaps.prunedReadRanges(spark, data, mf, ranges)
      .inputFiles.map(key).toSet
    assert(dist === local,
      "the distributed prune must make the identical surviving-file decision")
    // and strictly fewer than the universe (it actually pruned)
    val all = spark.read.parquet(data).inputFiles.map(key).toSet
    assert(dist.subsetOf(all) && dist.size < all.size)
    // reading the surviving list reproduces the exact filtered result
    val viaDist = spark.read
      .schema(spark.read.parquet(data).schema)
      .option("basePath", data)
      .parquet(ZoneMaps.prunedFilesDistributed(spark, data, mf, ranges): _*)
      .where(col("k") >= 42L && col("k") <= 47L)
      .select("v").as[String].collect().toSet
    assert(viaDist === Set("v42", "v43", "v44", "v45", "v46", "v47", "late"))
  }

  test("prunedFilesManifestOnly: manifest-as-catalog, driver holds only survivors") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    // a known file with all-null stats (must be SKIPPED: pred null)
    Seq(Option.empty[Long]).toDF("k").withColumn("v", lit("nullfile"))
      .write.mode(SaveMode.Append).parquet(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    def key(uri: String) = new org.apache.hadoop.fs.Path(uri).toUri.getPath
    val ranges = Seq(("k", 42L: Any, 47L: Any))
    val only = ZoneMaps.prunedFilesManifestOnly(spark, mf, ranges).map(key).toSet
    // with a CURRENT manifest the decision is identical to the listing path
    val dist = ZoneMaps.prunedFilesDistributed(spark, data, mf, ranges).map(key).toSet
    assert(only === dist,
      "with a current manifest, the listing-free prune must equal the listing one")
    // and reading the survivors reproduces the exact filtered result
    val viaOnly = spark.read
      .schema(spark.read.parquet(data).schema)
      .option("basePath", data)
      .parquet(ZoneMaps.prunedFilesManifestOnly(spark, mf, ranges): _*)
      .where(col("k") >= 42L && col("k") <= 47L)
      .select("v").as[String].collect().toSet
    assert(viaOnly === Set("v42", "v43", "v44", "v45", "v46", "v47"))
    // contract boundary, asserted not just documented: a file landed AFTER
    // the manifest is invisible here (no listing to discover it from) and
    // becomes visible exactly when `update` runs — freshness is a
    // maintenance invariant, not a runtime degradation.
    Seq((45L, "late")).toDF("k", "v").write.mode(SaveMode.Append).parquet(data)
    assert(ZoneMaps.prunedFilesManifestOnly(spark, mf, ranges).map(key).toSet === only)
    ZoneMaps.update(spark, data, mf, Seq("k"))
    val afterUpdate = spark.read
      .schema(spark.read.parquet(data).schema)
      .option("basePath", data)
      .parquet(ZoneMaps.prunedFilesManifestOnly(spark, mf, ranges): _*)
      .where(col("k") >= 42L && col("k") <= 47L)
      .select("v").as[String].collect().toSet
    assert(afterUpdate === Set("v42", "v43", "v44", "v45", "v46", "v47", "late"))
  }

  test("prunedFilesDistributed retries re-plan the manifest scan across a staged swap") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val ranges = Seq(("k", 42L: Any, 47L: Any))
    val before = ZoneMaps.prunedFilesDistributed(spark, data, mf, ranges).toSet
    // rewrite the manifest THROUGH the staged swap: part files get new
    // names, so any plan captured before this point holds a dead FileIndex
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val after = ZoneMaps.prunedFilesDistributed(spark, data, mf, ranges).toSet
    assert(after === before,
      "a post-swap prune must re-list the manifest and succeed, not replay a stale plan")
  }

  test("update stats only unknown files and drops entries for deleted ones") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val before = spark.read.parquet(mf).count()
    // pick the victim BEFORE appending: the append writes its own
    // part-00000-<uuid> and the victim must be an original file
    val victim = spark.read.parquet(data).inputFiles.min
    Seq((500L, "new")).toDF("k", "v").write.mode(SaveMode.Append).parquet(data)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(victim)), false)

    ZoneMaps.update(spark, data, mf, Seq("k"))
    val m = spark.read.parquet(mf)
    assert(m.count() === before, "one added, one dropped")
    assert(m.where(col("max_k") === 500L).count() === 1L, "new file statted")
    // pruning through the updated manifest finds the new file's rows
    val got = ZoneMaps.prunedRead(spark, data, mf, "k", 500L, 500L)
      .select("v").as[String].collect().toSeq
    assert(got === Seq("new"))
    // idempotence: an unchanged directory rewrites nothing
    val modAt = fs.getFileStatus(new org.apache.hadoop.fs.Path(mf)).getModificationTime
    ZoneMaps.update(spark, data, mf, Seq("k"))
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(mf)).getModificationTime === modAt)
  }

  test("partitioned tables keep their dir-encoded columns through a pruned read") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    (0 until 100).map(i => (i.toLong, i % 4, s"v$i")).toDF("k", "p", "v")
      .repartitionByRange(5, col("k"))
      .write.partitionBy("p").mode(SaveMode.Overwrite).parquet(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val got = ZoneMaps.prunedRead(spark, data, mf, "k", 10L, 12L)
      .select("k", "p").as[(Long, Int)].collect().toSet
    assert(got === Set((10L, 2), (11L, 3), (12L, 0)),
      "partition column values must survive the file-subset read")
  }

  test("prunedReadRanges over z-ordered data: conjunctive skips, exact result") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    val rnd = new scala.util.Random(5)
    val df = (1 to 2000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    graft.sources.Sinks.writeZOrdered(df, data, Seq("x", "y"), numFiles = 16)
    ZoneMaps.save(spark, data, mf, Seq("x", "y"))
    val ranges = Seq(("x", 100L: Any, 199L: Any), ("y", 100L: Any, 199L: Any))
    val pruned = ZoneMaps.prunedReadRanges(spark, data, mf, ranges)
    val full = spark.read.parquet(data)
      .where(col("x").between(100L, 199L) && col("y").between(100L, 199L))
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      full.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    assert(pruned.inputFiles.length < 16,
      s"z-order + zone map must skip files: read ${pruned.inputFiles.length} of 16")
  }

  test("readers concurrent with manifest rewrites never throw (atomic swap + retry)") {
    val data = tmp() + "/data"; val mf = tmp() + "/manifest"
    writeClustered(data)
    ZoneMaps.save(spark, data, mf, Seq("k"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val ks = ZoneMaps.prunedRead(spark, data, mf, "k", 42L, 47L)
            .select("k").as[Long].collect().sorted.toSeq
          assert(ks === (42L to 47L).toSeq,
            "a read overlapping a swap must see the old or new manifest, never partial data")
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    try {
      // full rebuild swaps…
      (1 to 8).foreach(_ => ZoneMaps.save(spark, data, mf, Seq("k")))
      // …and incremental-update swaps (an append forces a real rewrite;
      // appended keys sit outside the probed range so reads stay stable)
      (1 to 3).foreach { i =>
        Seq((1000L + i, s"late$i")).toDF("k", "v")
          .write.mode(SaveMode.Append).parquet(data)
        ZoneMaps.update(spark, data, mf, Seq("k"))
      }
    } finally {
      stop.set(true)
      reader.join(120000L)
    }
    assert(failure.get() === null, s"concurrent reader threw: ${failure.get()}")
    assert(reads.get() > 0, "the reader must have actually raced the swaps")
  }

  test("manifest is one scan with one file-keyed exchange") {
    val data = tmp() + "/data"
    writeClustered(data)
    val plan = ZoneMaps.build(spark, data, Seq("k")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"manifest build must be a single aggregation pass:\n$plan")
  }
}
