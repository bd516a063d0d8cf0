package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a persisted per-file (min, max, rows) manifest
  * over chosen columns, and a scan that consults it to skip whole files.
  *
  * Why this exists at 100 TB: parquet already carries row-group stats,
  * but the engine only sees them AFTER opening each footer — a scan over
  * 100k files pays 100k opens even when 99% of files cannot match.
  * A zone-map manifest is KB-sized, read once, and turns a range query
  * into a scan of just the intersecting files. It is the natural
  * companion of [[Sinks.writeZOrdered]]: z-order clusters ranges into
  * few files; the manifest is what lets the reader exploit that without
  * touching the rest.
  *
  * Safety contract (what makes skipping correct, not just fast):
  *  - a file whose stats say `max < lo` or `min > hi` cannot contain a
  *    match; all-null or empty files have null stats and are skipped —
  *    range predicates never match NULL;
  *  - STALENESS: files present in the directory but absent from the
  *    manifest (landed after [[save]]) are ALWAYS read — a stale
  *    manifest degrades to a slower scan, never to missing rows;
  *  - manifest entries for deleted files are ignored (the directory
  *    listing is the source of truth for existence, the manifest only
  *    for statistics);
  *  - CONCURRENCY: [[save]] and [[update]] promote the manifest through
  *    [[Sinks.writePartitionedAtomic]]'s staged-swap (never
  *    delete-then-write), and every manifest read absorbs the swap's
  *    sub-millisecond absent-path window with a bounded retry
  *    ([[Sinks.isTransientSwapMiss]]) — a reader concurrent with a
  *    manifest rewrite sees the old manifest or the new one, never a
  *    missing/partial one. This is what makes the staleness guarantee
  *    above real under maintenance, not just between maintenance runs.
  *
  * [[prunedRead]] re-applies the predicate after the file-level skip, so
  * its result is EXACTLY the full scan's filter — file granularity is an
  * optimization, never a semantic.
  */
object ZoneMaps {

  /** One manifest row per data file of `path`: `(file, rows,
    * min_<c>/max_<c> per requested column)` — ONE scan with map-side
    * partial aggregation; the exchange carries one row per file.
    */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build and persist the manifest next to (or wherever) the data.
    * Staged-swap promotion: a rebuild over a manifest being served never
    * exposes a missing or partial manifest to concurrent [[prunedRead]]s.
    */
  def save(spark: SparkSession, dataPath: String, manifestPath: String, cols: Seq[String]): Unit =
    Sinks.writePartitionedAtomic(build(spark, dataPath, cols).coalesce(1), manifestPath, Nil)

  /** Collect the manifest once (driver-sized by contract: one row per data
    * file, the same cardinality Spark's own FileIndex materializes),
    * absorbing a concurrent [[save]]/[[update]] swap with a bounded retry.
    * Returns the rows plus the schema so callers can re-plan Catalyst
    * predicates over a LOCAL relation — one atomic read instead of several
    * lazy scans that could each straddle a different swap.
    */
  private[sources] def manifestRows(
      spark: SparkSession,
      manifestPath: String,
      retries: Int = 8): (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    def attempt(left: Int): (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) =
      try {
        val df = spark.read.parquet(manifestPath)
        (df.collect(), df.schema)
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    attempt(retries)
  }

  /** Incremental manifest maintenance: stat ONLY the files the manifest
    * does not know yet and fold them in, dropping entries for files that
    * no longer exist. This is what keeps the zone map viable at scale —
    * a day's landing re-scans the day, not the corpus. No-op (and no
    * rewrite) when the directory is unchanged.
    */
  def update(spark: SparkSession, dataPath: String, manifestPath: String, cols: Seq[String]): Unit = {
    def key(uri: String): String = new org.apache.hadoop.fs.Path(uri).toUri.getPath
    val current = spark.read.parquet(dataPath).inputFiles.toSeq
    val currentKeys = current.map(key).toSet
    val (knownRows, manifestSchema) = manifestRows(spark, manifestPath)
    val known = knownRows.map(r => key(r.getAs[String]("file"))).toSet
    val fresh = current.filterNot(f => known.contains(key(f)))
    val dropped = known.diff(currentKeys)
    if (fresh.isEmpty && dropped.isEmpty) return
    // the manifest is already collected (it is driver-sized by contract);
    // the surviving entries become a local relation — no re-read of the
    // manifest being overwritten, no per-row UDF
    val keepDf = spark.createDataFrame(
      java.util.Arrays.asList(
        knownRows.filter(r => currentKeys.contains(key(r.getAs[String]("file")))): _*),
      manifestSchema)
    val freshDf =
      if (fresh.isEmpty) keepDf.where(lit(false))
      else {
        val aggs = count(lit(1)).as("rows") +:
          cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        spark.read
          .schema(spark.read.parquet(dataPath).schema)
          .parquet(fresh: _*)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*)
      }
    // Staged-swap promotion (never delete-then-rename: that has a window
    // where a concurrent prunedRead sees NO manifest and throws, violating
    // the degrade-never-break contract above). The union's inputs are a
    // local relation (keepDf — already collected) and the fresh data files,
    // so nothing in the plan reads the manifest being overwritten.
    Sinks.writePartitionedAtomic(keepDf.unionByName(freshDf).coalesce(1), manifestPath, Nil)
  }

  /** The file paths a range predicate `colName BETWEEN lo AND hi` cannot
    * skip, unioned with every file the manifest does not know about.
    * Driver-sized result by construction (one string per surviving file
    * — the same cardinality Spark's own FileIndex materializes).
    */
  private def candidateFiles(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)]): Seq[String] = {
    def key(uri: String): String = new org.apache.hadoop.fs.Path(uri).toUri.getPath
    import org.apache.spark.sql.Encoders
    val current = spark.read.parquet(dataPath).inputFiles.toSeq
    // ONE retry-guarded collect, then a local relation: two lazy scans of
    // the manifest could each straddle a DIFFERENT concurrent swap and
    // disagree about which files are known vs surviving.
    val (rows, schema) = manifestRows(spark, manifestPath)
    val manifest = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val known = rows.map(r => key(r.getAs[String]("file"))).toSet
    // interval intersection evaluated by Catalyst over the manifest rows,
    // so numeric/date/timestamp orderings are the engine's; null stats
    // (all-null or empty file) make the predicate null → skipped, which
    // is correct because a range predicate never matches NULL. Conjuncts
    // AND together: a file survives only if EVERY range can intersect —
    // the z-order case, where two narrow dimensions multiply the skip.
    val surviving = manifest
      .where(ranges.map { case (c, lo, hi) =>
        col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
      }.reduce(_ && _))
      .select(col("file")).as(Encoders.STRING)
      .collect().map(key).toSet
    current.filter { f =>
      val k = key(f)
      !known.contains(k) || surviving.contains(k)
    }
  }

  /** DISTRIBUTED prune: the same surviving-file decision as
    * [[prunedReadRanges]]'s internal path, but the manifest predicate is
    * evaluated as a DataFrame filter and the driver collects ONLY the
    * surviving paths plus manifest-unknown paths — never the manifest's
    * stat rows. At ~1M data files the stat manifest is hundreds of MB
    * (one row × ncols min/max each); the universe the driver must hold
    * here is the path LIST Spark's own FileIndex already materializes,
    * and after pruning typically a small fraction of it. Use this
    * entrypoint when the manifest itself is too wide to collect; the
    * default path keeps the local-relation form (one collect, simplest
    * swap-consistency story) for human-scale manifests.
    *
    * Same safety contract as [[prunedReadRanges]]: unknown files are
    * always read (staleness degrades, never breaks), null-stat files are
    * skipped (range predicates never match NULL), and the single
    * collect-action is retry-guarded against the manifest's staged swap
    * — one job plans the manifest scan once, so the known/surviving
    * decisions come from ONE manifest version.
    */
  def prunedFilesDistributed(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)],
      retries: Int = 8): Seq[String] = {
    require(ranges.nonEmpty, "prunedFilesDistributed needs at least one range predicate")
    import org.apache.spark.sql.Encoders
    // scheme-and-slash normalization as a pure Column (no driver loop, no
    // UDF): input_file_name() yields file:///p where inputFiles yields
    // file:/p — both normalize to /p; non-local schemes keep their
    // authority identically on both sides, so keys agree per file.
    def pathKey(c: Column): Column = regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")
    val current = spark.read.parquet(dataPath).inputFiles.toSeq
    val currentDf = spark.createDataset(current)(Encoders.STRING).toDF("path")
      .select(col("path"), pathKey(col("path")).as("__k"))
    // coalesce(pred, false): a known file with NULL stats must be
    // SKIPPED (pred null), while a file absent from the manifest (left
    // join miss → __survive null) must be READ — the two nulls mean
    // opposite things, so the manifest side resolves its own.
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    // The manifest scan is planned INSIDE each attempt: a staged swap
    // replaces the manifest's part files under new names, so a plan (and
    // its captured FileIndex) built before the swap would re-fail on the
    // same missing files forever — each retry must re-list the manifest
    // directory, exactly as the local manifestRows path does.
    def attempt(left: Int): Seq[String] =
      try {
        val m = spark.read.parquet(manifestPath)
          .select(pathKey(col("file")).as("__k"), coalesce(pred, lit(false)).as("__survive"))
        currentDf.join(m, Seq("__k"), "left")
          .where(col("__survive").isNull || col("__survive"))
          .select(col("path")).as(Encoders.STRING)
          .collect().toSeq
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    attempt(retries)
  }

  /** LISTING-FREE distributed prune: the manifest IS the file catalog —
    * no `inputFiles` materialization of the data directory at all, so the
    * driver holds ONLY the surviving path list end-to-end. At ~1M files
    * this removes both the stat universe (already absent from
    * [[prunedFilesDistributed]]) and the full path universe from driver
    * memory; the listing RPC storm against the object store disappears
    * with it.
    *
    * CONTRACT (stricter than [[prunedFilesDistributed]], by design): the
    * manifest must be CURRENT — run [[update]] after every landing, the
    * same discipline a table format's commit log imposes. Files the
    * manifest does not know CANNOT be discovered here (there is no
    * listing to discover them from), so freshness moves from a runtime
    * degradation to a maintenance invariant. Null-stat files are still
    * skipped (range predicates never match NULL), and the single
    * collect-action re-plans the manifest scan inside each retry so a
    * concurrent staged swap is absorbed, never fatal.
    */
  def prunedFilesManifestOnly(
      spark: SparkSession,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)],
      retries: Int = 8): Seq[String] = {
    require(ranges.nonEmpty, "prunedFilesManifestOnly needs at least one range predicate")
    import org.apache.spark.sql.Encoders
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    def attempt(left: Int): Seq[String] =
      try spark.read.parquet(manifestPath)
        .where(coalesce(pred, lit(false)))
        .select(col("file")).as(Encoders.STRING)
        .collect().toSeq
      catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    attempt(retries)
  }

  /** Read `dataPath` restricted to files that can contain `colName ∈
    * [lo, hi]`, with the predicate re-applied — result ≡ the full scan's
    * `WHERE colName BETWEEN lo AND hi`, minus the footer-opens for files
    * the manifest rules out.
    */
  def prunedRead(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      colName: String,
      lo: Any,
      hi: Any): DataFrame =
    prunedReadRanges(spark, dataPath, manifestPath, Seq((colName, lo, hi)))

  /** Conjunctive multi-column variant: result ≡ the full scan's
    * `WHERE AND_i (cᵢ BETWEEN loᵢ AND hiᵢ)`. With z-ordered data, the
    * per-dimension skips multiply — this is the reader that completes
    * [[Sinks.writeZOrdered]].
    */
  def prunedReadRanges(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one range predicate")
    val files = candidateFiles(spark, dataPath, manifestPath, ranges)
    val base =
      if (files.isEmpty)
        // schema-preserving empty result (no file matched anywhere)
        spark.read.parquet(dataPath).where(lit(false))
      else
        spark.read
          .schema(spark.read.parquet(dataPath).schema) // stable schema even for a file subset
          // basePath: a file-subset read of a PARTITIONED table must still
          // resolve dir-encoded partition columns, or they'd surface null
          .option("basePath", dataPath)
          .parquet(files: _*)
    base.where(ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _))
  }
}
