package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level BLOOM-FILTER skipping: a persisted per-file bit-set manifest
  * over one column, and a scan that consults it to skip whole files for
  * EQUALITY (point / IN-list) predicates.
  *
  * Why this exists alongside [[ZoneMaps]] at 100 TB: min/max zone maps
  * prune RANGES, which is useless for a high-cardinality column whose
  * values are uniformly spread across files (URL hosts, user ids, content
  * hashes — every file's [min, max] spans the whole domain). A Bloom
  * filter prunes MEMBERSHIP: a file whose filter lacks any of the probe
  * value's k bit positions provably does not contain the value, whatever
  * its min/max. Parquet has per-row-group bloom filters for the same
  * reason — but, exactly like footer stats, the engine only sees them
  * AFTER opening each footer; this manifest is read once and turns a
  * point lookup over 100k files into a scan of the handful whose filters
  * fire (expected false-positive share ≈ fill^k on top).
  *
  * Representation: one row per data file — `(file, rows, col_name, bits,
  * hashes, words)` with `words` a DENSE little-endian array of
  * `bits / 64` longs. Bit positions come from double hashing
  * (`h1 + i·h2 mod bits`, i < hashes — Kirsch–Mitzenmacher) over
  * `xxhash64(cast(value AS STRING))`, so build and probe use the ENGINE's
  * hash; nothing driver-side re-implements it (probe positions are
  * evaluated by a one-row Catalyst job with the identical expression).
  * The string cast canonicalizes the hashed form; probe with a literal of
  * the COLUMN's type (the re-applied equality keeps semantics exact
  * regardless — a hash-form mismatch could only cost a false DROP, so the
  * cast contract is enforced by construction, both sides sharing one
  * expression).
  *
  * Safety contract (the [[ZoneMaps]] one, adapted to membership):
  *  - a probed file is skipped ONLY if some probe bit is absent — a
  *    present value always set all its bits in [[build]], so skipping
  *    never loses rows; false POSITIVES cost a footer open, never
  *    correctness;
  *  - NULL column values set no bits (equality never matches NULL); an
  *    all-null or empty file has an all-zero filter and is skipped for
  *    every probe — correct for the same reason. Probing FOR null is
  *    refused loudly;
  *  - STALENESS: files present in the directory but absent from the
  *    manifest are ALWAYS read — a stale manifest degrades to a slower
  *    scan, never to missing rows ([[update]] is the incremental
  *    maintenance that keeps it fresh without re-scanning the corpus);
  *  - CONCURRENCY: the manifest promotes through
  *    [[Sinks.writePartitionedAtomic]]'s staged swap and every manifest
  *    read absorbs the swap window with the bounded
  *    [[Sinks.isTransientSwapMiss]] retry.
  *
  * [[prunedRead]] / [[prunedReadIn]] re-apply the equality after the
  * file-level skip, so the result is EXACTLY the full scan's filter —
  * file granularity is an optimization, never a semantic.
  *
  * Sizing: `bits` defaults to 2^17 (16 KB/file dense; parquet RLE
  * crushes the zero words of sparse files). For a 128 MB data file of
  * ~1M distinct keys that is ~13% fill at k = 5 → false-positive rate
  * ≈ 4·10⁻⁵; the whole 100k-file manifest is ≤ 1.6 GB cold and one
  * column-pruned scan hot. The manifest carries `bits`/`hashes` per row
  * and probes READ them from the manifest — a probe can never use a
  * geometry different from the one the bits were built with.
  */
object BloomSkip {

  /** Probe-side bit positions and build-side words share this ONE
    * expression family — the no-false-drop proof is "same expression".
    * `bits`/`hashes` are COLUMNS so a probe can bind them to the
    * manifest row being tested (geometry travels with the bits it
    * shaped); [[build]] binds them to literals.
    */
  private def positionsExpr(value: Column, bits: Column, hashes: Column): Column = {
    val s = value.cast("string")
    // pmod into the bit domain BEFORE combining: h1 + i·h2 on raw 64-bit
    // hashes overflows a long, which ANSI mode turns into a runtime error;
    // (h1 mod m) + i·(h2 mod m) is ≤ (hashes+1)·m and mathematically the
    // same double-hash family modulo m
    val h1 = pmod(xxhash64(s), bits)
    val h2 = pmod(xxhash64(s, lit("graft.bloom")), bits)
    // xxhash64(NULL) returns the SEED, not NULL — without the guard every
    // null value would set one fixed bit pattern, and an all-null file
    // would stop being provably skippable
    when(value.isNotNull,
      transform(sequence(lit(0), hashes - 1),
        i => pmod(h1 + i.cast("long") * h2, bits)))
  }

  /** Membership of `value` in a manifest ROW's filter, geometry read
    * from THAT row — one Catalyst predicate, so a whole probe is ONE
    * action with no window where geometry and bits could come from
    * different manifest versions. A row indexing a different column
    * raises instead of silently testing the wrong bits.
    */
  private def containsValue(colName: String, value: Any): Column = {
    require(value != null, "equality never matches NULL — probe for null is meaningless")
    val ok = forall(
      positionsExpr(lit(value), col("bits").cast("long"), col("hashes")),
      p => element_at(col("words"), (p / 64L).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= 0L)
    when(col("col_name") === lit(colName), ok)
      .otherwise(raise_error(concat(
        lit("bloom manifest indexes column '"), col("col_name"),
        lit(s"', probe asked for '$colName'"))).cast("boolean"))
  }

  /** One manifest row per data file of `path`. ONE scan; the first
    * exchange carries ≤ (hashes+1) rows per input row pre-combine and
    * collapses to ≤ `bits/64` word rows per file map-side (bit_or is
    * associative — partial aggregation does the heavy lifting); the
    * second assembles the per-file dense array (≤ bits/64 structs per
    * file through `collect_list`, bounded by construction).
    */
  def build(
      spark: SparkSession,
      path: String,
      colName: String,
      bits: Int = 1 << 17,
      hashes: Int = 5): DataFrame = {
    require(bits >= 64 && bits % 64 == 0, "bits must be a positive multiple of 64")
    require(hashes >= 1, "need at least one hash")
    buildFrom(spark.read.parquet(path), colName, bits, hashes)
  }

  /** Build and persist the manifest (staged-swap promotion — the
    * [[ZoneMaps.save]] contract).
    */
  def save(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      colName: String,
      bits: Int = 1 << 17,
      hashes: Int = 5): Unit =
    Sinks.writePartitionedAtomic(
      build(spark, dataPath, colName, bits, hashes).coalesce(1), manifestPath, Nil)

  /** Data-file paths that may contain ANY of `values` in the indexed
    * column, unioned with every file the manifest does not know about
    * (staleness degrades, never breaks). Driver-sized result by
    * construction (one string per surviving file).
    */
  def candidateFiles(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      colName: String,
      values: Seq[Any]): Seq[String] = {
    require(values.nonEmpty, "need at least one probe value")
    def key(uri: String): String = new org.apache.hadoop.fs.Path(uri).toUri.getPath
    import org.apache.spark.sql.Encoders
    val current = spark.read.parquet(dataPath).inputFiles.toSeq
    // The membership predicate is evaluated DISTRIBUTED (geometry read
    // from each row — [[containsValue]]) and the driver collects only
    // (path, survives) pairs — never the manifest's word arrays
    // (bits/8 bytes per file: at 100k files × 16 KB that is GBs the
    // driver must not hold; the pair list is the FileIndex cardinality
    // Spark already materializes). ONE collect-action per attempt,
    // re-planned inside the retry so a concurrent staged swap is
    // absorbed ([[ZoneMaps.prunedFilesDistributed]]'s argument), and
    // known/surviving decisions come from ONE manifest version.
    val pred = values.map(v => containsValue(colName, v)).reduce(_ || _)
    def attempt(left: Int): (Set[String], Set[String]) =
      try {
        val pairs = spark.read.parquet(manifestPath)
          .select(col("file"), coalesce(pred, lit(false)).as("survives"))
          .as(Encoders.tuple(Encoders.STRING, Encoders.scalaBoolean))
          .collect()
        (pairs.map(p => key(p._1)).toSet,
          pairs.filter(_._2).map(p => key(p._1)).toSet)
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    val (known, surviving) = attempt(8)
    current.filter { f =>
      val k = key(f)
      !known.contains(k) || surviving.contains(k)
    }
  }

  /** LISTING-FREE prune: the manifest IS the file catalog (the
    * [[ZoneMaps.prunedFilesManifestOnly]] contract — the manifest must be
    * CURRENT via [[update]]; unknown files cannot be discovered here).
    * The driver holds only probe positions and the surviving path list.
    */
  def prunedFilesManifestOnly(
      spark: SparkSession,
      manifestPath: String,
      colName: String,
      values: Seq[Any],
      retries: Int = 8): Seq[String] = {
    require(values.nonEmpty, "need at least one probe value")
    import org.apache.spark.sql.Encoders
    val pred = values.map(v => containsValue(colName, v)).reduce(_ || _)
    def attempt(left: Int): Seq[String] =
      try {
        spark.read.parquet(manifestPath)
          .where(pred)
          .select(col("file")).as(Encoders.STRING)
          .collect().toSeq
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    attempt(retries)
  }

  /** Incremental manifest maintenance — stat ONLY files the manifest does
    * not know, drop entries for deleted files, no-op when unchanged (the
    * [[ZoneMaps.update]] discipline). Geometry comes from the existing
    * manifest, never from arguments. DRIVER-THIN, unlike
    * [[ZoneMaps.update]]'s local-relation form: bloom manifest rows are
    * FAT (bits/8 bytes of words each), so the surviving entries are
    * re-read distributed (a left-semi against the kept path keys) and
    * only path strings plus one geometry row ever reach the driver —
    * [[Sinks.writePartitionedAtomic]]'s staged swap explicitly supports
    * a plan that reads the manifest it is overwriting. Single-writer
    * maintenance assumption (shared with ZoneMaps): readers are
    * swap-safe concurrently; two concurrent maintainers are not.
    */
  def update(spark: SparkSession, dataPath: String, manifestPath: String): Unit = {
    def key(uri: String): String = new org.apache.hadoop.fs.Path(uri).toUri.getPath
    import org.apache.spark.sql.Encoders
    val current = spark.read.parquet(dataPath).inputFiles.toSeq
    val currentKeys = current.map(key).toSet
    def attemptPaths(left: Int): Seq[String] =
      try spark.read.parquet(manifestPath).select(col("file")).as(Encoders.STRING).collect().toSeq
      catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L); attemptPaths(left - 1)
      }
    val knownPaths = attemptPaths(8)
    require(knownPaths.nonEmpty, "bloom manifest is empty — run save() first")
    val head = spark.read.parquet(manifestPath).limit(1).collect().head
    val colName = head.getAs[String]("col_name")
    val (bits, hashes) = (head.getAs[Int]("bits"), head.getAs[Int]("hashes"))
    val known = knownPaths.map(key).toSet
    val fresh = current.filterNot(f => known.contains(key(f)))
    val dropped = known.diff(currentKeys)
    if (fresh.isEmpty && dropped.isEmpty) return
    // path-normalization as a Column (the ZoneMaps.prunedFilesDistributed
    // pathKey move) so the keep-side semi join needs no driver-side rows
    def pathKey(c: Column): Column = regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")
    val keepKeys = spark.createDataset(currentKeys.toSeq)(Encoders.STRING).toDF("__k")
    val keepDf = spark.read.parquet(manifestPath)
      .withColumn("__k", pathKey(col("file")))
      .join(keepKeys, Seq("__k"), "left_semi")
      .drop("__k")
    val freshDf =
      if (fresh.isEmpty) keepDf.where(lit(false))
      else
        buildFrom(
          spark.read
            .schema(spark.read.parquet(dataPath).schema)
            .parquet(fresh: _*),
          colName, bits, hashes)
    Sinks.writePartitionedAtomic(keepDf.unionByName(freshDf).coalesce(1), manifestPath, Nil)
  }

  /** [[build]] body over an already-planned frame (the [[update]] path
    * stats only fresh files through here). Every row emits its k
    * positions plus ONE null marker — the marker count is the exact row
    * count, in the same single pass (a NULL value emits only the marker:
    * equality never matches NULL, so it sets no bits).
    */
  private def buildFrom(df: DataFrame, colName: String, bits: Int, hashes: Int): DataFrame = {
    val nwords = bits / 64
    val exploded = df
      .select(
        input_file_name().as("file"),
        explode(concat(
          coalesce(positionsExpr(col(colName), lit(bits.toLong), lit(hashes)), array()),
          array(lit(null).cast("long")))).as("pos"))
    exploded
      .groupBy(col("file"), (col("pos") / 64L).cast("int").as("w"))
      .agg(
        bit_or(call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int")))
          .as("word"),
        count(when(col("pos").isNull, 1)).as("__marks"))
      .groupBy(col("file"))
      .agg(
        sum(col("__marks")).as("rows"),
        map_from_entries(
          filter(collect_list(when(col("w").isNotNull, struct(col("w"), col("word")))),
            s => s.isNotNull)).as("__m"))
      .select(
        col("file"),
        col("rows"),
        lit(colName).as("col_name"),
        lit(bits).as("bits"),
        lit(hashes).as("hashes"),
        transform(sequence(lit(0), lit(nwords - 1)),
          i => coalesce(element_at(col("__m"), i.cast("int")), lit(0L))).as("words"))
  }

  /** Read `dataPath` restricted to files whose bloom filter may contain
    * `value`, equality re-applied — result ≡ the full scan's
    * `WHERE colName = value`, minus the footer opens for files the
    * filters rule out.
    */
  def prunedRead(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      colName: String,
      value: Any): DataFrame =
    prunedReadIn(spark, dataPath, manifestPath, colName, Seq(value))

  /** IN-list variant: result ≡ the full scan's `WHERE colName IN
    * (values…)`. Candidates are the union of the per-value survivors —
    * one manifest pass, |values| probe-position evaluations.
    */
  def prunedReadIn(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      colName: String,
      values: Seq[Any]): DataFrame = {
    val files = candidateFiles(spark, dataPath, manifestPath, colName, values)
    val base =
      if (files.isEmpty)
        spark.read.parquet(dataPath).where(lit(false))
      else
        spark.read
          .schema(spark.read.parquet(dataPath).schema)
          .option("basePath", dataPath)
          .parquet(files: _*)
    base.where(col(colName).isin(values: _*))
  }
}
