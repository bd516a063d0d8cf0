package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

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
  * Representation: one row per data file — `(file, rows, col_name,
  * col_type, bits, hashes, words)` with `words` a DENSE little-endian
  * array of `bits / 64` longs. Bit positions come from double hashing
  * (`h1 + i·h2 mod bits`, i < hashes — Kirsch–Mitzenmacher) over
  * `xxhash64(cast(value AS STRING))`, so build and probe use the ENGINE's
  * hash; nothing driver-side re-implements it. The string cast
  * canonicalizes the hashed form, and the probe literal is CAST TO THE
  * INDEXED COLUMN'S TYPE first (`col_type`, stored at build time) — an
  * Int probe against a DOUBLE column would otherwise hash "7" where build
  * hashed "7.0" and silently false-drop every file; with the cast the
  * contract really is enforced by construction.
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
  *    [[Sinks.isTransientSwapMiss]] retry. Maintenance is single-writer
  *    (the ZoneMaps assumption); readers are swap-safe concurrently.
  *
  * Path identity: ONE normalizer — strip the scheme, KEEP any authority —
  * applied identically driver-side and as a Column (the
  * [[ZoneMaps.prunedFilesDistributed]] pathKey), so `inputFiles` URIs
  * (`file:/p`, `hdfs://nn:8020/p`) and `input_file_name()` URIs
  * (`file:///p`) agree per file on every filesystem, not just local.
  *
  * [[prunedRead]] / [[prunedReadIn]] re-apply the equality after the
  * file-level skip, so the result is EXACTLY the full scan's filter —
  * file granularity is an optimization, never a semantic.
  *
  * Sizing: `bits` defaults to 2^17 (16 KB/file dense; parquet RLE
  * crushes the zero words of sparse files). For a 128 MB data file of
  * ~1M distinct keys that is ~13% fill at k = 5 → false-positive rate
  * ≈ 4·10⁻⁵. The manifest's word arrays NEVER reach the driver: probes
  * are one distributed action collecting (path, survives) pairs, and the
  * per-row geometry/type columns make drift between manifest versions
  * impossible mid-probe.
  */
object BloomSkip {

  /** The one path normalizer (see the scaladoc's "Path identity"). */
  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:/+"
  private def pathKey(c: Column): Column = regexp_replace(c, schemeRe, "/")
  private def pathKey(uri: String): String = uri.replaceFirst(schemeRe, "/")

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
    * different manifest versions. The probe literal is cast to the
    * indexed column's type BEFORE hashing (build hashed the column's own
    * canonical string form); a row indexing a different column or type
    * raises instead of silently testing the wrong bits.
    */
  private def containsValue(colName: String, value: Any, castTo: DataType): Column = {
    require(value != null, "equality never matches NULL — probe for null is meaningless")
    val typed = lit(value).cast(castTo)
    val ok = forall(
      positionsExpr(typed, col("bits").cast("long"), col("hashes")),
      p => element_at(col("words"), (p / 64L).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= 0L)
    when(col("col_name") =!= lit(colName) || col("col_type") =!= lit(castTo.catalogString),
      raise_error(concat(
        lit("bloom manifest indexes ('"), col("col_name"), lit("': "), col("col_type"),
        lit(s"), probe asked for ('$colName': ${castTo.catalogString})")))
        .cast("boolean"))
      .otherwise(ok)
  }

  /** The indexed column's type, read from the manifest (retry-guarded;
    * stable across [[update]]s by construction — only a full re-[[save]]
    * can change it, which is a single-writer maintenance event, and the
    * in-predicate col_type check still raises on any drift).
    */
  private def manifestColType(
      spark: SparkSession, manifestPath: String, retries: Int = 8): DataType = {
    def attempt(left: Int): DataType =
      try {
        val rows = spark.read.parquet(manifestPath)
          .select(col("col_type")).limit(1).collect()
        require(rows.nonEmpty, "bloom manifest is empty — build it before probing")
        DataType.fromDDL(rows.head.getString(0))
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    attempt(retries)
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
      values: Seq[Any]): Seq[String] =
    candidateFilesFrom(
      spark, spark.read.parquet(dataPath).inputFiles.toSeq, manifestPath, colName, values)

  /** [[candidateFiles]] over an already-materialized file list — the
    * [[prunedReadIn]] path lists the data directory ONCE and routes both
    * the candidate decision and the scan schema through that single
    * listing (at 100k object-store files a second listing per point
    * lookup is the exact cost the manifest exists to avoid).
    */
  private def candidateFilesFrom(
      spark: SparkSession,
      current: Seq[String],
      manifestPath: String,
      colName: String,
      values: Seq[Any]): Seq[String] = {
    require(values.nonEmpty, "need at least one probe value")
    import org.apache.spark.sql.Encoders
    // The membership predicate is evaluated DISTRIBUTED (geometry read
    // from each row — [[containsValue]]) and the driver collects only
    // (path, survives) pairs — never the manifest's word arrays
    // (bits/8 bytes per file: at 100k files × 16 KB that is GBs the
    // driver must not hold; the pair list is the FileIndex cardinality
    // Spark already materializes). ONE collect-action per attempt,
    // re-planned inside the retry so a concurrent staged swap is
    // absorbed ([[ZoneMaps.prunedFilesDistributed]]'s argument), and
    // known/surviving decisions come from ONE manifest version.
    val castTo = manifestColType(spark, manifestPath)
    val pred = values.map(v => containsValue(colName, v, castTo)).reduce(_ || _)
    def attempt(left: Int): (Set[String], Set[String]) =
      try {
        val pairs = spark.read.parquet(manifestPath)
          .select(col("file"), coalesce(pred, lit(false)).as("survives"))
          .as(Encoders.tuple(Encoders.STRING, Encoders.scalaBoolean))
          .collect()
        (pairs.map(p => pathKey(p._1)).toSet,
          pairs.filter(_._2).map(p => pathKey(p._1)).toSet)
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L)
          attempt(left - 1)
      }
    val (known, surviving) = attempt(8)
    current.filter { f =>
      val k = pathKey(f)
      !known.contains(k) || surviving.contains(k)
    }
  }

  /** LISTING-FREE prune: the manifest IS the file catalog (the
    * [[ZoneMaps.prunedFilesManifestOnly]] contract — the manifest must be
    * CURRENT via [[update]]; unknown files cannot be discovered here).
    * The driver holds only the surviving path list.
    */
  def prunedFilesManifestOnly(
      spark: SparkSession,
      manifestPath: String,
      colName: String,
      values: Seq[Any],
      retries: Int = 8): Seq[String] = {
    require(values.nonEmpty, "need at least one probe value")
    import org.apache.spark.sql.Encoders
    val castTo = manifestColType(spark, manifestPath, retries)
    val pred = values.map(v => containsValue(colName, v, castTo)).reduce(_ || _)
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
    * re-read distributed (a left-semi against the kept path keys — the
    * SAME [[pathKey]] normalization on both sides, so authority-carrying
    * URIs keep matching) and only path strings plus one geometry row
    * ever reach the driver — [[Sinks.writePartitionedAtomic]]'s staged
    * swap explicitly supports a plan that reads the manifest it is
    * overwriting. Single-writer maintenance assumption (shared with
    * ZoneMaps): readers are swap-safe concurrently; two concurrent
    * maintainers are not.
    */
  def update(spark: SparkSession, dataPath: String, manifestPath: String): Unit = {
    import org.apache.spark.sql.Encoders
    val data = spark.read.parquet(dataPath) // ONE listing: files AND schema
    val current = data.inputFiles.toSeq
    val currentKeys = current.map(pathKey).toSet
    def attemptHead(left: Int): (Seq[String], org.apache.spark.sql.Row) =
      try {
        val mf = spark.read.parquet(manifestPath)
        (mf.select(col("file")).as(Encoders.STRING).collect().toSeq,
          mf.select(col("col_name"), col("bits"), col("hashes")).limit(1).collect()
            .headOption.orNull)
      } catch {
        case e: Throwable if left > 0 && Sinks.isTransientSwapMiss(e) =>
          Thread.sleep(25L); attemptHead(left - 1)
      }
    val (knownPaths, head) = attemptHead(8)
    require(knownPaths.nonEmpty && head != null,
      "bloom manifest is empty — run save() first")
    val colName = head.getAs[String]("col_name")
    val (bits, hashes) = (head.getAs[Int]("bits"), head.getAs[Int]("hashes"))
    val known = knownPaths.map(pathKey).toSet
    val fresh = current.filterNot(f => known.contains(pathKey(f)))
    val dropped = known.diff(currentKeys)
    if (fresh.isEmpty && dropped.isEmpty) return
    val keepKeys = spark.createDataset(currentKeys.toSeq)(Encoders.STRING).toDF("__k")
    val keepDf = spark.read.parquet(manifestPath)
      .withColumn("__k", pathKey(col("file")))
      .join(keepKeys, Seq("__k"), "left_semi")
      .drop("__k")
    val freshDf =
      if (fresh.isEmpty) keepDf.where(lit(false))
      else buildFrom(spark.read.schema(data.schema).parquet(fresh: _*), colName, bits, hashes)
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
    val colType = df.schema(colName).dataType
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
        lit(colType.catalogString).as("col_type"),
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
    * one manifest pass, |values| probe-position evaluations, and ONE
    * data-directory listing shared by the candidate decision and the
    * pruned scan's schema.
    */
  def prunedReadIn(
      spark: SparkSession,
      dataPath: String,
      manifestPath: String,
      colName: String,
      values: Seq[Any]): DataFrame = {
    val data = spark.read.parquet(dataPath) // ONE listing: files AND schema
    val files = candidateFilesFrom(
      spark, data.inputFiles.toSeq, manifestPath, colName, values)
    val base =
      if (files.isEmpty)
        data.where(lit(false))
      else
        spark.read
          .schema(data.schema)
          .option("basePath", dataPath)
          .parquet(files: _*)
    base.where(col(colName).isin(values: _*))
  }
}
