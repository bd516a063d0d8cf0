package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks.JdbcConfig

/** JDBC READ side of the warehouse round-trip — the ingestion shape the
  * reference's pipeline implies but never writes down (it re-extracts
  * full CSVs every run; `/root/reference/bronze_to_silver.py:94-108`
  * then merges them by key). Pulling from an OLTP system at scale has
  * two non-negotiables, both encoded here:
  *
  *   1. PARALLEL RANGE READS: a single-connection `spark.read.jdbc` is
  *      one executor draining one cursor — [[read]] bounds a numeric
  *      column with a one-row MIN/MAX pushdown query and fans the scan
  *      out over `numPartitions` range predicates, each its own
  *      connection on its own executor.
  *   2. INCREMENTAL, PUSHED DOWN: nightly re-extracts of an append-only
  *      or serially-versioned table are O(table) forever. [[readIncremental]]
  *      ships `WHERE watermark > lastSeen` INTO the database as a derived
  *      table, so only new rows ever transit the wire, and the pull is
  *      itself range-partitioned between the old and new high-water mark.
  *
  * Watermarks are LONGs (serial ids, epoch seconds/micros) by contract:
  * a numeric splice into the pushed-down SQL cannot be an injection
  * vector and range math stays exact — for timestamp watermarks, expose
  * an epoch column. The delivery guarantee composes with the rest of the
  * repo: land each pull via [[Sinks.writePartitionedAtomic]], checkpoint
  * `SELECT MAX(watermark)` of what LANDED (not what was read), and a
  * crash between read and land re-pulls the same rows — at-least-once
  * into [[graft.operators.CdcMerge]], whose keyed dedup makes the whole
  * loop effectively exactly-once (same contract as the streaming side's
  * idempotent batch appends).
  */
object JdbcSource {

  /** SQL identifiers spliced into pushed-down statements (`table`,
    * `partitionCol`, `watermarkCol`) must look like identifiers — plain
    * or schema-qualified names, optionally "quoted". They come from code,
    * not users, but the injection contract above should be SELF-enforcing
    * rather than documentation-enforced: a value carrying spaces,
    * semicolons, or parens fails loudly here instead of reaching the
    * database as spliced SQL.
    */
  private[graft] def requireIdentifier(name: String, what: String): Unit = {
    val plain = """[A-Za-z_][A-Za-z0-9_$]*"""
    val quoted = """"[^"\\;]+""""
    val part = s"($plain|$quoted)"
    require(name.matches(s"$part(\\.$part)*"),
      s"$what must be a (possibly schema-qualified) SQL identifier, got: '$name'")
  }

  private def base(spark: SparkSession, cfg: JdbcConfig) =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("fetchsize", cfg.batchSize)

  /** One-row aggregate pushed to the database (a derived table, so the
    * DB computes it; Spark ships back a single row).
    */
  private def oneRow(spark: SparkSession, cfg: JdbcConfig, sql: String): DataFrame =
    base(spark, cfg).option("dbtable", s"($sql) q").load()

  /** Full-table read, range-parallelized on `partitionCol` (numeric).
    * Bounds come from one pushed-down MIN/MAX — metadata-scale work for
    * an indexed/serial column. Empty tables read as an empty frame
    * without fanning out.
    */
  def read(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      partitionCol: String,
      numPartitions: Int): DataFrame = {
    requireIdentifier(table, "table")
    requireIdentifier(partitionCol, "partitionCol")
    val b = oneRow(spark, cfg,
      s"SELECT MIN($partitionCol) lo, MAX($partitionCol) hi FROM $table").head()
    if (b.isNullAt(0)) return base(spark, cfg).option("dbtable", table).load()
    read(spark, cfg, table, partitionCol, numPartitions,
      b.getAs[Number](0).longValue(), b.getAs[Number](1).longValue())
  }

  /** [[read]] with caller-known bounds (skips the MIN/MAX round-trip). */
  def read(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      partitionCol: String,
      numPartitions: Int,
      lower: Long,
      upper: Long): DataFrame = {
    requireIdentifier(table, "table")
    requireIdentifier(partitionCol, "partitionCol")
    base(spark, cfg)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("numPartitions", numPartitions)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .load()
  }

  /** Rows with `watermarkCol > lastSeen`, filtered IN the database and
    * range-partitioned between the watermarks. `lastSeen = Long.MinValue`
    * bootstraps to a full (still parallel) read.
    */
  def readIncremental(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      watermarkCol: String,
      lastSeen: Long,
      numPartitions: Int = 4): DataFrame = {
    requireIdentifier(table, "table")
    requireIdentifier(watermarkCol, "watermarkCol")
    val inc = s"(SELECT * FROM $table WHERE $watermarkCol > $lastSeen) inc"
    val b = oneRow(spark, cfg,
      s"SELECT MIN($watermarkCol) lo, MAX($watermarkCol) hi FROM $table " +
        s"WHERE $watermarkCol > $lastSeen").head()
    if (b.isNullAt(0)) {
      // nothing new — an empty frame with the table's schema, no fan-out
      base(spark, cfg).option("dbtable", inc).load().where(lit(false))
    } else {
      base(spark, cfg)
        .option("dbtable", inc)
        .option("partitionColumn", watermarkCol)
        .option("numPartitions", numPartitions)
        .option("lowerBound", b.getAs[Number](0).longValue())
        .option("upperBound", b.getAs[Number](1).longValue())
        .load()
    }
  }

  /** The checkpoint value for the NEXT [[readIncremental]]: max watermark
    * of a landed frame (compute on what was WRITTEN, per the delivery
    * contract above). Null/empty → `lastSeen` unchanged.
    */
  def nextWatermark(landed: DataFrame, watermarkCol: String, lastSeen: Long): Long = {
    val m = landed.agg(max(col(watermarkCol).cast("long"))).head()
    if (m.isNullAt(0)) lastSeen else math.max(lastSeen, m.getLong(0))
  }
}
