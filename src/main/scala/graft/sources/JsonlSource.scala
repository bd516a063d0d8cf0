package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines corpus ingestion — the de-facto interchange format for
  * training-data pipelines (one JSON document per line, usually .gz or
  * .zst per shard).
  *
  * Same discipline as [[CsvSource]]: schema always supplied, never
  * inferred (inference is an extra full scan at corpus scale), PERMISSIVE
  * parsing so one mangled line cannot fail a 100 TB batch. Unlike CSV, a
  * corrupt line keeps its raw text in `_corrupt_record` — corpus pipelines
  * route those to a quarantine sink instead of silently dropping them.
  *
  * Compression is transparent (the codec comes from the file extension);
  * note .gz shards are unsplittable — one task per shard — so shard size,
  * not file count, is the read-parallelism knob upstream.
  */
object JsonlSource {

  val corruptCol = "_corrupt_record"

  /** Read with explicit schema; adds `_corrupt_record` (string, null for
    * clean rows) capturing unparseable lines.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(StructField(corruptCol, StringType, nullable = true)))
      .json(path)

  def isCorrupt: Column = col(corruptCol).isNotNull

  /** Clean rows only. DROPMALFORMED rather than a corrupt-column filter:
    * dropping malformed lines at parse time is exactly this method's
    * contract (readQuarantine is the other half), and it keeps
    * aggregate-only queries legal — a filter on `_corrupt_record` makes
    * `count()` reference only the internal corrupt column, which Spark
    * rejects (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .json(path)

  /** Streaming face: watch a directory of JSONL shards as they land (the
    * ingest edge of a continuously-fed corpus). Same explicit-schema,
    * malformed-dropping contract as [[readClean]]; downstream transforms
    * are the ordinary batch operators — streaming-vs-batch stays at the
    * source/sink edge.
    */
  def readCleanStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .json(path)

  /** Corrupt rows (schema columns null, raw line in `_corrupt_record`) for
    * a quarantine sink. The full row rides along by design: Spark rejects
    * scans whose only referenced column is the internal corrupt-record
    * column (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    */
  def readQuarantine(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).where(isCorrupt)
}
