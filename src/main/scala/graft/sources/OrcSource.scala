package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Explicit-schema ORC ingestion — same discipline as [[CsvSource]]:
  * the schema is always supplied, never inferred from footers, so a scan
  * over a 100 TB table plans without touching file metadata first, and a
  * heterogeneous directory (schema drift across files) reads with ONE
  * authoritative shape instead of whichever file got sampled.
  *
  * ORC is a first-class Spark format: predicate pushdown, column pruning,
  * and vectorized reading all apply — the format choice changes nothing
  * upstream in this engine (every operator takes DataFrames).
  */
object OrcSource {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
