package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Explicit-schema CSV ingestion (reference: bronze_to_silver.py:57-64).
  *
  * Schema is always supplied, never inferred — inference costs an extra
  * pass over the data, which at 100 TB is an extra full scan. PERMISSIVE
  * mode turns malformed cells into nulls so one bad row can't fail a batch;
  * dirty rows are dropped later by explicit not-null key filters.
  */
object CsvSource {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
}
