package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog itself lives in [[Queries]]; this object is the stable
  * facade the driver harness calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses only the lineitem table so it runs under any session config.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH banding, xxhash64 sketches, approximate search).
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
