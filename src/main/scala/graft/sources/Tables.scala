package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic testdata (TESTDATA.md): one parquet
  * file per table under an sf directory. Parquet scans are
  * partition-discovering and benefit from Catalyst pushdown/pruning
  * automatically (reference relies on the same: gold_sql_to_postgres.py:46-50).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    // `events` carries both clocks for downstream operators: a proper
    // timestamp (`ts`) and the exact integer nanos (`ts_ns`). Which one the
    // file provides depends on the testdata generation: TIMESTAMP(NANOS)
    // parquet surfaces as a nanos long under
    // spark.sql.legacy.parquet.nanosAsLong (derive `ts` from it), while
    // TIMESTAMP(MICROS) surfaces as a timestamp (derive `ts_ns` from it —
    // micros→nanos is exact ×1000). Either way the loaded schema is
    // identical, so every consumer of `ts`/`ts_ns` is generation-agnostic.
    if (name == "events" && raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      import org.apache.spark.sql.functions._
      raw
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    } else if (name == "events") {
      import org.apache.spark.sql.functions._
      // TIMESTAMP_NTZ (timezone-naive parquet) under the UTC session
      // (Sessions.scala): the cast is wall-clock-preserving and
      // unix_micros then matches DuckDB's epoch_us on the same file
      val asTs = col("ts").cast(org.apache.spark.sql.types.TimestampType)
      raw
        .withColumn("ts", asTs)
        .withColumn("ts_ns", unix_micros(asTs) * lit(1000L))
    } else raw
  }

  /** Register every testdata table as a temp view (reference pattern:
    * gold_sql_to_postgres.py:59-63) so `spark.sql` can address them.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
