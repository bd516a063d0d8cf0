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
    // `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 can only read
    // as a nanos long (spark.sql.legacy.parquet.nanosAsLong). Re-derive a
    // proper micros timestamp so downstream operators see a timestamp column
    // (`ts`), keeping the exact nanos value alongside as `ts_ns`.
    if (name == "events" && raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      import org.apache.spark.sql.functions._
      raw
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    } else raw
  }

  /** Register every testdata table as a temp view (reference pattern:
    * gold_sql_to_postgres.py:59-63) so `spark.sql` can address them.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
