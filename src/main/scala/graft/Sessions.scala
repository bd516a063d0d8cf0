package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * Mirrors the session tuning the reference applies in both of its drivers
  * (reference: bronze_to_silver.py:7-18, gold_sql_to_postgres.py:8-17):
  * AQE + partition coalescing + skew-join handling, explicit shuffle
  * parallelism, bounded scan splits. Shuffle partitions default to the
  * worker-thread count (local mode) instead of the reference's 200 — on a
  * real cluster this is the knob to raise to ~2-3x total cores.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      // The driver's `events` table carries TIMESTAMP(NANOS) parquet values,
      // which Spark 4 rejects outright; read them as raw nanos longs instead
      // (Tables.load derives a micros timestamp column from them).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
