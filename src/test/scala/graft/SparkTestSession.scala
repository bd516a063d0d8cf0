package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (sbt forks a single test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // stable codegen class names across re-runs (see Sessions.local)
      .config("spark.sql.codegen.useIdInClassName", "false")
      // Static conf, set before the first session: the default 100-entry
      // codegen class cache thrashes for a long-lived session serving this
      // catalog (Guava's segmented LRU evicts recently-used entries once
      // near capacity), re-paying janino+JIT on queries that ran minutes
      // ago. ~2000 entries covers the whole catalog's generated classes (raised from 1000 in round 11 when the grown catalog churned the smaller cache).
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
