package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Full-history batch CDC merge (reference: bronze_to_silver.py:94-108).
  *
  * Semantics: existing ∪ new, deduplicated on the composite business key.
  * Late rows are just new key tuples absorbed on the next merge;
  * re-deliveries dedup away — idempotent by construction.
  *
  * `dropDuplicates(keys)` keeps an arbitrary row per key when the keys
  * don't cover every column (SURVEY.md §7.4#3); in the reference the merge
  * keys cover all columns so the choice is benign. For the general case
  * `mergeDeterministic` pins the winner with an explicit tiebreak order.
  *
  * Scale note: dropDuplicates is a hash aggregate — partial (map-side)
  * dedup happens before the single shuffle on the key columns, so the
  * exchange only carries surviving candidates. At 100 TB prefer writing
  * silver bucketed by the merge key so repeated merges reuse partitioning.
  */
object CdcMerge {

  def mergeFullHistory(
      existing: Option[DataFrame],
      fresh: DataFrame,
      keys: Seq[String]): DataFrame =
    existing match {
      case None => fresh.dropDuplicates(keys)
      case Some(old) =>
        // Align existing to the new layout (reference: bronze_to_silver.py:104)
        old
          .select(fresh.columns.map(col).toIndexedSeq: _*)
          .unionByName(fresh)
          .dropDuplicates(keys)
    }

  /** Deterministic winner: smallest tiebreak tuple per key via min-struct
    * aggregation (one shuffle, no window sort).
    */
  def mergeDeterministic(
      existing: Option[DataFrame],
      fresh: DataFrame,
      keys: Seq[String],
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val unioned = existing match {
      case None      => fresh
      case Some(old) => old.select(fresh.columns.map(col).toIndexedSeq: _*).unionByName(fresh)
    }
    val others = fresh.columns.filterNot(keys.contains)
    val packed = struct((tieBreak ++ others.filterNot(tieBreak.contains)).map(col): _*)
    unioned
      .groupBy(keys.map(col): _*)
      .agg(min(packed).as("__w"))
      .select((keys.map(col) ++ others.map(c => col(s"__w.$c").as(c))): _*)
  }

  /** PARTITION-SCOPED full-history merge into a hive-partitioned silver
    * table: only the partitions present in `fresh` are read
    * (partition-pruned scan), merged, and atomically swapped — untouched
    * partition directories are never listed or rewritten, so cost is
    * O(touched partitions), not O(table history). Shared by the batch API
    * and every `cdcMergeStream` micro-batch — ONE merge code path.
    *
    * Contract: a merge key must not move between partition values across
    * deliveries, or the old copy in the untouched partition survives (the
    * same contract hive-partitioned upserts have everywhere).
    */
  def mergeIntoPartitioned(
      silverPath: String,
      fresh: DataFrame,
      keys: Seq[String],
      partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    require(partitionCols.nonEmpty, "partition-scoped merge needs partition columns")
    val spark = fresh.sparkSession
    // persist: fresh feeds both the touched-partition probe and the union.
    val b = fresh.persist()
    try {
      // A previous swap may have crashed mid-rename; restore BEFORE
      // building the read plan so the merge never sees a half-table.
      graft.sources.Sinks.recoverStrandedPartitions(spark, silverPath)
      // Touched partitions as strings — the representation hive dir names
      // use, and (with type inference off below) the type the partition
      // columns read back as, so the pruning predicate is a string
      // equality that reaches PartitionFilters.
      val touched = b
        .select(partitionCols.map(c => col(c).cast("string")): _*)
        .distinct()
        .collect()
      if (touched.nonEmpty) {
        val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
        val prevInfer = spark.conf.get(inferKey, "true")
        // Partition discovery is eager at read time, so the conf can be
        // restored right after readIfExists returns.
        val existingScoped =
          try {
            spark.conf.set(inferKey, "false")
            readIfExists(spark, silverPath).map { e =>
              val pred = touched.map { r =>
                partitionCols.zipWithIndex
                  .map { case (c, i) => col(c) <=> lit(r.getString(i)) }
                  .reduce(_ && _)
              }.reduce(_ || _)
              // align the inferred-as-string partition cols back to the
              // fresh frame's types for the merge union
              partitionCols.foldLeft(e.where(pred)) { (d, c) =>
                d.withColumn(c, col(c).cast(b.schema(c).dataType))
              }
            }
          } finally spark.conf.set(inferKey, prevInfer)
        val merged = mergeFullHistory(existingScoped, b, keys)
        graft.sources.Sinks.writePartitionsAtomic(merged, silverPath, partitionCols)
      }
    } finally b.unpersist()
  }

  /** Probe-or-none scan for the merge target (reference: bronze_to_silver.py:66-68).
    * The probe goes through the Hadoop FileSystem resolved from the path —
    * a java.nio probe is local-FS only and would return false for every
    * hdfs:// or s3a:// table, silently rebuilding silver from fresh data.
    */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }
}
