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
