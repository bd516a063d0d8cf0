package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Partition-count hygiene for compute-heavy per-row operators.
  *
  * A small parquet file arrives as ONE input split, so an expression-heavy
  * stage (minhash sketching, LSH signatures, simhash folds — thousands of
  * ops per row) runs on a single core no matter how many the cluster has.
  * `spread` round-robins such inputs up to the session's default
  * parallelism first; the shuffle moves only the raw rows (cheap) and buys
  * a full-width compute stage. Inputs that already have enough splits — the
  * 100 TB case — pass through untouched.
  *
  * The split estimate is METADATA-ONLY (file count from the scan
  * relations): calling `df.rdd.getNumPartitions` under AQE would
  * materialize every upstream exchange just to read a number, running the
  * caller's pipeline once for the count and again for real. Frames without
  * file-scan leaves (joins/aggregates as input) pass through unchanged —
  * their exchanges already restored parallelism.
  */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val scanFiles = df.queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs.location.inputFiles.length
    }
    if (scanFiles.nonEmpty && scanFiles.sum < target) df.repartition(target) else df
  }
}
