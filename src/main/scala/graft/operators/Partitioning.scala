package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for compute-heavy per-row operators.
  *
  * A small parquet file arrives as ONE input split, so an expression-heavy
  * stage (minhash sketching, LSH signatures, simhash folds — thousands of
  * interpreted ops per row) runs on a single core no matter how many the
  * cluster has. `spread` round-robins such inputs up to the session's
  * default parallelism first; the shuffle moves only the raw rows (cheap)
  * and buys a full-width compute stage. Inputs that already have enough
  * splits — the 100 TB case — pass through untouched.
  */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
