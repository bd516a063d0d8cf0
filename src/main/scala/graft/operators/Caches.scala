package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted by graft operators whose lifetime the
  * operator itself cannot scope (the returned frames reference the cache
  * lazily, so an eager unpersist inside the operator would defeat it).
  *
  * A long-lived session running dedup/similarity per corpus batch calls
  * [[release]] between batches, after fully consuming the returned frames.
  * Benchmark and batch drivers do the same to keep storage memory from
  * accreting across unrelated queries.
  */
object Caches {

  private val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and track it for a later [[release]]. */
  def pin(df: DataFrame): DataFrame = pinned.synchronized {
    pinned += df
    df.persist()
  }

  /** Unpersist every operator-pinned frame in this JVM. Pass
    * `blocking = true` when the caller needs storage memory actually
    * drained before proceeding (e.g. a benchmark timing the next query) —
    * async eviction otherwise overlaps whatever runs next.
    */
  def release(blocking: Boolean = false): Unit = pinned.synchronized {
    pinned.foreach(_.unpersist(blocking))
    pinned.clear()
  }
}
