package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (batch form).
  *
  * Classic log-analytics shape: a new session starts when the gap to the
  * previous event of the same user exceeds `gapSeconds`. One window
  * partitioning (user) feeds both the lag and the running session counter —
  * a single hash exchange on user_id, then a per-partition sort. At 100 TB
  * the key cardinality (users) dominates; skewed power-users are handled by
  * AQE skew splitting since everything downstream is per-(user, session).
  */
object Sessionize {

  /** Adds `session_idx` (0-based per user) to the events. `tsSecondsCol`
    * must be an epoch-seconds bigint (timezone-proof, oracle-friendly).
    */
  def assignSessions(
      events: DataFrame,
      userCol: String,
      tsSecondsCol: String,
      tieBreak: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsSecondsCol), col(tieBreak))
    val newSession = when(
      col(tsSecondsCol) - lag(col(tsSecondsCol), 1).over(w) > gapSeconds, 1
    ).otherwise(0)
    events
      .withColumn("__new_session", newSession)
      .withColumn(
        "session_idx",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session rollup: event count, span, value sum. */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsSecondsCol: String,
      tieBreak: String,
      valueCol: String,
      gapSeconds: Long): DataFrame =
    assignSessions(events, userCol, tsSecondsCol, tieBreak, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsSecondsCol)).as("session_start_sec"),
        max(col(tsSecondsCol)).as("session_end_sec"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("session_value"))
}
