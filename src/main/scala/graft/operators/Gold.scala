package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema builders (reference: gold_sql_to_postgres.py:67-195),
  * generalized to `DataFrame => DataFrame` combinators.
  */
object Gold {

  /** Date dimension: UNION ALL the date columns of several tables, then
    * DISTINCT (reference: gold_sql_to_postgres.py:67-79). Partial hash
    * aggregation dedups map-side before the single shuffle.
    */
  def dimDate(dateCols: Seq[(DataFrame, String)]): DataFrame =
    dateCols
      .map { case (df, c) => df.select(col(c).cast("date").as("dt")).filter(col("dt").isNotNull) }
      .reduce(_ union _)
      .distinct()

  /** Enrichment timeline: LEFT equi-join with an explicitly broadcast
    * dimension side (reference: gold_sql_to_postgres.py:82-92 with its
    * BROADCAST hint). Broadcasting removes the shuffle of the big side
    * entirely — the 100 TB side streams map-side.
    */
  def enrichTimeline(
      facts: DataFrame,
      smallDim: DataFrame,
      joinKeys: Seq[String]): DataFrame =
    facts.join(broadcast(smallDim), joinKeys, "left")

  /** Merge two change streams into one timeline: FULL OUTER join on
    * (key, date) with COALESCE'd output keys (reference:
    * gold_sql_to_postgres.py:128-138). Attribute columns stay null on the
    * side that had no change that day.
    */
  def mergeTimelines(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val l = keys.foldLeft(left) { (df, k) => df.withColumnRenamed(k, s"__l_$k") }
    val r = keys.foldLeft(right) { (df, k) => df.withColumnRenamed(k, s"__r_$k") }
    val cond = keys.map(k => l(s"__l_$k") === r(s"__r_$k")).reduce(_ && _)
    val merged = l.join(r, cond, "full_outer")
    val keyCols = keys.map(k => coalesce(col(s"__l_$k"), col(s"__r_$k")).as(k))
    val attrCols = merged.columns.filterNot(_.startsWith("__")).map(col).toIndexedSeq
    merged.select(keyCols ++ attrCols: _*)
  }

  /** M:N bridge: DISTINCT over the relationship pair
    * (reference: gold_sql_to_postgres.py:174-176).
    */
  def bridge(rel: DataFrame, cols: Seq[String]): DataFrame =
    rel.select(cols.map(col): _*).distinct()

  /** Periodic-snapshot fact: point-in-interval SK lookup. Equi-join on the
    * business key with the BETWEEN range as a join-side filter
    * (reference: gold_sql_to_postgres.py:179-195). Catalyst plans this as a
    * hash/sort-merge join on the equi conjunct — the range never degenerates
    * to a cross product. At scale the dim side is small (one row per
    * key-version) → broadcast; the snapshot side streams.
    */
  def snapshotFact(
      snapshotBase: DataFrame, // (snapshotDateCol, keyCols...)
      dim: DataFrame, // keyCols..., effective_start_date, effective_end_date, sk
      keyCols: Seq[String],
      snapshotDateCol: String,
      skCol: String,
      broadcastDim: Boolean = true): DataFrame = {
    val d0 = dim.select((keyCols ++ Seq("effective_start_date", "effective_end_date", skCol)).map(col): _*)
    val d = if (broadcastDim) broadcast(d0) else d0
    val f = snapshotBase.alias("f")
    val dd = d.alias("d")
    val equi: Column = keyCols.map(k => col(s"f.$k") === col(s"d.$k")).reduce(_ && _)
    val range = col(s"f.$snapshotDateCol")
      .between(col("d.effective_start_date"), col("d.effective_end_date"))
    f.join(dd, equi && range, "left")
      .select(
        (col(s"f.$snapshotDateCol") +: keyCols.map(k => col(s"f.$k")) :+ col(s"d.$skCol")): _*)
  }
}
