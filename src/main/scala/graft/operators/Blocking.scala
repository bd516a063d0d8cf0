package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared machinery for LSH-blocked self-joins: bucket occupancy counting
  * and the linear keeper-star short-circuit for over-cap ("hot") buckets.
  * One implementation, used by MinHash, SimHash, and embedding near-dup —
  * a fix to the collision-verify or keeper logic lands in all three.
  */
private[operators] object Blocking {

  /** Per-bucket occupancy as a window count over the blocking key. Adds
    * column `__occ`. Note the window shuffles EVERY input row and sorts it
    * by the key (WindowExec) with no partial aggregation — callers that
    * only need the hot/cold SPLIT should use [[hotKeys]] + an anti/semi
    * join instead (guide §2.3: aggregate before you shuffle); this face
    * remains for callers that need the occupancy ON each row and whose
    * input is pinned or a cheap scan.
    */
  def withOccupancy(banded: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    banded.withColumn("__occ", count(lit(1)).over(w))
  }

  /** Keys of buckets whose occupancy exceeds `cap`, with the occupancy as
    * `__occ` — a grouped count (partial map-side aggregation: the exchange
    * carries ~one row per distinct key per map task, not one per input
    * row) filtered to the rare over-cap keys. The result is small by
    * construction (at most rows/cap keys), so joining it back to the
    * banded frame broadcasts under AQE in the common case — the
    * full-frame window shuffle+sort [[withOccupancy]] pays is replaced by
    * a partial-agg exchange plus broadcast anti/semi joins.
    *
    * NOTE the caller re-evaluates `banded` per reference (the count, the
    * cold anti-join, the hot semi-join) — use only where `banded` derives
    * narrowly from a pinned frame or a cheap scan, which is the LSH
    * banding case (an explode over the pinned prep table).
    */
  def hotKeys(banded: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__occ"))
      .where(col("__occ") > cap)

  /** Linear short-circuit for over-cap buckets: a mega-bucket is in
    * practice a cluster of identical content, so pair each member to the
    * keeper (min id) of its IDENTICAL `contentCol` — O(members) star pairs
    * instead of (n choose 2) within-bucket joins. Members whose content
    * matches nothing exactly are dropped (bounded recall loss, standard in
    * production dedup).
    *
    * `members` must have columns (`id`, contentCol), one row per doc.
    * The caller must pass content in CANONICAL form — e.g. a sorted array
    * for a set-valued column — because grouping keys on a 64-bit hash of
    * the value and then verifies equality against the keeper's content, so
    * a hash collision cannot emit a false pair but a non-canonical
    * representation would split a true group.
    *
    * Output: (id_a = keeper, id_b = member, outName = outValue).
    */
  def keeperStarPairs(
      members: DataFrame,
      contentCol: String,
      outName: String,
      outValue: Column): DataFrame = {
    val keyed = members
      .select(col("id"), col(contentCol).as("__content"))
      .withColumn("__ckey", xxhash64(col("__content")))
    val keepers = keyed
      .groupBy("__ckey")
      .agg(min("id").as("id_a"), min_by(col("__content"), col("id")).as("__content_keeper"))
    keyed
      .join(keepers, Seq("__ckey"))
      .where(col("id") =!= col("id_a") && col("__content") === col("__content_keeper"))
      .select(col("id_a"), col("id").as("id_b"), outValue.as(outName))
  }
}
