package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared machinery for LSH-blocked self-joins: bucket occupancy counting
  * and the linear keeper-star short-circuit for over-cap ("hot") buckets.
  * One implementation, used by MinHash, SimHash, and embedding near-dup —
  * a fix to the collision-verify or keeper logic lands in all three.
  */
private[operators] object Blocking {

  /** Per-bucket occupancy as a window count over the blocking key — one
    * shuffle on exactly the key the candidate self-join needs anyway,
    * cheaper than a separate count + join back. Adds column `__occ`.
    */
  def withOccupancy(banded: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    banded.withColumn("__occ", count(lit(1)).over(w))
  }

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
