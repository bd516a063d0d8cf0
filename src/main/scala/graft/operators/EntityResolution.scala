package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record matching (entity resolution): find record pairs
  * whose STRING identity differs by at most `maxEdit` edits, without ever
  * comparing records that do not share a blocking key. The relational
  * complement of the content-dedup family — [[Dedup]] matches documents
  * by shingle overlap, this matches ENTITIES (names, addresses, product
  * titles) by edit distance, the standard primitive for master-data
  * dedup and cross-source identity joins in a warehouse pipeline.
  *
  * Cost model, in order:
  *   1. equi-join on the blocking key(s) — the ONLY shuffle; candidate
  *      volume is Σ_b |block_b|² / 2, never |table|².
  *   2. length prefilter INSIDE the join condition: edit distance is
  *      bounded below by length difference, so `|len_a − len_b| > maxEdit`
  *      pairs drop before any DP runs (a plain long comparison).
  *   3. banded Levenshtein via the THRESHOLD form `levenshtein(a, b, t)`
  *      — O(maxEdit · len) per survivor instead of O(len²), returning −1
  *      past the band so over-threshold pairs cost only the abandoned
  *      band. Evaluated ONCE per pair (single projection, filter on the
  *      result — not repeated in the predicate).
  *
  * Skew: a giant block means the blocking key carries no information for
  * those rows (null-ish names, placeholder addresses) and its quadratic
  * candidate set would dominate the whole job. Blocks larger than
  * `maxBlock` are EXCLUDED from matching — the documented contract of
  * every capped operator here ([[Dedup.minHashDedupPairs]],
  * [[DedupIndex.crossPairs]]): bounded work, bounded recall loss, and an
  * audit view ([[oversizeBlocks]]) that makes the exclusion observable
  * instead of silent. Multi-pass blocking (union the pair sets of two
  * independent keys, e.g. name-prefix AND phonetic code) is the standard
  * recall repair and composes here as `pairsA.unionByName(pairsB)
  * .groupBy(ids).agg(min(edit))`.
  *
  * Output sim = 1 − edit/max(len): one IEEE division — bit-identical
  * across engines, so the whole result is oracle-comparable when blocks
  * are under cap.
  */
object EntityResolution {

  /** Canonical string normalization for matching: trim, collapse internal
    * whitespace, lowercase. Apply to BOTH the blocking key derivation and
    * the match column, or case/spacing differences count as edits.
    */
  def normalized(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  private def simCol(dist: Column, a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    // two empty strings match at distance 0 — sim is 1 by convention,
    // and the division must not run (ANSI divide-by-zero is a job error)
    when(maxLen === 0, lit(1.0))
      .otherwise(lit(1.0) - dist.cast("double") / maxLen.cast("double"))
  }

  /** Within-frame near-identity pairs: (id_a, id_b, edit_dist, sim) with
    * id_a < id_b, over rows sharing `blockCols`, edit distance ≤ maxEdit.
    * Rows in blocks larger than `maxBlock` do not participate (see
    * object doc; audit with [[oversizeBlocks]]).
    */
  def blockedFuzzyPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCols: Seq[String],
      maxEdit: Int = 2,
      maxBlock: Int = 4096): DataFrame = {
    require(blockCols.nonEmpty, "blocking on nothing would be an all-pairs join")
    val slim = capped(
      df.select((blockCols.map(col) :+ col(idCol) :+ col(strCol)): _*),
      blockCols, maxBlock)
    // Distinct per-side names: a self-join on shared attribute ids would
    // otherwise resolve both sides of the condition to the same column.
    val idx = blockCols.indices
    val a = slim.select(
      idx.map(i => col(blockCols(i)).as(s"__ka_$i")) :+
        col(idCol).as("id_a") :+ col(strCol).as("__s_a"): _*)
    val b = slim.select(
      idx.map(i => col(blockCols(i)).as(s"__kb_$i")) :+
        col(idCol).as("id_b") :+ col(strCol).as("__s_b"): _*)
    // PLAIN equality, not <=>: a NULL blocking key is the canonical
    // "uninformative key" the object doc warns about — null-keyed rows
    // do not participate in matching (and this keeps the operator
    // oracle-comparable with the q57 SQL's `=` join on dirty data).
    val joinCond = idx.map(i => col(s"__ka_$i") === col(s"__kb_$i")).reduce(_ && _) &&
      col("id_a") < col("id_b") &&
      abs(length(col("__s_a")) - length(col("__s_b"))) <= maxEdit
    a.join(b, joinCond)
      .withColumn("edit_dist", levenshtein(col("__s_a"), col("__s_b"), maxEdit))
      .where(col("edit_dist") >= 0)
      .select(
        col("id_a"), col("id_b"), col("edit_dist"),
        simCol(col("edit_dist"), col("__s_a"), col("__s_b")).as("sim"))
  }

  /** Two-frame fuzzy equi-match: left rows to right rows sharing the
    * blocking key(s), edit distance ≤ maxEdit. Output: (left_id,
    * right_id, edit_dist, sim). Same cost model and cap contract as
    * [[blockedFuzzyPairs]]; the cap applies per side.
    */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      rightId: String,
      leftStr: String,
      rightStr: String,
      blockCols: Seq[String],
      maxEdit: Int = 2,
      maxBlock: Int = 4096): DataFrame = {
    require(blockCols.nonEmpty, "blocking on nothing would be an all-pairs join")
    val idx = blockCols.indices
    val a = capped(
      left.select(blockCols.map(col) :+ col(leftId).as("left_id") :+ col(leftStr).as("__s_a"): _*),
      blockCols, maxBlock)
      .select(idx.map(i => col(blockCols(i)).as(s"__ka_$i")) :+
        col("left_id") :+ col("__s_a"): _*)
    val b = capped(
      right.select(blockCols.map(col) :+ col(rightId).as("right_id") :+ col(rightStr).as("__s_b"): _*),
      blockCols, maxBlock)
      .select(idx.map(i => col(blockCols(i)).as(s"__kb_$i")) :+
        col("right_id") :+ col("__s_b"): _*)
    // plain equality: null-keyed rows don't match (see blockedFuzzyPairs)
    val joinCond = idx.map(i => col(s"__ka_$i") === col(s"__kb_$i")).reduce(_ && _) &&
      abs(length(col("__s_a")) - length(col("__s_b"))) <= maxEdit
    a.join(b, joinCond)
      .withColumn("edit_dist", levenshtein(col("__s_a"), col("__s_b"), maxEdit))
      .where(col("edit_dist") >= 0)
      .select(
        col("left_id"), col("right_id"), col("edit_dist"),
        simCol(col("edit_dist"), col("__s_a"), col("__s_b")).as("sim"))
  }

  /** Audit view of what the cap excludes: (blockCols…, occupancy) for
    * blocks of `df` larger than `maxBlock`. Run alongside a match to
    * decide whether the blocking key needs refinement (occupancy ≫ cap →
    * the key is uninformative for those rows) or the cap needs raising.
    */
  def oversizeBlocks(df: DataFrame, blockCols: Seq[String], maxBlock: Int = 4096): DataFrame =
    df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("occupancy"))
      .where(col("occupancy") > maxBlock)

  /** Drop rows living in over-cap blocks — one window count on the block
    * key, the same exchange the candidate join needs next (Catalyst
    * reuses the partitioning, so the cap is not an extra shuffle).
    */
  private def capped(slim: DataFrame, blockCols: Seq[String], maxBlock: Int): DataFrame =
    Blocking.withOccupancy(slim, blockCols)
      .where(col("__occ") <= maxBlock)
      .drop("__occ")
}
