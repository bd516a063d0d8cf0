package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins.
  *
  * AQE's skew-join splitting handles most cases at runtime; this is the
  * static form for when a key's skew is known up front (the classic
  * null-key / mega-customer problem) or AQE is unavailable (streaming
  * joins, non-shuffle-join plans).
  *
  * The big (skewed) side gets a deterministic salt in [0, saltFactor);
  * the small side is exploded saltFactor× so every (key, salt) pair
  * exists. The join key becomes (keys..., salt), splitting each hot key's
  * rows across saltFactor reducers. Cost: small side × saltFactor — keep
  * the replicated side genuinely small.
  */
object Salt {

  private val SaltCol = "__graft_salt"

  /** Deterministic per-row salt derived from the row's own payload (hash of
    * the non-key columns), so reruns salt identically — no rand().
    *
    * Limitation: rows of a hot key with IDENTICAL payloads get the same
    * salt and stay on one reducer, and a low-cardinality payload caps the
    * spread at its distinct count. When the hot key's rows are duplicates,
    * pass a row-identity column (an event id, file offset…) through
    * `saltedJoin`'s `saltExpr` instead.
    */
  private def saltOf(df: DataFrame, keys: Seq[String], saltFactor: Int): Column = {
    val payload = df.columns.filterNot(keys.contains).map(col)
    val basis = if (payload.nonEmpty) payload else df.columns.map(col)
    pmod(xxhash64(basis.toIndexedSeq: _*), lit(saltFactor.toLong)).cast("int")
  }

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner",
      saltExpr: Option[Column] = None): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // The small side is replicated saltFactor×, so any join preserving
    // unmatched SMALL rows (right/full outer) would emit saltFactor
    // null-extended copies of each.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(
      Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross")
        .contains(normalized),
      s"saltedJoin supports joins that keep only the big side's unmatched rows (got '$joinType'): " +
        "the replicated small side would duplicate its unmatched rows")
    val salt = saltExpr
      .map(e => pmod(xxhash64(e), lit(saltFactor.toLong)).cast("int"))
      .getOrElse(saltOf(big, keys, saltFactor))
    val bigSalted = big.withColumn(SaltCol, salt)
    val smallExploded = small.withColumn(
      SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
