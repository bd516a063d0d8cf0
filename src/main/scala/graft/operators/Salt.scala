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
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val bigSalted = big.withColumn(SaltCol, saltOf(big, keys, saltFactor))
    val smallExploded = small.withColumn(
      SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
