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

  /** Which keys need salting, and at what factor: every key holding at
    * least `minShare` of the rows, with its exact count, share, and the
    * suggested `saltFactor` = ceil(share × numPartitions) — the number of
    * reducers that key needs so its salted splits are ordinary
    * partition-sized. Feed the result straight back into [[saltedJoin]]
    * (or set AQE's skew thresholds with open eyes).
    *
    * Output: (keys..., n_rows, share, salt_factor), exact counts.
    *
    * Scale contract: the naive `groupBy(keys).count()` is itself the
    * skewed shuffle this report exists to prevent — so the hot-key scan
    * rides [[Frequency]]'s two-pass shape instead: a Misra–Gries summary
    * sized `ceil(2/minShare)` (any key at `minShare` is guaranteed a
    * counter — the MG law needs only `k+1 > 1/minShare`), then exact
    * counts of the ≤ k candidates with the IN-filter pruning the scan
    * BEFORE the tiny exchange. No key-cardinality shuffle ever exists.
    * `salt_factor` is exact integer arithmetic (decimal ceil-division —
    * no float boundary ambiguity); `share` is a single IEEE division.
    * Two passes over `df` — pin nondeterministic frames first, the
    * standard two-action contract ([[Frequency]]).
    *
    * Multi-key note: candidates are tracked on a `\u0001`-joined string
    * key with a `\u0000` null sentinel; keys whose values contain those
    * control characters could alias ACROSS columns — irrelevant for the
    * id/category/date keys skew reports run on, but don't feed it binary
    * payloads. Null key values form one real group, counted like any
    * other (the all-null key is the classic skew culprit).
    */
  def skewReport(
      df: DataFrame,
      keys: Seq[String],
      minShare: Double,
      numPartitions: Int = 32): DataFrame = {
    require(keys.nonEmpty, "skewReport needs at least one key column")
    require(minShare > 0.0 && minShare <= 1.0, s"minShare=$minShare outside (0,1]")
    require(numPartitions > 0, "numPartitions must be positive")
    val keyParts = keys.map(k => coalesce(col(k).cast("string"), lit("\u0000")))
    val keyExpr =
      if (keys.size == 1) keyParts.head
      else concat_ws("\u0001", keyParts: _*)
    val sketchK = math.max(64, math.ceil(2.0 / minShare).toInt)
    val (n, cand) = Frequency.mgSummary(df, keyExpr, sketchK)
    val minCount = math.max(1L, math.ceil(minShare * n).toLong)
    val hot =
      if (n == 0L || cand.isEmpty) df.where(lit(false))
      else df.where(keyExpr.isin(cand.map(_._1): _*))
    val nDec = lit(math.max(n, 1L)).cast("decimal(38,0)")
    val m = (col("n_rows").cast("decimal(38,0)") * lit(numPartitions.toLong) +
      nDec - lit(1L).cast("decimal(38,0)"))
    hot
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") >= minCount)
      .withColumn("share", col("n_rows").cast("double") / lit(n.toDouble))
      .withColumn("salt_factor", ((m - (m % nDec)) / nDec).cast("long"))
  }
}
