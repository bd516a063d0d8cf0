package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-prefiltered join: semi-join reduction for big⋈small joins.
  *
  * Build a Bloom filter of the small side's join keys (one tiny aggregate),
  * broadcast it, and drop big-side rows that cannot match BEFORE the join's
  * exchange — the shuffle then carries only probable matches. Bloom filters
  * have no false negatives, so the final join result is exactly the plain
  * join; false positives only cost wasted shuffle (rate set by numBits).
  *
  * This is the static form of Spark's own AQE runtime bloom filter
  * (spark.sql.optimizer.runtime.bloomFilter.*), exposed as an explicit
  * operator via the internal BloomFilterAggregate/BloomFilterMightContain
  * expressions — useful when the optimizer's heuristics don't fire (e.g.
  * the small side is a computed frame, or the join is streamed).
  */
object BloomJoin {

  /** Distributed bloom build, collected to the driver as one small binary
    * sketch (`numBits/8` bytes — the broadcast-variable pattern;
    * might_contain requires its filter side to be a constant or scalar
    * subquery, not a join attribute).
    */
  private def bloomOf(small: DataFrame, key: String, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.eagerExpression(xxhash64(col(key))),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    small.agg(ColumnBridge.column(agg).as("__graft_bf")).head.getAs[Array[Byte]]("__graft_bf")
  }

  /** The reduction step alone: `big` filtered to rows whose key might be in
    * `small` (true matches + bloom false positives).
    */
  def prefilter(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val bf = bloomOf(small, key, expectedItems, numBits)
    big.where(
      ColumnBridge.column(
        BloomFilterMightContain(
          Literal(bf, org.apache.spark.sql.types.BinaryType),
          ColumnBridge.eagerExpression(xxhash64(col(key))))))
  }

  /** Inner/semi join of `big` to `small` on `key`, with the big side
    * bloom-prefiltered before the exchange.
    */
  def prefilteredJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      joinType: String = "inner",
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    // The prefilter drops unmatched big-side rows, so any join that must
    // preserve them (left/full outer from the big side) would silently
    // return inner-join results.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(
      Set("inner", "leftsemi", "semi", "cross").contains(normalized),
      s"prefilteredJoin supports inner/semi joins only (got '$joinType'): " +
        "the bloom prefilter removes unmatched big-side rows")
    prefilter(big, small, key, expectedItems, numBits).join(small, Seq(key), joinType)
  }
}
