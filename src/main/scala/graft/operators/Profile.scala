package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.{GkMergeAgg, GkQuantileAgg, GkQuantilesExpr}

/** Incremental (mergeable-sketch) column profiling.
  *
  * [[Quality.columnProfile]] answers "what does this table look like" in
  * one pass — but it answers for ONE scan, and every new day of data means
  * re-scanning everything profiled so far. At 100 TB that re-scan IS the
  * cost. This operator flips the shape: profile each shard (a day, a
  * partition, an ingest batch) ONCE into a small mergeable summary row —
  * exact count / null count / min / max, a datasketches HLL sketch for
  * distinct count, a Greenwald–Khanna sketch for quantiles — persist the
  * summary rows, and answer profile queries over ANY shard combination by
  * merging the covered rows in O(shards × sketch_size), data untouched.
  *
  * Merge laws (pinned by ProfileSpec / QuantileProperties):
  *   count/nulls/min/max — exact and associative (plain algebra);
  *   HLL union           — register-wise max, a sketch of the union;
  *                         estimate within the lgK error bound of exact;
  *   GK merge            — rank error ≤ (eps_a + eps_b)·n, see
  *                         [[graft.expressions.GkSketch]].
  *
  * Scale shape: `shardProfiles` is one scan, one shuffle of (shards) keys
  * — partial aggregation compresses each task's rows to one sketch before
  * the exchange, so the shuffle moves O(shards × sketch), not data.
  * `mergeProfiles` reads only summary rows: KB per shard. The decode step
  * ([[profileReport]]) runs on the handful of merged rows.
  */
object Profile {

  /** `graft_gk_sketch` as a Column — public so other operators
    * ([[Anomaly.robustOutliers]]) can aggregate the same mergeable
    * sketch.
    */
  def gkSketchCol(value: Column, relErr: Double): Column =
    ColumnBridge.column(
      GkQuantileAgg(ColumnBridge.eagerExpression(value), relErr).toAggregateExpression())

  private def gkMerge(sketch: Column): Column =
    ColumnBridge.column(
      GkMergeAgg(ColumnBridge.eagerExpression(sketch)).toAggregateExpression())

  /** `graft_gk_quantiles` as a Column: decode quantile probabilities from
    * a (merged) sketch struct.
    */
  def gkQuantiles(sketch: Column, probs: Seq[Double]): Column =
    ColumnBridge.column(GkQuantilesExpr(
      ColumnBridge.eagerExpression(sketch),
      ColumnBridge.eagerExpression(array(probs.map(lit): _*).cast("array<double>"))))

  /** One mergeable profile row per shard of `df`:
    *
    *   shard, row_count, null_count, min_value, max_value,
    *   distinct_sketch (binary datasketches HLL of `distinctCol`),
    *   quantile_sketch (GK struct of `valueCol`)
    *
    * Write the result to the profile store with mode append as shards
    * land; [[mergeProfiles]] any subset later. `lgK` is the HLL accuracy
    * dial (12 → ~1.6 KB, ±1.6% stderr), `relErr` the GK rank-error bound.
    */
  def shardProfiles(
      df: DataFrame,
      shard: Column,
      valueCol: Column,
      distinctCol: Column,
      relErr: Double = 0.01,
      lgK: Int = 12): DataFrame = {
    // datasketches HLL accepts int/bigint/string/binary only; other types
    // sketch their canonical string form (distinct-by-representation — the
    // profiling semantics, and what makes the same column mergeable across
    // shards regardless of the writer's physical type)
    val distinctable = {
      import org.apache.spark.sql.types._
      val t = df.select(distinctCol).schema.head.dataType
      t match {
        case IntegerType | LongType | StringType | BinaryType => distinctCol
        case _ => distinctCol.cast("string")
      }
    }
    df.groupBy(shard.as("shard"))
      .agg(
        count(lit(1)).as("row_count"),
        sum(when(valueCol.isNull, 1L).otherwise(0L)).as("null_count"),
        min(valueCol).as("min_value"),
        max(valueCol).as("max_value"),
        hll_sketch_agg(distinctable, lgK).as("distinct_sketch"),
        gkSketchCol(valueCol, relErr).as("quantile_sketch"))
  }

  /** Collapses any subset of profile rows to ONE mergeable row of the same
    * shape (minus `shard`) — output can itself be re-stored and re-merged
    * (the sketches are semigroup values; rollups compose).
    */
  def mergeProfiles(profiles: DataFrame): DataFrame =
    profiles.agg(
      // coalesce: merging ZERO profile rows (a date range covering no
      // shards) is a defined empty profile, not a null one
      coalesce(sum(col("row_count")), lit(0L)).as("row_count"),
      coalesce(sum(col("null_count")), lit(0L)).as("null_count"),
      min(col("min_value")).as("min_value"),
      max(col("max_value")).as("max_value"),
      hll_union_agg(col("distinct_sketch")).as("distinct_sketch"),
      gkMerge(col("quantile_sketch")).as("quantile_sketch"))

  /** Human/join-facing decode of a merged profile row: sketches become
    * `distinct_est` and one column per requested quantile (`p50`, `p95`,
    * …; probability 0.995 → `p99_5`).
    */
  def profileReport(merged: DataFrame, probs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val qs = gkQuantiles(col("quantile_sketch"), probs)
    // decimal (not double) scaling: 0.99 * 100 in doubles is 99.00000000000001
    val names = probs.map(p => "p" + (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_"))
    merged.select(
      Seq(
        col("row_count"), col("null_count"), col("min_value"), col("max_value"),
        hll_sketch_estimate(col("distinct_sketch")).as("distinct_est")) ++
      names.zipWithIndex.map { case (n, i) => qs.getItem(i).as(n) }: _*)
  }
}
