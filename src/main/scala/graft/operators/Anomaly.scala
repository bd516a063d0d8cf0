package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical outlier flagging at warehouse scale, with EXACT group
  * moments. The naive z-score (`abs(x − avg) > k·stddev` over a window)
  * is wrong twice in a distributed engine: float summation is
  * order-dependent, so the flag set can differ run to run with the same
  * data (partial-agg order is not deterministic), and `sqrt` drags the
  * comparison through a rounding step. Both disappear by clearing
  * denominators — the k·sigma test
  *
  *   (x − mean)² > k² · variance_pop
  *
  * is, over an INTEGER-valued column with n = count, s = Σx, ss = Σx²,
  *
  *   (n·x − s)² > k² · (n·ss − s²)
  *
  * pure integer algebra: exact, associative, order-free, engine-agnostic
  * (the oracle twin reproduces it bit-for-bit in ANSI SQL). Fixed-point
  * data (prices, latencies in µs) enters via its integer representation
  * — e.g. `floor(value * 100)` for 2-decimal currency: any such mapping
  * works as long as it is applied identically everywhere, monotone, and
  * integral.
  *
  * Overflow envelope: the arithmetic runs in decimal(38,0), and the
  * BINDING terms are the squares — dev² ≤ (2n·|x|max)² and
  * k²·(n·ss − s²) ≤ (k·n·|x|max)² must stay under 10³⁸ — so the safe
  * region is 2·k·n·|x|max < 10¹⁹ per group (e.g. k = 3, 10⁸ rows of
  * 10⁹-unit values; int64 would wrap ~10⁹× earlier, the reason for
  * decimal). Leaving it is LOUD under Spark's default ANSI mode
  * (decimal overflow raises ARITHMETIC_OVERFLOW; with ANSI disabled it
  * would null out and silently unflag — do not run this non-ANSI
  * beyond the envelope). Rescale units to re-enter — the test is
  * invariant under x → x/c up to the quantization it introduces.
  *
  * Shape: ONE shuffle — a window over `groupCols` computes (n, s, ss)
  * with partial aggregation before the exchange; the flag rides the same
  * projection. No second pass, no join-back, no collect.
  *
  * For genuinely real-valued data (no meaningful fixed-point mapping) or
  * heavy-tailed groups where mean/σ themselves are dragged by the
  * outliers, [[robustOutliers]] is the companion: median/IQR fences from
  * the mergeable GK sketch — approximate (ε rank error) but
  * outlier-resistant, and the sketch aggregation keeps the same
  * one-scan-plus-tiny-join scale shape.
  */
object Anomaly {

  private val Exact = "decimal(38,0)"

  /** Rows of `df` whose `intVal` lies more than `k` population standard
    * deviations from its group mean — exactly. `intVal` MUST be
    * integral-valued (cast/floor fixed-point data first; see object doc).
    * Output: all `df` columns plus `grp_n` (group size) and `z` (the
    * conventional signed z-score, double, for human triage — the FLAG
    * never depends on it). Groups with zero variance flag nothing
    * (including n = 1, where the test is vacuous).
    */
  def zscoreOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      intVal: Column,
      k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
    val x = intVal.cast(Exact)
    val n = count(lit(1)).over(w).cast(Exact)
    val s = sum(x).over(w)
    val ss = sum(x * x).over(w)
    val dev = n * x - s            // n·(x − mean), scaled to integers
    val varTerm = n * ss - s * s   // n²·variance_pop, same scale²
    df.withColumn("grp_n", count(lit(1)).over(w))
      .withColumn("__dev", dev)
      .withColumn("__var", varTerm)
      .where(col("__dev") * col("__dev") > lit(k * k).cast(Exact) * col("__var"))
      // z = (x − mean)/sd_pop = dev/√varTerm — derived AFTER the exact
      // flag, doubles only here
      .withColumn("z",
        col("__dev").cast("double") / sqrt(col("__var").cast("double")))
      .drop("__dev", "__var")
  }

  /** Tukey-fence outliers on ROBUST statistics: rows outside
    * `[q1 − k·IQR, q3 + k·IQR]` of their group, with the quartiles from
    * the mergeable GK sketch (rank error ≤ relErr). Use over
    * [[zscoreOutliers]] when the column has no exact fixed-point
    * representation, or when the contamination itself would drag
    * mean/σ (a 1%-outlier heavy tail moves the mean; it cannot move the
    * quartiles). k = 1.5 is the conventional fence.
    *
    * Shape: one sketch aggregation over the data (map-side partial GK
    * buffers, the exchange carries O(groups × sketch)), the decoded
    * fences joined back broadcast (group-cardinality rows), and the flag
    * evaluated in the scan stage of a second pass. Two scans total —
    * the price of any rank-based fence; the sketch keeps pass one's
    * shuffle tiny where an exact percentile would shuffle the data.
    * Approximation contract: a value within relErr rank mass of the
    * fence can flip sides run-invariantly (the sketch is deterministic
    * for a given input order: same input, same flags).
    */
  def robustOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 1.5,
      relErr: Double = 0.01): DataFrame = {
    require(k > 0, "k must be positive")
    val fences = Profile.gkQuantiles(
      col("__gk"), Seq(0.25, 0.5, 0.75)) // q1, median, q3
    val grouped = df
      .groupBy(groupCols.map(col): _*)
      .agg(graft.operators.Profile.gkSketchCol(col(valueCol), relErr).as("__gk"))
      .select(
        groupCols.map(col) :+
          fences.getItem(0).as("__q1") :+
          fences.getItem(1).as("grp_median") :+
          fences.getItem(2).as("__q3"): _*)
    tukeyFlag(df, groupCols, valueCol, k, grouped)
  }

  /** EXACT twin of [[robustOutliers]]: Tukey fences from Spark's exact
    * interpolated `percentile` aggregate instead of the GK sketch —
    * deliberately a full per-group sort inside the aggregate, the
    * measuring stick, not the scale path (q62c gates it against DuckDB's
    * `quantile_cont`, whose interpolation is the same `lower +
    * frac·(upper−lower)` on the same IEEE doubles; the fence arithmetic
    * is mirrored expression-for-expression for the boundary decisions).
    */
  def robustOutliersExact(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(k > 0, "k must be positive")
    val grouped = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        percentile(col(valueCol), lit(0.25)).as("__q1"),
        percentile(col(valueCol), lit(0.5)).as("grp_median"),
        percentile(col(valueCol), lit(0.75)).as("__q3"))
    tukeyFlag(df, groupCols, valueCol, k, grouped)
  }

  /** Shared fence-and-flag tail of the two robust faces: `grouped` must
    * carry the group columns plus (__q1, grp_median, __q3).
    */
  private def tukeyFlag(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double,
      grouped: DataFrame): DataFrame = {
    val lo = col("__q1") - lit(k) * (col("__q3") - col("__q1"))
    val hi = col("__q3") + lit(k) * (col("__q3") - col("__q1"))
    // null-SAFE join back: the fences pass's groupBy keeps a null-key
    // group (like the window partitioning in zscoreOutliers), so the
    // join-back must too — a plain equi-join would silently drop every
    // null-keyed row, making the two outlier faces disagree on dirty data
    val fenced = grouped.select(
      groupCols.map(c => col(c).as(s"__g_$c")) :+
        col("__q1") :+ col("grp_median") :+ col("__q3"): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(fenced), cond)
      .where(col(valueCol) < lo || col(valueCol) > hi)
      .withColumn("grp_iqr", col("__q3") - col("__q1"))
      .drop(groupCols.map(c => s"__g_$c"): _*)
      .drop("__q1", "__q3")
  }
}
