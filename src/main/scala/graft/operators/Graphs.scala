package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph analysis over DataFrames — the operator class
  * BEYOND one-shot connected components ([[Dedup.duplicateClusters]]):
  * fixed-iteration Pregel-style message rounds expressed as join +
  * aggregate, the shape Spark executes well at graph scale.
  *
  * [[pageRankInt]] is FIXED-POINT INTEGER PageRank: ranks are scaled
  * longs, per-edge contributions use integer division, and the damping
  * step is integer arithmetic — so every round is EXACT and order-
  * independent (integer sums cannot reorder), which makes a 5-iteration
  * run reproducible bit-for-bit on any engine, any partitioning, any
  * retry. The float formulation would differ in the last ulp per
  * aggregation order; the integer one is the oracle-gateable face and
  * is accurate to ~1/scale per round, far below any ranking decision
  * anyone makes with PageRank. Use it for the web-curation authority
  * signal (host/domain rank as a quality weight) where reproducibility
  * is part of the data contract.
  */
object Graphs {

  /** `iters` rounds of damped PageRank over `edges` (srcCol → dstCol)
    * for every node in `nodes` (idCol), at fixed-point `scale`:
    *
    *   r₀(i)    = scale
    *   r₊(i)    = (15·scale)/100 + (85·Σ_{j→i} r(j) div outdeg(j))/100
    *
    * (integer division throughout; damping hard-wired to the canonical
    * 0.85). Dangling nodes (outdeg 0) leak their mass — the standard
    * simplification; nodes with no in-links settle at (15·scale)/100.
    *
    * Scale shape: `edges`+outdeg are computed once and pinned so each
    * round pays ONE join (rank → src) and ONE aggregate (sum by dst),
    * the minimal two exchanges a message round needs; ranks are a
    * 2-column frame, the narrowest possible shuffle payload. (The pin is
    * load-bearing: the rounds reference the prep frame `iters` times and
    * exchange reuse does NOT collapse them — measured round 12, 0
    * ReusedExchange nodes in the unpinned 5-round plan, i.e. the
    * edges+outdeg join would recompute per round.) Iterations are a
    * driver-side loop over lazy plans — nothing materializes until the
    * caller acts, and `iters` is small by contract (PageRank converges
    * in tens of rounds; the plan stays linear in `iters`).
    *
    * Pin lifetime: the returned frame references the pinned prep table
    * LAZILY, so this operator cannot release it before returning
    * (unlike [[Packing.writeEpochShards]], which consumes its own
    * frames). Pass `scope` and call `scope.release()` after fully
    * consuming the result — the pattern for long-lived sessions that
    * rank repeatedly; without it the pin lands in the calling thread's
    * active scope and lives until [[Caches.release]] drains it.
    */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: DataFrame,
      idCol: String,
      iters: Int,
      scale: Long = 1000000L,
      scope: Option[Caches.Scope] = None): DataFrame = {
    require(iters >= 1, "pageRankInt needs at least one iteration")
    require(scale >= 1000L, "scale under 1000 makes integer damping too lossy")
    val prep = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(
        edges.groupBy(col(srcCol).as("__osrc")).agg(count(lit(1)).as("__outdeg")),
        col("__src") === col("__osrc"))
      .select("__src", "__dst", "__outdeg")
    val e = scope.fold(Caches.pin(prep))(_.pin(prep))
    val ids = nodes.select(col(idCol).as("__id"))
    var rank = ids.select(col("__id"), lit(scale).as("__rank"))
    for (_ <- 1 to iters) {
      // `div`, not `/`: Column./ is DOUBLE division, which stops being
      // exact past 2^53 — integral div keeps every round exact at any
      // graph size, which is the whole point of the fixed-point face.
      val inbox = e
        .join(rank, col("__src") === col("__id"))
        .select(col("__dst"), expr("__rank div __outdeg").as("__contrib"))
        .groupBy(col("__dst"))
        .agg(sum("__contrib").as("__agg"))
      rank = ids
        .join(inbox, col("__id") === col("__dst"), "left")
        .select(
          col("__id"),
          (lit(15L * scale / 100L) +
            expr(s"(85 * coalesce(__agg, 0L)) div 100")).as("__rank"))
    }
    rank.select(col("__id").as(idCol), col("__rank").as("rank"))
  }
}
