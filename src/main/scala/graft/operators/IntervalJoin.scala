package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair every left interval `[lStart, lEnd)`
  * with every right interval `[rStart, rEnd)` they overlap — the
  * session-vs-outage, span-vs-annotation, read-vs-gene workload that
  * a naive formulation executes as a CARTESIAN product with a theta
  * filter (Spark plans `s1 < e2 AND s2 < e1` as
  * BroadcastNestedLoopJoin / CartesianProduct: O(|L|·|R|) at any
  * cluster size).
  *
  * The scale shape is the standard BINNING decomposition (the
  * genomics-engine / interval-tree-free plan): each interval explodes
  * to the fixed-width buckets it touches, the two sides EQUI-join on
  * the bucket id, and a residual predicate verifies true overlap.
  * Each overlapping pair is emitted EXACTLY ONCE — only from the
  * bucket containing `max(lStart, rStart)`, the first bucket the two
  * intervals share — so no distinct pass is needed afterwards.
  *
  * Cost contract: an interval spanning `n` buckets contributes `n`
  * exploded rows — pick `bucketWidth` near the median interval length
  * (row blowup ≈ len/width + 1, and buckets much smaller than
  * intervals multiply the shuffle; buckets much larger than intervals
  * degrade toward per-bucket mini-cartesians). Empty or inverted
  * intervals (`end <= start`) match nothing and are dropped at the
  * scan.
  */
object IntervalJoin {

  def overlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be positive, got $bucketWidth")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty,
      s"left and right column names must be disjoint (both have: ${dup.mkString(", ")})")
    // reserved working names: a caller column with one of these would be
    // silently clobbered by the bucket math (wrong buckets, then dropped)
    // — fail loudly instead, the truncateToBudget/urlDedupIngest rule
    val reserved = Seq("__graft_iv_s", "__graft_iv_e", "__graft_iv_g", "__bucket", "__rbucket")
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      val hit = df.columns.toSet.intersect(reserved.toSet)
      require(hit.isEmpty,
        s"$side input carries reserved IntervalJoin working column(s): ${hit.mkString(", ")}")
    }

    // Bucket math goes through sanitized projections so the `div`
    // expressions never re-parse caller-supplied names (names needing
    // backticks — dots, spaces, hyphens — would fail to parse or
    // resolve to the wrong attribute inside an expr() string).
    def binned(df: DataFrame, s: String, e: String, bucketName: String): DataFrame = {
      df.withColumn("__graft_iv_s", col(s).cast("long"))
        .withColumn("__graft_iv_e", col(e).cast("long"))
        .where(col("__graft_iv_e") > col("__graft_iv_s"))
        .withColumn(bucketName,
          explode(sequence(
            expr(s"__graft_iv_s div ${bucketWidth}L"),
            expr(s"(__graft_iv_e - 1L) div ${bucketWidth}L"))))
        .drop("__graft_iv_s", "__graft_iv_e")
    }

    val l = binned(left, lStart, lEnd, "__bucket")
    val r = binned(right, rStart, rEnd, "__rbucket")
    val ls = col(lStart).cast("long")
    val le = col(lEnd).cast("long")
    val rs = col(rStart).cast("long")
    val re = col(rEnd).cast("long")
    l.join(r, col("__bucket") === col("__rbucket"))
      .where(ls < re && rs < le)
      // first-shared-bucket guard: emit each pair exactly once
      .withColumn("__graft_iv_g", greatest(ls, rs))
      .where(col("__bucket") === expr(s"__graft_iv_g div ${bucketWidth}L"))
      .drop("__bucket", "__rbucket", "__graft_iv_g")
  }
}
