package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Incremental sketch-profile laws: merged shard profiles must agree with
  * the direct whole-frame profile — exactly for the algebraic fields,
  * within the published error bounds for the sketch fields — and the
  * profile rows must survive the parquet store round-trip that the
  * incremental ("sketch each shard once, merge later") shape depends on.
  */
class ProfileSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Skewed values with planted nulls: id² mod a prime, nulls every 37th. */
  private def vals(n: Int): DataFrame =
    spark.range(n).select(
      col("id"),
      when(col("id") % 37 === 0, lit(null))
        .otherwise((col("id") * col("id")) % 104729).cast("double").as("v"))

  private val relErr = 0.01

  /** GK rank guarantee for a value returned at probability p over `sorted`:
    * some rank the value occupies lies within eps·n of the target rank.
    */
  private def assertRankWithin(
      sorted: Array[Double], v: Double, p: Double, eps: Double, what: String): Unit = {
    val n = sorted.length
    val target = p * n
    val minRank = sorted.count(_ < v)       // first rank v could occupy
    val maxRank = sorted.count(_ <= v)      // last rank v could occupy
    val slack = eps * n + 1
    assert(minRank <= target + slack && maxRank >= target - slack,
      s"$what: value $v at p=$p has ranks [$minRank,$maxRank], target $target ± $slack")
  }

  test("merged shard profiles equal the direct profile on the exact fields") {
    val df = vals(20000)
    val merged = Profile.mergeProfiles(
      Profile.shardProfiles(df, pmod(col("id"), lit(7)), col("v"), col("v"), relErr))
    val r = merged.head()
    val exact = df.agg(
      count(lit(1)), sum(when(col("v").isNull, 1L).otherwise(0L)),
      min("v"), max("v")).head()
    assert(r.getAs[Long]("row_count") === exact.getLong(0))
    assert(r.getAs[Long]("null_count") === exact.getLong(1))
    assert(r.getAs[Double]("min_value") === exact.getDouble(2))
    assert(r.getAs[Double]("max_value") === exact.getDouble(3))
  }

  test("single-frame GK sketch answers quantiles within the eps rank bound") {
    val df = vals(50000)
    val report = Profile.profileReport(
      Profile.mergeProfiles(
        Profile.shardProfiles(df, lit(0), col("v"), col("v"), relErr)),
      Seq(0.1, 0.5, 0.9, 0.99))
    val r = report.head()
    val sorted = df.where(col("v").isNotNull).select("v").as[Double].collect().sorted
    Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, p) =>
      assertRankWithin(sorted, r.getAs[Double](c), p, relErr, s"single-sketch $c")
    }
  }

  test("merging shard sketches stays within the additive (eps_a + eps_b) bound") {
    val df = vals(50000)
    val report = Profile.profileReport(
      Profile.mergeProfiles(
        Profile.shardProfiles(df, pmod(col("id"), lit(13)), col("v"), col("v"), relErr)),
      Seq(0.5, 0.9, 0.99))
    val r = report.head()
    val sorted = df.where(col("v").isNotNull).select("v").as[Double].collect().sorted
    Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, p) =>
      assertRankWithin(sorted, r.getAs[Double](c), p, 2 * relErr, s"merged-sketch $c")
    }
  }

  test("HLL distinct estimate lands within the lgK error band of exact") {
    val df = vals(30000)
    val r = Profile.profileReport(
      Profile.mergeProfiles(
        Profile.shardProfiles(df, pmod(col("id"), lit(5)), col("v"), col("id"), relErr))).head()
    val exact = 30000.0 // id is unique
    val est = r.getAs[Long]("distinct_est").toDouble
    assert(math.abs(est - exact) / exact < 0.05,
      s"HLL estimate $est vs exact $exact beyond 5% (lgK=12 stderr ~1.6%)")
  }

  test("profile store round-trip: persist shard rows, append a later batch, merge the union") {
    val store = Files.createTempDirectory("graft-profile-store").toString
    val day1 = vals(8000).where(col("id") < 5000)
    val day2 = vals(8000).where(col("id") >= 5000)
    Profile.shardProfiles(day1, pmod(col("id"), lit(3)), col("v"), col("id"), relErr)
      .write.mode("overwrite").parquet(store)
    Profile.shardProfiles(day2, pmod(col("id"), lit(3)) + 100, col("v"), col("id"), relErr)
      .write.mode("append").parquet(store)
    val merged = Profile.mergeProfiles(spark.read.parquet(store))
    val r = Profile.profileReport(merged, Seq(0.5)).head()
    assert(r.getAs[Long]("row_count") === 8000L)
    assert(r.getAs[Long]("null_count") === vals(8000).where(col("v").isNull).count())
    val sorted = vals(8000).where(col("v").isNotNull).select("v").as[Double].collect().sorted
    assertRankWithin(sorted, r.getAs[Double]("p50"), 0.5, 2 * relErr, "store round-trip p50")
  }

  test("rollups compose: merge-of-merges agrees with one-shot merge") {
    val df = vals(12000)
    val shards = Profile.shardProfiles(df, pmod(col("id"), lit(6)), col("v"), col("id"), relErr)
    val oneShot = Profile.mergeProfiles(shards).head()
    val lo = Profile.mergeProfiles(shards.where(col("shard") < 3))
    val hi = Profile.mergeProfiles(shards.where(col("shard") >= 3))
    val reMerged = Profile.mergeProfiles(lo.unionByName(hi)).head()
    assert(reMerged.getAs[Long]("row_count") === oneShot.getAs[Long]("row_count"))
    assert(reMerged.getAs[Long]("null_count") === oneShot.getAs[Long]("null_count"))
    assert(reMerged.getAs[Double]("min_value") === oneShot.getAs[Double]("min_value"))
    assert(reMerged.getAs[Double]("max_value") === oneShot.getAs[Double]("max_value"))
    val sorted = df.where(col("v").isNotNull).select("v").as[Double].collect().sorted
    val p50 = Profile.profileReport(Profile.mergeProfiles(lo.unionByName(hi)), Seq(0.5))
      .head().getAs[Double]("p50")
    assertRankWithin(sorted, p50, 0.5, 2 * relErr, "rollup-composed p50")
  }

  test("empty and all-null inputs: zero counts, null quantiles, merge-neutral") {
    val empty = spark.range(0).select(col("id"), col("id").cast("double").as("v"))
    val rEmpty = Profile.profileReport(
      Profile.mergeProfiles(
        Profile.shardProfiles(empty, lit(0), col("v"), col("v"), relErr)),
      Seq(0.5)).collect()
    // groupBy of an empty frame has no groups; the merge of no rows still
    // yields one defined summary row with count 0 and a null quantile
    assert(rEmpty.length === 1)
    assert(rEmpty.head.getAs[Long]("row_count") === 0L)
    assert(rEmpty.head.isNullAt(rEmpty.head.fieldIndex("p50")))

    val allNull = spark.range(100).select(col("id"), lit(null).cast("double").as("v"))
    val r = Profile.profileReport(
      Profile.mergeProfiles(
        Profile.shardProfiles(allNull, pmod(col("id"), lit(4)), col("v"), col("v"), relErr)),
      Seq(0.5)).head()
    assert(r.getAs[Long]("row_count") === 100L)
    assert(r.getAs[Long]("null_count") === 100L)
    assert(r.isNullAt(r.fieldIndex("min_value")))
    assert(r.isNullAt(r.fieldIndex("p50")))
  }

  test("the GK family is callable end-to-end from SQL") {
    graft.expressions.GraftFunctions.register(spark)
    spark.range(10001).select(col("id").cast("double").as("v"), pmod(col("id"), lit(4)).as("s"))
      .createOrReplaceTempView("gk_sql_vals")
    val out = spark.sql("""
      WITH shard_sketches AS (
        SELECT s, graft_gk_sketch(v, 0.01D) AS qs FROM gk_sql_vals GROUP BY s
      )
      SELECT graft_gk_quantiles(graft_gk_merge(qs), array(0.5D, 0.99D)) AS q
      FROM shard_sketches""").head()
    val q = out.getSeq[Double](0)
    // ids 0..10000: p50 within 2*eps*n = 200 ranks of 5000
    assert(math.abs(q.head - 5000.0) <= 2 * 0.01 * 10001 + 1, s"SQL p50 = ${q.head}")
    assert(math.abs(q(1) - 9900.0) <= 2 * 0.01 * 10001 + 1, s"SQL p99 = ${q(1)}")
  }

  test("the GK aggregate composes with Structured Streaming (cross-batch quantiles, bounded state)") {
    // Streaming percentile monitoring: per-batch partials merge through
    // the same TypedImperativeAggregate buffer the batch path uses, so
    // state stays O(1/eps · log(eps·n)) — never the values themselves —
    // and the answer after two micro-batches must honor the GK rank
    // bound over the UNION of everything seen.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.expressions.GraftFunctions.register(spark)
    val input = MemoryStream[Double]
    val query = input.toDF().toDF("v")
      .selectExpr("graft_gk_quantiles(graft_gk_sketch(v, 0.01D), array(0.5D, 0.9D)) AS q")
      .writeStream.format("memory").queryName("gk_stream").outputMode("complete").start()
    try {
      val batch1 = (0 until 5000).map(_.toDouble)
      val batch2 = (5000 until 20000).map(_.toDouble)
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val q = spark.table("gk_stream").head().getSeq[Double](0)
      val sorted = (batch1 ++ batch2).sorted.toArray
      assertRankWithin(sorted, q.head, 0.5, 2 * relErr, "streaming p50")
      assertRankWithin(sorted, q(1), 0.9, 2 * relErr, "streaming p90")
    } finally query.stop()
  }

  test("q50's decoded sketch report brackets q50c's exact answers at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val sketch = Queries.q50ProfileSketch.fn(spark, dir).head()
    val exact = Queries.q50cProfileExact.fn(spark, dir).head()
    assert(sketch.getAs[Long]("row_count") === exact.getAs[Long]("row_count"))
    assert(sketch.getAs[Long]("null_count") === exact.getAs[Long]("null_count"))
    assert(sketch.getAs[Double]("min_value") === exact.getAs[Double]("min_value"))
    assert(sketch.getAs[Double]("max_value") === exact.getAs[Double]("max_value"))
    val n = exact.getAs[Long]("row_count").toDouble
    val distinctExact = exact.getAs[Long]("distinct_orders").toDouble
    assert(math.abs(sketch.getAs[Long]("distinct_est") - distinctExact) / distinctExact < 0.05)
    // quantiles: merged sketches of 8 shards at eps=0.01 → 2% rank bound;
    // translate to a value-tolerance via the exact neighbours would need the
    // full sort, so just assert the sketch answer sits inside [min, max] and
    // is ordered — the rank-law tests above carry the precision claim
    val (p50, p90, p99) = (sketch.getAs[Double]("p50"),
      sketch.getAs[Double]("p90"), sketch.getAs[Double]("p99"))
    assert(p50 <= p90 && p90 <= p99)
    assert(p50 >= sketch.getAs[Double]("min_value") && p99 <= sketch.getAs[Double]("max_value"))
    assert(n > 0)
  }
}
