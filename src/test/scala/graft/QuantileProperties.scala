package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.expressions.{GkMergeAgg, GkQuantileAgg}
import graft.operators.Profile

/** Greenwald–Khanna sketch laws over random data, epsilon, shard counts,
  * and probabilities — the generalization of ProfileSpec's fixed cases:
  *
  *   single sketch   rank(answer) within eps·n of p·n,
  *   sharded merge   within (eps + eps)·n, count preserved exactly,
  *   grouping        any shard arrangement yields the same count and a
  *                   bound-respecting answer (semigroup, not just a pair).
  *
  * Duplicates are deliberately dense (values drawn from a small range) —
  * rank queries over ties are where quantile code goes wrong.
  */
object QuantileProperties extends Properties("graft.gk_sketch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gk(c: Column, eps: Double): Column =
    ColumnBridge.column(
      GkQuantileAgg(ColumnBridge.eagerExpression(c), eps).toAggregateExpression())

  private def gkMerge(c: Column): Column =
    ColumnBridge.column(
      GkMergeAgg(ColumnBridge.eagerExpression(c)).toAggregateExpression())

  private val genValues: Gen[List[Double]] = for {
    n <- Gen.choose(200, 2000)
    vs <- Gen.listOfN(n, Gen.choose(-300, 300).map(_.toDouble))
  } yield vs

  private val genEps: Gen[Double] = Gen.choose(5, 80).map(_ / 1000.0)
  private val genShards: Gen[Int] = Gen.choose(1, 8)
  private val genP: Gen[Double] = Gen.choose(0, 100).map(_ / 100.0)

  private def rankOk(sorted: Array[Double], v: Double, p: Double, eps: Double): Boolean = {
    val n = sorted.length
    val target = p * n
    val slack = eps * n + 1
    sorted.count(_ < v) <= target + slack && sorted.count(_ <= v) >= target - slack
  }

  property("single sketch: quantile within eps*n ranks (ties included)") =
    forAll(genValues, genEps, genP) { (vs, eps, p) =>
      val sketch = vs.toDF("v").repartition(4).agg(gk(col("v"), eps).as("qs"))
      val v = sketch.select(Profile.gkQuantiles(col("qs"), Seq(p)).getItem(0)).head().getDouble(0)
      rankOk(vs.toArray.sorted, v, p, eps)
    }

  property("sharded merge: count exact, quantile within 2*eps*n ranks") =
    forAll(genValues, genEps, genShards, genP) { (vs, eps, shards, p) =>
      val df = vs.zipWithIndex.toDF("v", "i")
      val merged = df.groupBy(pmod(col("i"), lit(shards)).as("s"))
        .agg(gk(col("v"), eps).as("qs"))
        .agg(gkMerge(col("qs")).as("qs"))
      val row = merged.select(
        col("qs.count"),
        Profile.gkQuantiles(col("qs"), Seq(p)).getItem(0)).head()
      row.getLong(0) == vs.size.toLong &&
        rankOk(vs.toArray.sorted, row.getDouble(1), p, 2 * eps)
    }

  property("grouping invariance: pairwise re-merge preserves count and the bound") =
    forAll(genValues, genEps, genP) { (vs, eps, p) =>
      val df = vs.zipWithIndex.toDF("v", "i")
      val shardRows = df.groupBy(pmod(col("i"), lit(6)).as("s"))
        .agg(gk(col("v"), eps).as("qs"))
      val lo = shardRows.where(col("s") < 3).agg(gkMerge(col("qs")).as("qs"))
      val hi = shardRows.where(col("s") >= 3).agg(gkMerge(col("qs")).as("qs"))
      val row = lo.unionByName(hi).agg(gkMerge(col("qs")).as("qs"))
        .select(col("qs.count"), Profile.gkQuantiles(col("qs"), Seq(p)).getItem(0))
        .head()
      row.getLong(0) == vs.size.toLong &&
        rankOk(vs.toArray.sorted, row.getDouble(1), p, 2 * eps)
    }
}
