package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Group "a": nine 10s and one 100 — the 100 is far outside 3σ.
  // Group "b": uniform-ish 1..10 — nothing beyond 3σ.
  private val df = (
    (1 to 9).map(i => (i.toLong, "a", 10L)) ++
    Seq((10L, "a", 100L)) ++
    (11 to 20).map(i => (i.toLong, "b", (i - 10).toLong))
  ).toDF("id", "grp", "v")

  private def flagged(k: Int) =
    Anomaly.zscoreOutliers(df, Seq("grp"), col("v"), k)
      .select("id").as[Long].collect().toSet

  test("flags the planted spike and nothing in the tame group") {
    assert(flagged(2) === Set(10L))
  }

  test("a point at exactly k sigma is NOT an outlier (strict inequality, exactly decided)") {
    // group a: mean 19, sd_pop 27, spike deviation 81 = 3σ on the nose —
    // a float z-score would flip on rounding; the integer form decides
    // 656100 > 656100 exactly false
    val vs = Seq.fill(9)(10.0) :+ 100.0
    val mean = vs.sum / vs.size
    val z = (100.0 - mean) / math.sqrt(vs.map(x => (x - mean) * (x - mean)).sum / vs.size)
    assert(z === 3.0)
    assert(flagged(3) === Set.empty)
  }

  test("zero-variance groups flag nothing (strict inequality)") {
    val const = Seq((1L, "c", 5L), (2L, "c", 5L), (3L, "c", 5L)).toDF("id", "grp", "v")
    assert(Anomaly.zscoreOutliers(const, Seq("grp"), col("v"), 1).isEmpty)
  }

  test("singleton groups flag nothing") {
    val one = Seq((1L, "s", 42L)).toDF("id", "grp", "v")
    assert(Anomaly.zscoreOutliers(one, Seq("grp"), col("v"), 1).isEmpty)
  }

  test("z column reports the conventional signed score") {
    val r = Anomaly.zscoreOutliers(df, Seq("grp"), col("v"), 2).head()
    val vs = Seq.fill(9)(10.0) :+ 100.0
    val mean = vs.sum / vs.size
    val sd = math.sqrt(vs.map(x => (x - mean) * (x - mean)).sum / vs.size)
    assert(math.abs(r.getAs[Double]("z") - (100.0 - mean) / sd) < 1e-9)
    assert(r.getAs[Long]("grp_n") === 10L)
  }

  test("result is independent of partitioning (exact integer moments)") {
    val a = Anomaly.zscoreOutliers(df.repartition(1), Seq("grp"), col("v"), 2)
      .select("id").as[Long].collect().toSet
    val b = Anomaly.zscoreOutliers(df.repartition(7, col("id")), Seq("grp"), col("v"), 2)
      .select("id").as[Long].collect().toSet
    assert(a === b && a === Set(10L))
  }

  test("robustOutliers: Tukey fences flag a heavy tail the bulk never triggers") {
    // 200 bulk values 0..199 and five 10^6 spikes in group "a"
    val data = ((1 to 200).map(i => (i.toLong, "a", (i - 1).toDouble)) ++
      (201 to 205).map(i => (i.toLong, "a", 1e6))).toDF("id", "grp", "v")
    val got = graft.operators.Anomaly.robustOutliers(data, Seq("grp"), "v")
      .select("id").as[Long].collect().toSet
    assert(got === (201L to 205L).toSet)
  }

  test("robustOutliersExact flags the same heavy tail; sketch face agrees at easy margins") {
    val data = ((1 to 200).map(i => (i.toLong, "a", (i - 1).toDouble)) ++
      (201 to 205).map(i => (i.toLong, "a", 1e6))).toDF("id", "grp", "v")
    val exact = graft.operators.Anomaly.robustOutliersExact(data, Seq("grp"), "v")
      .select("id").as[Long].collect().toSet
    assert(exact === (201L to 205L).toSet)
    // on fences this far from the data, the sketch's rank error cannot
    // flip any decision — the two faces agree outright
    val sketch = graft.operators.Anomaly.robustOutliers(data, Seq("grp"), "v")
      .select("id").as[Long].collect().toSet
    assert(sketch === exact)
    // exact percentile lands on the true order statistic: position
    // 0.5·(205−1) = 102 → sorted value 102.0 (the interpolation contract
    // the q62c oracle mirrors with quantile_cont)
    val med = graft.operators.Anomaly.robustOutliersExact(data, Seq("grp"), "v")
      .select("grp_median").as[Double].head()
    assert(med === 102.0)
  }

  test("robustOutliers resists contamination that drags the mean-based test") {
    // 10% contamination at 10^6: the spikes inflate sd so much that a
    // moderate 4-sigma-looking point (5e4) hides from the z-test, but it
    // is far outside the quartile fence, which contamination cannot move
    val data = ((1 to 100).map(i => (i.toLong, "a", (i % 50).toDouble)) ++
      (101 to 110).map(i => (i.toLong, "a", 1e6)) :+
      ((111L, "a", 5e4))).toDF("id", "grp", "v")
    val robust = graft.operators.Anomaly.robustOutliers(data, Seq("grp"), "v")
      .select("id").as[Long].collect().toSet
    assert(robust.contains(111L), "the moderate outlier must be outside the fence")
    assert((101L to 110L).forall(robust.contains))
    assert(robust.forall(_ >= 101L), "bulk rows stay unflagged")
    // the z-test at the same data: sd ≈ 2.9e5 puts 5e4 well inside 3σ
    val z = graft.operators.Anomaly.zscoreOutliers(
      data, Seq("grp"), col("v").cast("long"), 3)
      .select("id").as[Long].collect().toSet
    assert(!z.contains(111L), "sanity: contamination hides 5e4 from the mean-based test")
  }

  test("robustOutliers reports group median and IQR alongside the row") {
    val data = (1 to 101).map(i => (i.toLong, "a", (i - 1).toDouble))
      .toDF("id", "grp", "v")
      .unionByName(Seq((200L, "a", 1e5)).toDF("id", "grp", "v"))
    val r = graft.operators.Anomaly.robustOutliers(data, Seq("grp"), "v").head()
    assert(r.getAs[Long]("id") === 200L)
    // 102 values: median ≈ 50, IQR ≈ 50 (± sketch rank error of ~1 rank)
    assert(math.abs(r.getAs[Double]("grp_median") - 50.0) <= 2.0)
    assert(math.abs(r.getAs[Double]("grp_iqr") - 50.0) <= 4.0)
  }

  test("null-keyed groups: both outlier faces keep them (consistent contract)") {
    // zscore keeps a null partition via the window; robustOutliers must
    // not silently drop it at the join-back
    val dirty = (
      (1 to 9).map(i => (i.toLong, Option.empty[String], 10L)) ++
      Seq((10L, Option.empty[String], 100L)) ++
      (11 to 20).map(i => (i.toLong, Some("b"), (i - 10).toLong))
    ).toDF("id", "grp", "v")
    val z = Anomaly.zscoreOutliers(dirty, Seq("grp"), col("v"), 2)
      .select("id").as[Long].collect().toSet
    assert(z === Set(10L), "zscore flags inside the null group")
    val robustDirty = (
      (1 to 101).map(i => (i.toLong, Option.empty[String], (i - 1).toDouble)) ++
      Seq((200L, Option.empty[String], 1e5))
    ).toDF("id", "grp", "v")
    val r = graft.operators.Anomaly.robustOutliers(robustDirty, Seq("grp"), "v")
      .select("id").as[Long].collect().toSet
    assert(r === Set(200L), "robust fences must keep the null group too")
  }

  test("one exchange: the window is the only shuffle") {
    val plan = Anomaly.zscoreOutliers(df, Seq("grp"), col("v"), 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle:\n$plan")
  }
}
