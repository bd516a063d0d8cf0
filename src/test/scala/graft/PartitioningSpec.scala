package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Partitioning

class PartitioningSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("runningSum equals the single-window form without its SinglePartition exchange") {
    val df = spark.range(100000).select(col("id"), (col("id") % 7 + 1).as("v"))
    val fast = Partitioning.runningSum(df, "id", "v", "rt", numPartitions = 16)
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val slow = df.withColumn("rt", sum(col("v")).over(w))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "two-phase prefix sum must reproduce the global window exactly")
    val p = fast.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"the whole point: no single-partition window in the plan:\n$p")
    val pSlow = slow.queryExecution.executedPlan.toString
    assert(pSlow.contains("Exchange SinglePartition"),
      "sanity: the naive form really does degenerate to one partition")
  }

  test("runningSum with duplicate order keys: ROWS semantics, exact even when ties straddle partition boundaries") {
    // 100k rows over only 50 distinct order values and 16 range partitions:
    // every boundary necessarily splits a tie group
    val df = spark.range(100000).select((col("id") % 50).as("k"), lit(1L).as("v"))
    val out = Partitioning.runningSum(df, "k", "v", "rt", numPartitions = 16)
    // ROWS semantics: per order key the running totals are a contiguous
    // integer range ending at the peers-inclusive (RANGE) total
    val perKey = out.groupBy("k")
      .agg(min("rt").as("lo"), max("rt").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n"))))
      .toMap
    (0L until 50L).foreach { k =>
      val (lo, hi, n) = perKey(k)
      assert(n == 2000)
      assert(hi == (k + 1) * 2000, s"k=$k: max running total must equal the RANGE-frame total")
      assert(lo == k * 2000 + 1, s"k=$k: ROWS accumulation starts right after the previous key")
    }
    // totals are a permutation-free sequence: distinct count == row count
    assert(out.select("rt").distinct().count() == 100000)
  }

  test("runningSum rejects non-integral value columns (float prefix sums are order-dependent)") {
    val df = spark.range(10).select(col("id"), col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      Partitioning.runningSum(df, "id", "v")
    }
  }

  test("hashSplit: deterministic, complete, group-coherent, proportional") {
    val w = Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)
    // rows carry a GROUP key (domain): every row of a domain must co-assign
    val rows = spark.range(20000).select(
      col("id"), (col("id") % 3000).cast("string").as("domain"))
    val split = Partitioning.hashSplit(rows, "domain", w)

    // deterministic: same assignment on a different partitioning / rerun
    val a = split.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Partitioning.hashSplit(rows.repartition(13), "domain", w)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must be a pure function of the key")

    // complete: every row assigned one of the declared names
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")) && a.size == 20000)

    // group-coherent: one split per domain (the leakage guarantee)
    val perDomain = split.groupBy("domain").agg(countDistinct("split").as("k"))
      .where(col("k") =!= 1).count()
    assert(perDomain == 0, "all rows of a key must land in one split")

    // proportional within sampling tolerance (3000 domains, 80/10/10)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 16000.0) / 20000.0 < 0.05, counts.toString)
    assert(counts("val") > 1000 && counts("test") > 1000, counts.toString)

    // a different seed is an independent deterministic reshuffle
    val c = Partitioning.hashSplit(rows, "domain", w, seed = 7)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c != a, "new seed must produce a different assignment")
    assert(c == Partitioning.hashSplit(rows, "domain", w, seed = 7)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("hashSample: deterministic, nested fractions, filter reaches the scan stage") {
    val rows = spark.range(10000).select(col("id").cast("string").as("k"))
    val half = Partitioning.hashSample(rows, "k", 0.5)
      .collect().map(_.getString(0)).toSet
    val third = Partitioning.hashSample(rows, "k", 0.3)
      .collect().map(_.getString(0)).toSet
    assert(math.abs(half.size - 5000.0) / 10000.0 < 0.03)
    assert(third.subsetOf(half), "smaller fraction must keep a subset (nested sampling)")
    // reproducible
    assert(Partitioning.hashSample(rows.repartition(9), "k", 0.5)
      .collect().map(_.getString(0)).toSet == half)
    // no shuffle introduced
    val p = Partitioning.hashSample(rows, "k", 0.5).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  test("hashUniform is strictly [0, 1) at the hash boundaries — fraction 1.0 keeps every key") {
    // The 63-bit form ((h >>> 1).toDouble / Long.MaxValue) maps raw hashes
    // −1024..−1 to exactly 1.0 (numerator rounds up to 2^63; the divisor IS
    // 2^63 as a double), so hashSample(_, _, 1.0) silently dropped those
    // keys. xxhash64 preimages for specific outputs aren't findable, so
    // drive the boundary hashes straight through uniformFromHash.
    val edges = Seq(-1L, -2L, -512L, -1024L, -1025L, Long.MinValue, Long.MaxValue, 0L, 1L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(edges.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType))))
    val us = df.select(Partitioning.uniformFromHash(col("h")).as("u"))
      .collect().map(_.getDouble(0))
    us.foreach(u => assert(u >= 0.0 && u < 1.0, s"uniform out of [0,1): $u"))
    // the worst case really is the max representable below 1.0
    assert(us.max == (math.pow(2, 53) - 1) / math.pow(2, 53))

    // end-to-end: fraction = 1.0 keeps EVERY row, including negative-hash keys
    val rows = spark.range(20000).select(col("id").cast("string").as("k"))
    val negHash = rows.where(xxhash64(col("k"), lit(42)) < 0)
    assert(negHash.count() > 0, "sanity: some keys hash negative")
    assert(Partitioning.hashSample(rows, "k", 1.0).count() == 20000,
      "fraction = 1.0 must be the identity")
    // and fraction 0.0 keeps nothing
    assert(Partitioning.hashSample(rows, "k", 0.0).count() == 0)
  }

  test("stratifiedSample: per-stratum fractions, deterministic, nested, zero shuffle") {
    val rows = spark.range(30000).select(
      col("id").cast("string").as("k"),
      when(col("id") % 3 === 0, "web").when(col("id") % 3 === 1, "books")
        .otherwise("code").as("domain"))
    val sampled = Partitioning.stratifiedSample(
      rows, "domain", "k", Map("web" -> 0.2, "books" -> 0.8))
    val counts = sampled.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~10k per stratum in: web ≈ 2k out, books ≈ 8k out, code untouched
    assert(math.abs(counts("web") - 2000.0) / 10000.0 < 0.03)
    assert(math.abs(counts("books") - 8000.0) / 10000.0 < 0.03)
    assert(counts("code") === 10000L, "default fraction 1.0 passes a stratum through")
    // deterministic under repartitioning
    val again = Partitioning.stratifiedSample(
      rows.repartition(11), "domain", "k", Map("web" -> 0.2, "books" -> 0.8))
    assert(again.collect().map(_.getString(0)).toSet ===
      sampled.collect().map(_.getString(0)).toSet)
    // tuning one stratum down keeps a subset of its keys (nested property)
    val webTuned = Partitioning.stratifiedSample(
      rows, "domain", "k", Map("web" -> 0.1, "books" -> 0.8))
      .where(col("domain") === "web").collect().map(_.getString(0)).toSet
    val webBefore = sampled.where(col("domain") === "web")
      .collect().map(_.getString(0)).toSet
    assert(webTuned.subsetOf(webBefore))
    // still a pure filter — no exchange
    val p = sampled.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"stratified sampling must not shuffle:\n$p")
  }

  test("sampleNPerKey: caps each group, reproducible, nested as n grows") {
    val rows = spark.range(10000).select(
      (col("id") % 10).cast("string").as("grp"),
      col("id").cast("string").as("doc"))
    val s3 = Partitioning.sampleNPerKey(rows, "grp", "doc", 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s3.size === 30)
    assert(s3.groupBy(_._1).forall(_._2.size == 3))
    // deterministic under a different physical layout
    val again = Partitioning.sampleNPerKey(rows.repartition(13), "grp", "doc", 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(again === s3)
    // nested: the 3-sample is a prefix of the 5-sample per key
    val s5 = Partitioning.sampleNPerKey(rows, "grp", "doc", 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s3.subsetOf(s5))
    // a fresh seed is an independent draw
    val reseeded = Partitioning.sampleNPerKey(rows, "grp", "doc", 3, seed = 7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(reseeded !== s3)
    // the cap rides the bounded-heap native plan, never a ranking window
    // or a full per-group sort (q96's 100 TB shape)
    val p = Partitioning.sampleNPerKey(rows, "grp", "doc", 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"expected the native bounded-heap exec:\n$p")
    assert(!p.contains("Window"), s"a ranking window would sort every group:\n$p")
  }

  test("clusterBalancedSample: argmin assignment, per-cluster cap, bounded-heap plan") {
    // 3 explicit centroids on orthogonal axes; 300 points jittered around them
    val cents = Array(
      Array(1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val pts = spark.range(300).select(
      col("id"),
      array(
        when(col("id") % 3 === 0, lit(1.0f)).otherwise(lit(0.01f) * (col("id") % 7).cast("float")),
        when(col("id") % 3 === 1, lit(1.0f)).otherwise(lit(0.02f) * (col("id") % 5).cast("float")),
        when(col("id") % 3 === 2, lit(1.0f)).otherwise(lit(0.03f) * (col("id") % 4).cast("float")))
        .as("vec"))
    val out = Partitioning.clusterBalancedSample(pts, "id", "vec", cents, n = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("cluster")))
    // every row assigned to its planted axis; exactly 10 kept per cluster
    assert(out.forall { case (id, c) => c == (id % 3).toInt },
      "nearest-centroid assignment must recover the planted clusters")
    assert(out.groupBy(_._2).forall(_._2.length == 10) && out.length == 30)
    // deterministic under a different physical layout
    val again = Partitioning.clusterBalancedSample(pts.repartition(7), "id", "vec", cents, n = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("cluster")))
    assert(again.toSet === out.toSet)
    // assignment is a pure projection; the cap rides the bounded-heap plan
    val p = Partitioning.clusterBalancedSample(pts, "id", "vec", cents, n = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"expected the native bounded-heap exec:\n$p")
    assert(!p.contains("Window"), s"a ranking window would sort every cluster:\n$p")
    // a pre-existing label column fails LOUDLY instead of being clobbered;
    // cellCol keeps both
    val labeled = pts.withColumn("cluster", lit(99))
    intercept[IllegalArgumentException] {
      Partitioning.clusterBalancedSample(labeled, "id", "vec", cents, n = 10)
    }
    val kept = Partitioning.clusterBalancedSample(labeled, "id", "vec", cents, n = 10,
      cellCol = "cell")
      .collect()
    assert(kept.forall(r => r.getAs[Int]("cluster") == 99 && r.getAs[Int]("cell") >= 0))
  }

  test("hashSplit stays a pure projection — no exchange in the plan") {
    val rows = spark.range(100).select(col("id").cast("string").as("k"))
    val p = Partitioning.hashSplit(rows, "k", Seq("a" -> 1.0, "b" -> 1.0))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"splitting must not shuffle:\n$p")
  }

  test("weightedSample: deterministic, weight-monotone inclusion, invalid weights excluded") {
    val base = (1L to 20L).map(i => (i, if (i == 7L) 50.0 else 1.0))
    val df = base.toDF("id", "w")
    val a = Partitioning.weightedSample(df, "id", "w", n = 5, seed = 1)
      .select("id").as[Long].collect().toSet
    val b = Partitioning.weightedSample(df.repartition(7), "id", "w", n = 5, seed = 1)
      .select("id").as[Long].collect().toSet
    assert(a === b, "the draw must be a pure function of (id, seed)")
    // inclusion frequency across seeds: the w=50 item nearly always wins a
    // slot; any fixed w=1 item competes uniformly for the rest
    val seeds = 0 until 100
    val hits = seeds.map { s =>
      Partitioning.weightedSample(df, "id", "w", n = 5, seed = s)
        .select("id").as[Long].collect().toSet
    }
    val heavyRate = hits.count(_.contains(7L)) / 100.0
    val lightRate = hits.count(_.contains(3L)) / 100.0
    assert(heavyRate >= 0.95, s"w=50 item included only ${heavyRate * 100}% of draws")
    assert(lightRate <= 0.6, s"w=1 item included ${lightRate * 100}% of draws")
    // null / zero / negative weights are excluded, never crash or win
    val dirty = Seq((100L, null.asInstanceOf[java.lang.Double]), (101L, java.lang.Double.valueOf(0.0)),
      (102L, java.lang.Double.valueOf(-3.0)), (103L, java.lang.Double.valueOf(1.0)))
      .toDF("id", "w")
    val kept = Partitioning.weightedSample(dirty, "id", "w", n = 10, seed = 1)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(103L))
  }

  test("weightedSample perKey: per-stratum quotas through the bounded-heap plan") {
    val df = (1L to 60L).map(i => (i, if (i <= 30L) "a" else "b", 1.0 + (i % 3)))
      .toDF("id", "src", "w")
    val out = Partitioning.weightedSample(df, "id", "w", n = 4, seed = 2, perKey = Seq("src"))
      .select("src", "id").as[(String, Long)].collect()
    assert(out.count(_._1 == "a") === 4 && out.count(_._1 == "b") === 4)
    // global form rides TakeOrderedAndProject, not a full sort
    val plan = Partitioning.weightedSample(df, "id", "w", n = 4, seed = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }
}
