package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("concatSplit places documents head-to-tail and tracks sequence spans") {
    // one shard, budget 10: docs 4+4 fill to 8, the 5-token doc straddles
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 5L), (4L, 0L), (5L, 11L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.concatSplit(docs, "doc_id", "n_tokens", lit(0), budget = 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_off"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq"), r.getAs[Long]("n_seqs"),
          r.getAs[Long]("off_in_first")))).toMap
    assert(got(1L) === ((0L, 0L, 0L, 1L, 0L)))
    assert(got(2L) === ((4L, 0L, 0L, 1L, 4L)))
    assert(got(3L) === ((8L, 0L, 1L, 2L, 8L)), "straddler spans two sequences")
    assert(got(4L) === ((13L, 1L, 1L, 1L, 3L)), "zero-token doc sits AT its offset")
    assert(got(5L) === ((13L, 1L, 2L, 2L, 3L)), "a doc longer than a sequence spans several")
  }

  test("concatSplit shards are independent and the plan is one exchange") {
    val docs = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)).toDF("doc_id", "n_tokens")
    val out = Packing.concatSplit(docs, "doc_id", "n_tokens", col("doc_id") % 2, budget = 10L)
    // plan BEFORE execution: post-run AQE prints initial+final copies of
    // the same exchange and double-counts it
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"concatSplit must be a single shard-key shuffle:\n$plan")
    val offs = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("start_off")).toMap
    assert(offs === Map(1L -> 0L, 3L -> 7L, 2L -> 0L, 4L -> 7L),
      "each shard starts its own offset line")
  }

  test("greedyBins: capacity respected, docs packed exactly once, FFD half-full law") {
    val rnd = new scala.util.Random(7)
    val budget = 100L
    val docs = (1 to 400).map(i => (i.toLong, rnd.nextInt(100).toLong + 1L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.greedyBins(docs, "doc_id", "n_tokens", budget, numShards = 4)
    val rows = packed.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Int]("shard"), r.getAs[Long]("bin")))
    assert(rows.map(_._1).distinct.length === 400, "every doc packed exactly once")
    val fills = rows.groupBy(_._4).map { case (_, ds) => (ds.head._3, ds.map(_._2).sum) }
    assert(fills.values.forall(_ <= budget), "no bin over capacity")
    // first-fit law: two bins ≤ half capacity cannot coexist in a shard
    fills.groupBy(_._1).foreach { case (shard, byBin) =>
      val halfEmpty = byBin.values.count(_ <= budget / 2)
      assert(halfEmpty <= 1, s"shard $shard has $halfEmpty half-empty bins")
    }
  }

  test("greedyBins matches a single-threaded reference FFD pack at one shard") {
    val rnd = new scala.util.Random(11)
    val budget = 50L
    val sizes = (1 to 120).map(i => i.toLong -> (rnd.nextInt(50).toLong + 1L))
    val got = Packing.greedyBins(
      sizes.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", budget, numShards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    // reference: same FFD order, first fit, sequential
    val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
    val want = sizes.sortBy { case (id, tk) => (-tk, id) }.map { case (id, tk) =>
      var b = 0
      while (b < remaining.size && remaining(b) < tk) b += 1
      if (b == remaining.size) remaining += budget
      remaining(b) -= tk
      id -> b.toLong
    }.toMap
    assert(got === want)
  }

  test("oversize and invalid docs are excluded from packing and audited") {
    val docs = Seq((1L, 10L), (2L, 101L), (3L, -1L)).toDF("doc_id", "n_tokens")
    val packed = Packing.greedyBins(docs, "doc_id", "n_tokens", budget = 100L, numShards = 2)
    assert(packed.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    val audited = Packing.oversizeDocs(docs, "doc_id", "n_tokens", budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(audited === Set(2L, 3L))
  }

  test("mixturePlan: caps at 1, absent sources plan to 0, empty sources avoid NaN") {
    val docs = Seq(
      (1L, "web", 100L), (2L, "web", 100L),     // 200 actual vs target 50
      (3L, "books", 40L),                        // 40 actual vs huge target → cap 1.0
      (4L, "junk", 10L),                         // no target → 0
      (5L, "empty", 0L)                          // zero tokens, targeted → 0, not NaN
    ).toDF("doc_id", "source", "n_tokens")
    val got = graft.operators.Packing.mixturePlan(
      docs, "source", "n_tokens", Map("web" -> 50L, "books" -> 1000000L, "empty" -> 10L))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("actual_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Double]("fraction")))).toMap
    assert(got("web") === ((200L, 50L, 0.25)))
    assert(got("books") === ((40L, 1000000L, 1.0)))
    assert(got("junk") === ((10L, 0L, 0.0)))
    assert(got("empty") === ((0L, 10L, 0.0)))
  }

  test("mixtureSample is deterministic, keeps full-fraction strata, drops untargeted ones") {
    val docs = (1 to 200).map(i =>
      (i.toLong, if (i % 2 == 0) "keep" else "drop", 10L))
      .toDF("doc_id", "source", "n_tokens")
    val targets = Map("keep" -> 1000000L) // >> actual → fraction 1.0
    def run() = graft.operators.Packing.mixtureSample(
      docs, "doc_id", "source", "n_tokens", targets)
      .select("doc_id").as[Long].collect().toSet
    val a = run(); val b = run()
    assert(a === b, "hash sampling must be reproducible")
    assert(a === (2 to 200 by 2).map(_.toLong).toSet,
      "full-fraction stratum keeps everything; untargeted stratum drops everything")
  }

  test("mixtureSampleRepeats: integral oversample repeats every doc exactly f times") {
    // 4 docs × 25 tokens = 100 actual; target 300 → f = 3.0, no residue
    val docs = (1 to 4).map(i => (i.toLong, "web", 25L)).toDF("doc_id", "source", "n_tokens")
    val got = graft.operators.Packing.mixtureSampleRepeats(
      docs, "doc_id", "source", "n_tokens", Map("web" -> 300L))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("epoch").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 4)
    assert(got.forall { case (_, n, mx) => n === 3L && mx === 2L },
      "3 dense epochs per doc, no hash residue at an integral fraction")
  }

  test("mixtureSampleRepeats: fractional residue via injected uniform is exact") {
    // 10 docs × 10 tokens = 100 actual; target 250 → f = 2.5; u = 0.3 for
    // even ids (take the residue copy), 0.9 for odd (do not)
    val docs = (1 to 10).map(i => (i.toLong, "web", 10L)).toDF("doc_id", "source", "n_tokens")
    val u = when(col("doc_id") % 2 === 0, 0.3).otherwise(0.9)
    val counts = graft.operators.Packing.mixtureSampleRepeats(
      docs, "doc_id", "source", "n_tokens", Map("web" -> 250L), uniform = Some(u))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 10).foreach { i =>
      assert(counts(i.toLong) === (if (i % 2 == 0) 3L else 2L))
    }
  }

  test("mixtureSampleRepeats: untargeted sources vanish; determinism; epoch cap") {
    val docs = (1 to 50).map(i =>
      (i.toLong, if (i <= 25) "keep" else "junk", 10L)).toDF("doc_id", "source", "n_tokens")
    def run() = graft.operators.Packing.mixtureSampleRepeats(
      docs, "doc_id", "source", "n_tokens", Map("keep" -> 400L))
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    val a = run()
    assert(a === run(), "hash-uniform residue must be reproducible")
    assert(a.forall(_._1 <= 25L), "junk source is excluded entirely")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Packing.mixtureSampleRepeats(
        docs, "doc_id", "source", "n_tokens", Map("keep" -> 1000000L), maxEpochs = 100)
    }
    assert(e.getMessage.contains("maxEpochs"))
  }

  test("temperatureMixturePlan: alpha 0.5 on perfect squares is exactly rational") {
    // masses 100/400/900 → basis 10/20/30, total 60; budget 600 →
    // targets 100/200/300 and weights 1/6, 1/3, 1/2, all exact
    val docs = Seq(
      (1L, "a", 100L), (2L, "b", 400L), (3L, "c", 900L)
    ).toDF("doc_id", "source", "n_tokens")
    val got = graft.operators.Packing.temperatureMixturePlan(
      docs, "source", "n_tokens", budgetTokens = 600L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("target_tokens"), r.getAs[Double]("weight"),
          r.getAs[Double]("fraction")))).toMap
    assert(got("a") === ((100L, 10.0 / 60.0, 1.0)))
    assert(got("b") === ((200L, 20.0 / 60.0, 0.5)))
    assert(got("c") === ((300L, 30.0 / 60.0, 300.0 / 900.0)))
  }

  test("temperatureMixturePlan: alpha 1 is proportional, alpha 0 is uniform") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "b", 200L), (3L, "c", 600L)
    ).toDF("doc_id", "source", "n_tokens")
    val prop = graft.operators.Packing.temperatureMixturePlan(
      docs, "source", "n_tokens", budgetTokens = 900L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("target_tokens")).toMap
    assert(prop === Map("a" -> 100L, "b" -> 200L, "c" -> 600L),
      "alpha = 1 with budget = total mass must reproduce the masses")
    val unif = graft.operators.Packing.temperatureMixturePlan(
      docs, "source", "n_tokens", budgetTokens = 900L, alpha = 0.0)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("target_tokens")).toMap
    assert(unif === Map("a" -> 300L, "b" -> 300L, "c" -> 300L),
      "alpha = 0 must split the budget evenly")
  }

  test("temperatureMixturePlan: empty sources get zero, targets never exceed budget") {
    val docs = Seq(
      (1L, "a", 170L), (2L, "b", 333L), (3L, "dead", 0L)
    ).toDF("doc_id", "source", "n_tokens")
    val plan = graft.operators.Packing.temperatureMixturePlan(
      docs, "source", "n_tokens", budgetTokens = 1000L)
    val rows = plan.collect().map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("target_tokens"), r.getAs[Double]("weight")))).toMap
    assert(rows("dead") === ((0L, 0.0)))
    val sumTargets = rows.values.map(_._1).sum
    assert(sumTargets <= 1000L, s"floor-division shares must not exceed the budget: $sumTargets")
    assert(sumTargets >= 990L, "shares should nearly exhaust the budget")
    // targetsOf bridges into the samplers
    val m = graft.operators.Packing.targetsOf(plan)
    assert(m === rows.map { case (s, (t, _)) => s -> t })
  }

  test("waterfillMixturePlan: funded/leveled split, remainder order, exact-sum, never overshoots") {
    def run(caps: Map[String, Long], budget: Long): Map[String, Long] =
      Packing.waterfillMixturePlan(
        caps.toSeq.flatMap { case (s, c) => Seq((s, c)) }.toDF("source", "tok"),
        "source", "tok", budget)
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("target_tokens")).toMap
    // classic: small sources whole, big one clipped to the level
    assert(run(Map("a" -> 2L, "b" -> 5L, "c" -> 10L), 12L) ===
      Map("a" -> 2L, "b" -> 5L, "c" -> 5L))
    // remainder +1s go to the FIRST unfunded in (cap, source) order
    assert(run(Map("x" -> 10L, "y" -> 10L, "z" -> 10L), 11L) ===
      Map("x" -> 4L, "y" -> 4L, "z" -> 3L))
    // all funded (budget >= capacity): targets = caps, and the ANSI
    // div/mod-by-zero path must not fire
    assert(run(Map("a" -> 3L, "b" -> 4L), 100L) === Map("a" -> 3L, "b" -> 4L))
    assert(run(Map("a" -> 3L, "b" -> 4L), 0L) === Map("a" -> 0L, "b" -> 0L))
    // a source whose token column is all NULL has ZERO capacity and must
    // fund at 0 — not sort first as NULL, evaluate __funded three-valued,
    // and draw a positive target it cannot honor (r12 advice)
    val withNull = Packing.waterfillMixturePlan(
      Seq(("a", Option(2L)), ("b", Option(10L)),
        ("nulls", None: Option[Long]), ("nulls", None: Option[Long]))
        .toDF("source", "tok"),
      "source", "tok", 8L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("actual_tokens"), r.getAs[Long]("target_tokens")))).toMap
    assert(withNull === Map(
      "a" -> ((2L, 2L)), "b" -> ((10L, 6L)), "nulls" -> ((0L, 0L))),
      "all-NULL source must carry capacity 0 and target 0; Σtargets = min(budget, Σcapacity)")
    // laws over random instances: exact sum, per-source bound
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 20) {
      val caps = (0 until 2 + rnd.nextInt(12)).map(i => s"s$i" -> rnd.nextInt(1000).toLong).toMap
      val budget = rnd.nextInt(1 + caps.values.sum.toInt * 3 / 2).toLong
      val got = run(caps, budget)
      assert(got.values.sum === math.min(budget, caps.values.sum), s"trial $trial exact sum")
      assert(caps.forall { case (s, c) => got(s) <= c }, s"trial $trial overshoot")
      // evenness: any leveled (below-cap) source sits within 1 of any other
      val leveled = got.filter { case (s, t) => t < caps(s) }.values
      if (leveled.nonEmpty)
        assert(leveled.max - leveled.min <= 1L, s"trial $trial water level not flat: $got / $caps")
    }
  }

  test("binStats reports fill and waste per bin") {
    val docs = Seq((1L, 60L), (2L, 30L), (3L, 60L)).toDF("doc_id", "n_tokens")
    val stats = Packing.binStats(
      Packing.greedyBins(docs, "doc_id", "n_tokens", budget = 100L, numShards = 1),
      "n_tokens", budget = 100L)
      .collect().map(r => (r.getAs[Long]("fill"), r.getAs[Long]("waste"), r.getAs[Long]("n_docs")))
      .sortBy(_._1)
    assert(stats.toSeq === Seq((60L, 40L, 1L), (90L, 10L, 2L)))
  }

  test("epochShuffleShards: exact permutation, full shards, epoch-dependent, layout-invariant") {
    val ids = spark.range(0, 750).toDF("id")
    val e2 = Packing.epochShuffleShards(ids, "id", epoch = 2, shardSize = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("pos"), r.getAs[Long]("shard")))
    // positions are exactly 1..n; shard = (pos-1)/100 with a 50-doc tail
    assert(e2.map(_._2).sorted.toSeq === (1L to 750L))
    assert(e2.forall { case (_, p, sh) => sh == (p - 1) / 100 })
    assert(e2.map(_._3).count(_ == 7L) === 50)
    // the order is the prime-modulus permutation, mirrored driver-side
    val expected = (0L until 750L).sortBy(id => id * (654321979L + 2 * 2718281L) % 1000000007L)
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(e2.forall { case (id, p, _) => expected(id) == p })
    // a different epoch is a different permutation; layout cannot matter
    val e3 = Packing.epochShuffleShards(ids, "id", epoch = 3, shardSize = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("pos")))
    assert(e3.toMap !== e2.map(t => (t._1, t._2)).toMap)
    val relaid = Packing.epochShuffleShards(ids.repartition(7), "id", epoch = 2, shardSize = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("pos"))).toMap
    assert(relaid === e2.map(t => (t._1, t._2)).toMap)
    // the degenerate epoch (multiplier ≡ 0 mod p) fails loudly
    intercept[IllegalArgumentException] {
      Packing.epochShuffleShards(ids, "id", epoch = 133231755, shardSize = 100L)
    }
    // ids outside [0, p) fail loudly AT ROW LEVEL — a mod-p collision
    // would silently trade the determinism contract for tie-order
    val wide = Seq(0L, 1000000007L).toDF("id")
    val ex = intercept[Exception] {
      Packing.epochShuffleShards(wide, "id", epoch = 2, shardSize = 10L).collect()
    }
    assert(ex.getMessage != null)
    graft.operators.Caches.release()
  }

  test("writeEpochShards: one file per shard, in-file rows follow the epoch order") {
    val docs = spark.range(0, 300).select(col("id"), (col("id") * 2).as("payload"))
    val path = java.nio.file.Files.createTempDirectory("graft_epoch_shards").toString + "/e2"
    Packing.writeEpochShards(docs, "id", epoch = 2, shardSize = 100L, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.startsWith("shard="))
    assert(files.map(_.getName).sorted.toSeq === Seq("shard=0", "shard=1", "shard=2"))
    files.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"${d.getName} must be exactly one file — a reader streams it sequentially")
    }
    // in-file order: reading one shard's single file yields ascending pos
    val one = spark.read.parquet(s"$path/shard=0")
      .select("pos").collect().map(_.getAs[Long]("pos")).toSeq
    assert(one === one.sorted && one.size === 100, s"shard 0 must hold pos 1..100 in order")
    assert(one.head === 1L && one.last === 100L)
    // payload survives the join back
    val full = spark.read.parquet(path)
    assert(full.where(col("payload") =!= col("id") * 2).count() === 0L)
    graft.operators.Caches.release()
  }

  test("lengthBucketedBatches: power-of-two buckets, contiguous batches, spread bound, layout-invariant") {
    import graft.operators.Packing
    val docs = (1L to 97L).map(i => (i, (i * 37) % 200 + 1)) :+ (98L, 0L) :+ (99L, -5L)
    def run(parts: Int) = Packing.lengthBucketedBatches(
        docs.toDF("doc_id", "n_chars").repartition(parts), "doc_id", "n_chars", batchSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    val out = run(3)
    graft.operators.Caches.release()
    // non-positive lengths have no batchable size
    assert(out.length === 97 && !out.exists(t => t._1 == 98L || t._1 == 99L))
    out.foreach { case (_, len, bucket, _, _) =>
      assert(bucket === (63 - java.lang.Long.numberOfLeadingZeros(len)),
        s"bucket must be floor(log2(len)) exactly: len $len -> $bucket")
    }
    // within each (bucket, batch): size <= 8, positions 0..size-1, and the
    // padding bound — max len < 2 * min len by the power-of-two bucket
    out.groupBy(t => (t._3, t._4)).foreach { case ((b, bi), xs) =>
      assert(xs.length <= 8)
      assert(xs.map(_._5).sorted.toSeq === (0 until xs.length).toSeq, s"batch ($b,$bi)")
      assert(xs.map(_._2).max < 2 * xs.map(_._2).min,
        s"power-of-two bucket must bound the pad spread: ${xs.toSeq}")
    }
    // batches fill in (len, id) order: only the LAST batch of a bucket may be short
    out.groupBy(_._3).foreach { case (b, xs) =>
      val sizes = xs.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.init.forall(_ == 8), s"bucket $b: only the last batch may be short, got $sizes")
    }
    // pure function of the corpus: physical layout cannot move an assignment
    val again = run(11)
    graft.operators.Caches.release()
    assert(out.toSeq === again.toSeq)
  }

  test("curriculumSchedule: competence cuts, nested eligibility, per-epoch permutations") {
    // 40 docs, difficulty with TIES (id breaks them), c0 = 0.5, ramp 2
    val docs = (0L until 40L).map(i => (i, (i % 7).toInt)).toDF("id", "diff")
    val sched = Packing.curriculumSchedule(
      docs, "id", "diff", epochs = 3, startCompetence = 0.5,
      rampEpochs = 2, shardSize = 8L)
      .collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("id"),
        r.getAs[Long]("difficulty_rank"), r.getAs[Long]("pos"), r.getAs[Long]("shard")))
    graft.operators.Caches.release()
    val byEpoch = sched.groupBy(_._1).view.mapValues(_.toSeq).toMap
    // k(0) = ceil(0.5·40) = 20; k(1) = ceil(sqrt(0.625)·40) = 32; k(2) = 40
    assert(byEpoch(0).size === 20 && byEpoch(1).size === 32 && byEpoch(2).size === 40)
    // eligibility is NESTED: each epoch's doc set contains the previous one's
    val ids = (e: Int) => byEpoch(e).map(_._2).toSet
    assert(ids(0).subsetOf(ids(1)) && ids(1).subsetOf(ids(2)))
    // epoch 0 holds exactly the 20 easiest (rank 1..20 by (diff, id))
    val rankOf = sched.map(t => t._2 -> t._3).toMap
    assert(byEpoch(0).map(_._3).toSet === (1L to 20L).toSet)
    // the id tie-break: equal difficulty orders by id
    val expectRank = (0L until 40L).sortBy(i => ((i % 7).toInt, i))
      .zipWithIndex.map { case (i, r) => i -> (r + 1L) }.toMap
    assert(rankOf === expectRank)
    // pos is a permutation 1..k per epoch, and epochs permute DIFFERENTLY
    (0 to 2).foreach { e =>
      assert(byEpoch(e).map(_._4).sorted.toSeq === (1L to ids(e).size).toSeq, s"epoch $e")
    }
    val order = (e: Int) => byEpoch(e).filter(t => ids(0).contains(t._2))
      .sortBy(_._4).map(_._2).toSeq
    assert(order(0) !== order(1), "epochs must re-permute, not rotate the same order")
    // shard arithmetic
    sched.foreach { case (_, _, _, pos, shard) => assert(shard === (pos - 1) / 8) }
  }

  test("curriculumSchedule fails loudly on NULL difficulty and reserved columns") {
    val withNull = Seq((1L, Some(3)), (2L, None)).toDF("id", "diff")
    val ex = intercept[Exception] {
      Packing.curriculumSchedule(withNull, "id", "diff",
        epochs = 1, startCompetence = 1.0, rampEpochs = 1, shardSize = 10L).collect()
    }
    graft.operators.Caches.release()
    assert(ex.getMessage.contains("NULL diff") ||
      Option(ex.getCause).exists(_.getMessage.contains("NULL diff")))
    val reserved = Seq((1L, 1, 0)).toDF("id", "diff", "epoch")
    val ex2 = intercept[IllegalArgumentException] {
      Packing.curriculumSchedule(reserved, "id", "diff",
        epochs = 1, startCompetence = 1.0, rampEpochs = 1, shardSize = 10L)
    }
    assert(ex2.getMessage.contains("epoch"))
  }

  test("packedSpans: global offsets, owning sequences, boundary-crossing flag") {
    // one shard, budget 10: doc 1 (len 8) at offset 0, doc 2 (len 7) at 8
    val lengths = Seq((1L, 8L), (2L, 7L)).toDF("id", "len")
    val spans = Seq(
      (1L, 0, 2L, 5L, true), // global [2,5) -> seq 0, no crossing
      (1L, 1, 6L, 8L, true), // global [6,8) -> seq 0
      (2L, 0, 0L, 4L, true), // global [8,12) -> seqs 0..1, CROSSES
      (2L, 1, 4L, 4L, false), // empty span at global 12 -> seq 1, no crossing
      (9L, 0, 0L, 1L, true)) // no layout row -> dropped
      .toDF("id", "turn_idx", "start", "end", "is_target")
    val got = Packing.packedSpans(spans, lengths, "id", "len", lit(0L), budget = 10L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("turn_idx")) ->
        ((r.getAs[Long]("g_start"), r.getAs[Long]("g_end"),
          r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"),
          r.getAs[Boolean]("crosses_boundary")))).toMap
    assert(got.keySet === Set((1L, 0), (1L, 1), (2L, 0), (2L, 1)),
      "spans without a layout row have no coordinates and drop")
    assert(got((1L, 0)) === ((2L, 5L, 0L, 0L, false)))
    assert(got((1L, 1)) === ((6L, 8L, 0L, 0L, false)))
    assert(got((2L, 0)) === ((8L, 12L, 0L, 1L, true)), "the straddling span must flag")
    assert(got((2L, 1)) === ((12L, 12L, 1L, 1L, false)), "empty spans sit at their position")
  }
}
