package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog near the river bank today"), // near-dup of 1
    (4L, "completely different content about distributed query engines and shuffles"),
    (5L, "   "), // whitespace-only
    (6L, "one")) // shorter than shingle k
    .toDF("id", "text")

  test("exactGroups: canonical hash groups with deterministic keeper") {
    val g = Dedup.exactGroups(corpus, "text", "id").collect()
    val dupGroup = g.find(_.getAs[Long]("copies") == 2)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("keeper_id") == 1L)
    assert(Dedup.exactDedup(corpus, "text", "id").count() == 5)
  }

  test("minHashDedupPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup
      .minHashDedupPairs(corpus, "text", "id", numPerm = 64, bands = 16, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs.contains((1L, 2L)), "exact dup must surface")
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), "near dup must surface")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc must not pair")
  }

  test("minHashSketch: J(identical)=1 estimate, stable across evaluations") {
    val sk = corpus.select(col("id"), Dedup.minHashSketch(col("text"), 64).as("mh"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(sk(1L) == sk(2L), "identical docs → identical sketch")
    assert(sk(1L) != sk(4L))
    assert(sk(1L).length == 64)
  }

  test("simHashPairs: exact dup at hamming 0; unrelated docs beyond threshold") {
    val pairs = Dedup.simHashPairs(corpus, "text", "id")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Int]("hamming"))
      .toMap
    assert(pairs((1L, 2L)) == 0)
    assert(!pairs.keySet.exists { case (a, b) => (a == 4L || b == 4L) && (a <= 3L || b <= 3L) })
  }

  test("hammingPairs64: banded = brute force on arbitrary injected signatures; NULL sigs dropped") {
    import spark.implicits._
    // signatures injected directly (the image-dHash / audio-fingerprint
    // entry point) — no text machinery involved. Random 64-bit values plus
    // planted near-neighbors at hamming 1..3 and one exact dup.
    val rnd = new scala.util.Random(17)
    val base = (0L until 40L).map(i => i -> rnd.nextLong())
    val planted = Seq(
      100L -> base(0)._2, // hamming 0
      101L -> (base(1)._2 ^ 1L), // hamming 1
      102L -> (base(2)._2 ^ ((1L << 5) | (1L << 63))), // hamming 2, sign bit flipped
      103L -> (base(3)._2 ^ ((1L << 16) | (1L << 32) | (1L << 48)))) // hamming 3, one per band
    val sigs = (base ++ planted).map { case (i, s) => (i, Option(s)) } :+ ((999L, None: Option[Long]))
    val df = sigs.toDF("id", "sig")
    val got = Dedup.hammingPairs64(df, "id", "sig")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Int]("hamming")).toMap
    val exact = (for {
      (ia, Some(sa)) <- sigs; (ib, Some(sb)) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib) -> java.lang.Long.bitCount(sa ^ sb)).toMap
    assert(got == exact,
      s"banded must equal brute force: missing=${(exact.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- exact.keySet).take(5)}")
    assert(exact.contains((0L, 100L)) && exact.contains((3L, 103L)), "planted witnesses live")
    assert(!got.keySet.exists { case (a, b) => a == 999L || b == 999L }, "NULL sig never pairs")
    graft.operators.Caches.release(blocking = true)
  }

  test("band geometry: S-curve thresholds are monotone and bandsForThreshold lands at/below target") {
    // more bands → lower threshold (more lenient candidate generation)
    val ts = Seq(1, 2, 4, 8, 16, 32, 64).map(b => Dedup.lshThreshold(64, b))
    assert(ts == ts.sorted.reverse)
    Seq(0.9, 0.7, 0.5, 0.3).foreach { t =>
      val b = Dedup.bandsForThreshold(64, t)
      assert(64 % b == 0)
      assert(Dedup.lshThreshold(64, b) <= t + 1e-9, s"threshold for b=$b must be <= $t")
    }
    // the q25 default (64 perms, 16 bands) targets ~0.5 jaccard
    assert(Dedup.lshThreshold(64, 16) < 0.6)
  }

  test("duplicateClusters: transitive chains collapse to one cluster, min-id representative") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b") // chain 1-2-3; pair 10-11
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L,
      "the 1-2-3 chain must be ONE cluster even though (1,3) was never a pair")
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
  }

  test("dedupByClusters keeps one doc per duplicate group plus all unpaired docs") {
    val out = Dedup.dedupByClusters(corpus, "text", "id", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(out.contains(1L), "cluster representative (min id) survives")
    assert(!out.contains(2L), "exact dup drops")
    assert(!out.contains(3L), "near dup in the same cluster drops")
    assert(out.contains(4L) && out.contains(5L) && out.contains(6L), "unpaired docs all survive")
  }

  test("hot-bucket cap: 10k identical docs produce linear star pairs, not (n choose 2)") {
    val n = 10000
    val boiler = spark.range(n)
      .select(col("id"), lit("exact same boilerplate text repeated across the whole corpus").as("text"))
    val pairs = Dedup
      .minHashDedupPairs(boiler, "text", "id", numPerm = 64, bands = 16, threshold = 0.5,
        maxBucket = 50)
      .collect()
    assert(pairs.length == n - 1, "star pairs: every doc pairs once to the keeper")
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
    assert(pairs.forall(_.getAs[Long]("id_a") == 0L), "keeper is the min id")
    // the cap is observable, not silent: every band reports the flood
    val hot = Dedup.hotBuckets(boiler, "text", "id", maxBucket = 50).collect()
    assert(hot.length == 16, s"one flooded bucket per band, got ${hot.length}")
    assert(hot.forall(_.getAs[Long]("occupancy") == n))
  }

  test("hot-bucket cap: cold near-dups still surface alongside a hot cluster") {
    val boiler = spark.range(100)
      .select((col("id") + 100L).as("id"),
        lit("boilerplate body that floods one bucket with identical content").as("text"))
    val mixed = corpus.unionByName(boiler)
    val pairs = Dedup
      .minHashDedupPairs(mixed, "text", "id", numPerm = 64, bands = 16, threshold = 0.5,
        maxBucket = 20)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(pairs.contains((1L, 2L)), "cold exact dup still found")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), "cold near dup still found")
    assert(pairs.count { case (a, _) => a == 100L } == 99, "hot cluster is keeper-starred")
  }

  test("hot-bucket star pairs key on the shingle SET, not its first-occurrence order") {
    // Same distinct shingle set, different order of first occurrence →
    // identical minhash sketch (hence same hot bucket) and true jaccard 1.0;
    // the star-pair grouping must not split them.
    val a = "x y z a b c x y z"
    val b = "a b c x y z a b c"
    val docs = spark.range(1000)
      .select(col("id"), when(col("id") % 2 === 0, lit(a)).otherwise(lit(b)).as("text"))
    val pairs = Dedup
      .minHashDedupPairs(docs, "text", "id", numPerm = 64, bands = 16, threshold = 0.5,
        maxBucket = 50)
      .collect()
    assert(pairs.length == 999, s"one star pair per non-keeper, got ${pairs.length}")
    assert(pairs.forall(r => r.getAs[Double]("jaccard") == 1.0 && r.getAs[Long]("id_a") == 0L))
  }

  test("hot-bucket cap: simHashPairs stays linear on an identical-doc flood") {
    val boiler = spark.range(2000)
      .select(col("id"), lit("identical simhash flood document body").as("text"))
    val pairs = Dedup.simHashPairs(boiler, "text", "id", maxBucket = 50).collect()
    assert(pairs.length == 1999)
    assert(pairs.forall(r => r.getAs[Int]("hamming") == 0 && r.getAs[Long]("id_a") == 0L))
  }

  test("capped simHashPairs: near-but-not-identical member of a hot bucket survives via keeper verification") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
    val variant = base.replace("alpha", "replacement0") // measured simhash hamming = 2
    val flood = spark.range(2000).select(col("id"), lit(base).as("text"))
    val docs = flood.unionByName(Seq((5000L, variant)).toDF("id", "text"))
    val pairs = Dedup.simHashPairs(docs, "text", "id", maxBucket = 50).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Int]("hamming"))
      .toMap
    // hamming <= 3 ⇒ pigeonhole puts the variant in at least one flooded
    // band bucket; the OLD hot path (identical-signature star only) dropped
    // it, the keeper-verified path must keep it with its true distance
    assert(pairs.get((0L, 5000L)).contains(2),
      s"near-variant must pair to the hot-bucket keeper at true hamming; got ${pairs.get((0L, 5000L))}")
    assert(pairs.count { case ((a, _), h) => a == 0L && h == 0 } == 1999,
      "identical flood still keeper-stars linearly")
    // and with the (default) uncapped contract the answer is identical here
    val uncapped = Dedup.simHashPairs(docs, "text", "id").collect()
    assert(uncapped.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      .contains((0L, 5000L)))
  }

  test("capped cosineNearDupPairs: near-but-not-identical member of a hot bucket survives via keeper verification") {
    // one dense direction: 2000 bit-identical vectors + one 1.0005x-scaled
    // near copy (cosine 1.0 up to float rounding, not bit-identical)
    val dim = 64
    val baseVec = Array.tabulate(dim)(i => (math.sin(i + 1) * 0.5).toFloat)
    val nearVec = baseVec.map(x => (x * 1.0005f))
    val flood = spark.range(2000).select(col("id").as("vec_id"), typedlit(baseVec.toSeq).as("embedding"))
    val docs = flood.unionByName(Seq((5000L, nearVec.toSeq)).toDF("vec_id", "embedding"))
    val pairs = graft.operators.Similarity
      .cosineNearDupPairs(docs, "vec_id", "embedding", threshold = 0.99, maxBucket = 50)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("cosine"))
      .toMap
    assert(pairs.keySet.contains((0L, 5000L)),
      "scaled near-copy in the flooded bucket must pair to the keeper by true cosine")
    assert(pairs((0L, 5000L)) >= 0.99)
    assert(pairs.count { case ((a, _), c) => a == 0L && c == 1.0 } >= 1999,
      "bit-identical flood still keeper-stars linearly")
  }

  test("degenerate docs: empty-content groups behave identically below and above the bucket cap") {
    // Empty / whitespace / shorter-than-k docs all carry the single shingle
    // "" — they must pair with each other at jaccard 1.0 whether they ride
    // the cold quadratic join (few) or the hot keeper-star path (many).
    def emptyCorpus(n: Int) = spark.range(n)
      .select(col("id"), when(col("id") % 2 === 0, lit("")).otherwise(lit("   \t ")).as("text"))
    for (n <- Seq(5, 500)) {
      val pairs = Dedup
        .minHashDedupPairs(emptyCorpus(n), "text", "id", threshold = 0.5, maxBucket = 50)
        .collect()
      assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0), s"n=$n: all pairs jaccard 1.0")
      val clusters = Dedup.duplicateClusters(pairs.toSeq.map(r =>
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toDF("id_a", "id_b"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster"))
      assert(clusters.length == n, s"n=$n: every doc is in the duplicate group")
      assert(clusters.forall(_._2 == 0L), s"n=$n: ONE group, min-id representative")
    }
  }

  test("degenerate docs: NULL text never pairs and does not flood band buckets") {
    val withNulls = corpus.unionByName(
      spark.range(100, 600)
        .select(col("id"), lit(null).cast("string").as("text")))
    val pairs = Dedup
      .minHashDedupPairs(withNulls, "text", "id", threshold = 0.5, maxBucket = 50)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(!pairs.exists { case (a, b) => a >= 100L || b >= 100L },
      "similarity with an absent document is undefined — null rows must not pair")
    assert(pairs.contains((1L, 2L)) && (pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))),
      "real duplicates still surface alongside the null rows")
    // nulls are excluded from banding entirely, so the audit sees no flood
    assert(Dedup.hotBuckets(withNulls, "text", "id", maxBucket = 50).count() == 0)
    // and simhash obeys the same contract
    val sim = Dedup.simHashPairs(withNulls, "text", "id", maxBucket = 50).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(!sim.exists { case (a, b) => a >= 100L || b >= 100L })
  }

  test("degenerate docs: size-0 hash arrays (direct hash API) take the keeper-star path") {
    // Unreachable from the text APIs (shingles() maps degenerate docs to
    // the "" shingle) but reachable when callers build their own hash
    // column; an all-MaxValue sketch must not enter banding.
    val hashed = Seq(
      (1L, Seq(11L, 12L, 13L)), (2L, Seq(11L, 12L, 13L)),
      (3L, Seq.empty[Long]), (4L, Seq.empty[Long]), (5L, Seq.empty[Long]))
      .toDF("id", "sh")
    // go through the public sketch builder, then reuse the pipeline pieces
    // via a text-free frame: content = the hash array rendered as text is
    // NOT equivalent, so drive minHashDedupPairs with a crafted text col
    // that reproduces the sets — instead assert at the expression level and
    // on the candidate generator.
    val sk = hashed.select(col("id"), Dedup.minHashFromHashes(col("sh"), 16).as("mh")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(sk(3L).forall(_ == Long.MaxValue), "empty set → neutral sketch")
    assert(sk(3L) == sk(4L))
  }

  test("exactJaccardPairs is exact: inverted index reproduces brute-force all-pairs Jaccard") {
    val exact = Dedup.exactJaccardPairs(corpus, "text", "id", shingleK = 3, threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    // brute force over the tiny corpus via jaccardVerify on ALL pairs
    val ids = corpus.select("id").as[Long].collect().sorted
    val allPairs = (for { a <- ids; b <- ids if a < b } yield (a, b)).toSeq.toDF("id_a", "id_b")
    val brute = Dedup.jaccardVerify(allPairs, corpus, "text", "id", threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(exact == brute, s"inverted-index result must equal brute force:\n$exact\nvs $brute")
  }

  test("weightedJaccardPairs matches a driver mirror on random multisets") {
    val rnd = new scala.util.Random(31)
    val docs = (0L until 30L).map { i =>
      val len = 1 + rnd.nextInt(12)
      i -> Seq.fill(len)(s"w${rnd.nextInt(6)}").mkString(" ")
    }
    val got = Dedup.weightedJaccardPairs(docs.toDF("id", "text"), "text", "id", threshold = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("jaccard_w"), r.getAs[Double]("containment_a"))))
      .toMap
    val tf = docs.map { case (i, t) =>
      i -> t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sm = (tf(a).keySet & tf(b).keySet).toSeq.map(t => math.min(tf(a)(t), tf(b)(t))).sum
      if sm > 0
      ma = tf(a).values.sum; mb = tf(b).values.sum
    } yield (a, b) -> ((sm.toDouble / (ma + mb - sm), sm.toDouble / ma))).toMap
    assert(got === want, s"${got.size} vs ${want.size} pairs")
    graft.operators.Caches.release(blocking = true)
  }

  test("cluster APIs refuse non-integral id columns instead of silently dropping edges") {
    // a string id like "doc-123" casts to NULL long and its edges would
    // vanish from the DataFrame CC path — the guard fails at plan time
    val strPairs = Seq(("doc-1", "doc-2")).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] { Dedup.duplicateClusters(strPairs) }
    assert(ex.getMessage.contains("INTEGRAL"))
    val strDocs = Seq(("doc-1", 5L)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      Dedup.keepBestByCluster(strDocs, "id", "score", Seq((1L, 1L)).toDF("id", "cluster"))
    }
  }

  test("keepBestByCluster: best wins over min-id, ties to smaller id, unclustered survive") {
    val docs = Seq(
      (1L, "short", 2L),    // cluster {1,2,3}: 2 scores highest → keeper
      (2L, "longer", 9L),
      (3L, "mid", 5L),
      (4L, "tie a", 7L),    // cluster {4,5}: tie → smaller id keeps
      (5L, "tie b", 7L),
      (6L, "alone", 1L))    // unclustered: always survives
      .toDF("id", "text", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)).toDF("id", "cluster")
    val out = Dedup.keepBestByCluster(docs, "id", "score", clusters)
      .select("id").as[Long].collect().toSet
    assert(out === Set(2L, 4L, 6L),
      "keeper 2 beats min-id 1 on score; tie in {4,5} goes to 4; 6 is untouched")
  }

  test("weightedJaccardPairs: exact tf arithmetic, identical docs, containment, df cap") {
    val docs = Seq(
      (1L, "a a b"),          // tf a:2 b:1, mass 3
      (2L, "a b b c"),        // tf a:1 b:2 c:1, mass 4
      (3L, "a a b"),          // identical to 1
      (4L, "z z z"))          // disjoint
      .toDF("id", "text")
    val out = Dedup.weightedJaccardPairs(docs, "text", "id", threshold = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("jaccard_w"), r.getAs[Double]("containment_a"))))
      .toMap
    // (1,2): Σmin = min(2,1) + min(1,2) = 2; Σmax = 3 + 4 − 2 = 5
    assert(out((1L, 2L)) === ((2.0 / 5.0, 2.0 / 3.0)))
    assert(out((1L, 3L)) === ((1.0, 1.0)), "identical multisets score exactly 1")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L), "disjoint docs never pair")
    // the SET Jaccard of 1 vs 2 over distinct tokens would be 2/4 = 0.5 —
    // the weighted form must differ (0.4): repetition genuinely weighs in
    assert(out((1L, 2L))._1 !== 0.5)
  }

  test("weightedJaccardPairs df cap: capped terms leave the index but stay in the masses") {
    val docs = Seq(
      (1L, "stop x y"),
      (2L, "stop x z"),
      (3L, "stop q r"))   // 'stop' df=3, 'x' df=2
      .toDF("id", "text")
    val capped = Dedup.weightedJaccardPairs(docs, "text", "id", threshold = 0.0, maxTermDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard_w")).toMap
    // 'stop' (df 3 > 2) is out of the index: (1,2) share only 'x' → 1/(3+3−1);
    // (1,3)/(2,3) share nothing surviving → absent entirely
    assert(capped === Map((1L, 2L) -> 1.0 / 5.0))
    val uncapped = Dedup.weightedJaccardPairs(docs, "text", "id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard_w")).toMap
    assert(uncapped((1L, 2L)) === 2.0 / 4.0)
    assert(uncapped.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("weightedMinHashPairs ⊆ exact weighted pairs with IDENTICAL scores; top-tier recall") {
    val dir = "/root/testdata/sf0.001"
    val corpus = Queries.syntheticVocabDocs(spark, dir)
    val approx = Dedup.weightedMinHashPairs(corpus, "text", "doc_id", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    val exact = Dedup.weightedJaccardPairs(corpus, "text", "doc_id", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard_w")).toMap
    assert(approx.nonEmpty, "LSH must surface something at this geometry")
    for ((pair, j) <- approx)
      assert(exact.get(pair).contains(j),
        s"$pair: emitted $j but exact says ${exact.get(pair)} — verification must BE Σmin/Σmax")
    // the δ=1 tier (jaccard_w = 18/34) has per-band collision probability
    // (18/34)^4 per band over 16 bands ⇒ expected recall ≈ 0.77; demand a
    // floor of half on the deterministic xxhash family
    val top = exact.filter(_._2 > 0.52).keySet
    val got = top.count(approx.contains)
    assert(got * 2 >= top.size, s"top-tier recall $got/${top.size}")
  }

  test("weightedMinHashPairs: repetition genuinely weighs in (multiset, not set, semantics)") {
    // identical DISTINCT-token sets {a,b}, very different multisets: set
    // Jaccard is 1.0, weighted must be min(2,1)+min(1,1) / (3+2−2) = 2/3
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "a a b")).toDF("id", "text")
    val got = Dedup.weightedMinHashPairs(docs, "text", "id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(got((1L, 3L)) === 1.0, "identical multisets collide in every band and score 1")
    assert(got.get((1L, 2L)).forall(_ === 2.0 / 3.0),
      "if LSH surfaces the (1,2) candidate its verified score is the weighted 2/3, never the set 1.0")
    assert(!got.contains((2L, 3L)) || got((2L, 3L)) === 2.0 / 3.0)
    graft.operators.Caches.release(blocking = true)
  }

  test("LSH pipeline precision vs exact ground truth on real documents") {
    val sfDir = "/root/testdata/sf0.001"
    val lsh = Queries.queries("q25_minhash_dedup")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Queries.queries("q25c_jaccard_pairs_exact")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"every LSH-emitted pair must be a true >=threshold pair; extras: ${lsh.diff(exact)}")
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall vs exact ground truth was $recall")
  }

  test("simHash band blocking is EXACT for hamming <= 3 (pigeonhole over 4x16-bit bands)") {
    val sfDir = "/root/testdata/sf0.001"
    val corpus = Queries.corpusWithPlantedDups(spark, sfDir)
    val sigs = corpus.select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val blocked = Queries.queries("q26_simhash_pairs")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == exact,
      s"hamming<=3 guarantees a shared band — blocking must lose nothing; " +
        s"missing=${exact.diff(blocked).take(5)} extra=${blocked.diff(exact).take(5)}")
    // the brute-force twin reproduces the same ground truth through an
    // INDEPENDENT algorithm (nested loop, no pigeonhole) — same hash face
    val bruteExact = Dedup.simHashPairsExact(corpus, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bruteExact == exact, "exact all-pairs must equal driver-side all-pairs hamming")
  }

  test("simHash linear oracle face: banding equals catalog q26c; planted dups found") {
    // q26c runs the SAME tokenize → SimHashExpr vote → all-pairs hamming
    // machinery under the ANSI-reproducible token hash (its DuckDB oracle
    // rebuilds the signature from raw bytes). Pigeonhole is hash-agnostic,
    // so the banded fast path under the linear hash must emit the
    // identical pair set — tying the production banding machinery to the
    // externally-gated signature.
    val sfDir = "/root/testdata/sf0.001"
    val corpus = Queries.corpusWithPlantedDups(spark, sfDir)
    val linearHash = (t: org.apache.spark.sql.Column) => Dedup.linearTokenHash(t, seed = 11L)
    val catalogExact = Queries.queries("q26c_simhash_pairs_exact")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.simHashPairs(corpus, "text", "doc_id", tokenHash = linearHash)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == catalogExact,
      s"banding under the linear hash must lose nothing; " +
        s"missing=${catalogExact.diff(banded).take(5)} extra=${banded.diff(catalogExact).take(5)}")
    // the linear face is a working near-dup signature, not a degenerate
    // one: it recovers planted (orig, orig+1e6) mutated-copy pairs
    assert(catalogExact.exists { case (a, b) => b == a + 1000000L },
      "linear-hash SimHash must recover planted near-duplicates")
    // bit 63 is structurally zero under the 63-bit spread
    val sigs = corpus.select(Dedup.simHash(col("text"), linearHash).as("sig"))
      .where(col("sig").isNotNull).as[Long].collect()
    assert(sigs.forall(_ >= 0L), "linear-face signatures must never set bit 63")
  }

  test("embedding near-dup precision vs brute-force cosine ground truth") {
    val sfDir = "/root/testdata/sf0.001"
    val lsh = Queries.queries("q32_embedding_near_dup")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth in the driver over the same planted corpus
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val planted = emb.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 1000000L) -> v.map(x => x * 1.001f) }
    val all = emb ++ planted
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = (for {
      (ia, va) <- all; (ib, vb) <- all
      if ia < ib && cos(va, vb) >= 0.989 // epsilon under the query's 0.99: float-sum order differs
    } yield (ia, ib)).toSet
    assert(lsh.subsetOf(exact), s"LSH-emitted pairs must be true near-dups; extras=${lsh.diff(exact).take(5)}")
    val plantedPairs = planted.map { case (id, _) => (id - 1000000L, id) }.toSet
    val recall = lsh.intersect(plantedPairs).size.toDouble / plantedPairs.size
    assert(recall >= 0.9, s"planted 1.001x-scaled copies must be recalled, got $recall")
    // the LSH pipeline is also a subset of the catalog's oracle-gated
    // brute-force twin (which DuckDB reproduces as a threshold set)
    val catalogExact = Queries.queries("q32c_embedding_near_dup_exact")(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(catalogExact),
      s"q32 must be a subset of q32c; extras=${lsh.diff(catalogExact).take(5)}")
  }

  test("native shingle hashing: value parity with the composed form on the edge cases") {
    val edgeDocs = Seq(
      null,
      "",
      "   ",
      "\t\n\r ",
      "one",
      "one two",
      "one two three",
      "one two three four",
      "  leading and trailing  ",
      "tabs\tbetween\twords",
      "mixed \t\n whitespace  runs",
      "unicode café naïve 你好 tokens here",
      "nbsp is-not-ascii-whitespace so stays one token",
      "dup dup dup dup dup",
      "a b a b a b")
    Seq(1, 3, 7).foreach { k =>
      val df = edgeDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val native = df.select(col("id"), Dedup.shingleHashes(col("text"), k).as("sh"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_ => r.getSeq[Long](1))).toMap
      val composed = df.select(col("id"),
          Dedup.shingleHashesComposed(col("text"), k).as("sh"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_ => r.getSeq[Long](1))).toMap
      assert(native == composed, s"k=$k: native and composed shingle hashes must agree")
    }
    // NULL text stays NULL (prep's bandable() depends on it)
    val nullRow = Seq((1L, null: String)).toDF("id", "text")
      .select(Dedup.shingleHashes(col("text"), 3)).head
    assert(nullRow.isNullAt(0))
  }

  test("jaccardVerify on explicit candidate pairs") {
    val cand = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val verified = Dedup.jaccardVerify(cand, corpus, "text", "id", threshold = 0.5).collect()
    assert(verified.length == 1)
    assert(verified.head.getAs[Double]("jaccard") == 1.0)
  }

  test("re-invoking the dedup pipeline compiles ZERO new codegen classes (the rounds-4-6 warm anomaly)") {
    // The 2x warm-pass bench anomaly was codegen-cache misses: AQE's
    // run-order-dependent codegenStageId was embedded in generated CLASS
    // NAMES, so a re-run landed byte-identical code under a fresh name and
    // re-paid janino + interpreter→C2 warmup per invocation — seconds, on
    // the dedup query's huge generated classes. With
    // spark.sql.codegen.useIdInClassName=false (SparkTestSession/Sessions/
    // Bench/Verify) the cache must HIT: a per-batch dedup service compiles
    // each stage once per JVM, ever.
    val docs = spark.range(300).select(
      col("id"),
      concat(lit("text body number "), (col("id") % 37).cast("string"),
        lit(" with shared tail words")).as("text"))
    def run(): Long =
      Dedup.minHashDedupPairs(docs, "text", "id", threshold = 0.5).count()
    val n1 = run() // compiles + JITs the compute-the-cache plan shape
    val n2 = run() // compiles the read-the-cache plan shape (prep resident now)
    // steady state — the per-batch service loop — starts here
    val before = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val n3 = run()
    val after = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    assert(n1 == n2 && n2 == n3, "sanity: stable result across invocations")
    // threshold, not zero: the guarded pathology (unstable class NAMES —
    // rounds 4-6) recompiles the WHOLE pipeline (~100 classes) on every
    // invocation; under full-suite cache pressure Guava's segmented LRU
    // can evict a handful of just-used entries regardless of capacity,
    // which is churn, not the bug. Anything beyond a handful means names
    // or caching broke again.
    assert(after - before <= 8,
      s"a steady-state re-invocation must reuse its generated classes, " +
        s"but ${after - before} fresh codegen compilations happened")
  }
}
