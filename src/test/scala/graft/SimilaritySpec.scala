package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("bruteForceTopK: k rows, descending cosine, no self-match") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = 10).collect()
    assert(top.length == 10)
    assert(!top.exists(_.getAs[Long]("vec_id") == 0L))
    val cos = top.map(_.getAs[Double]("cosine")).toSeq
    assert(cos == cos.sorted.reverse, "must be ranked by cosine desc")
  }

  test("bruteForceTopKExactInt: integer values match a driver-side recompute; id set tracks the float face") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val got = Similarity.bruteForceTopKExactInt(emb, "vec_id", "embedding", queryId = 0L, k = 20)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dot"), r.getAs[Long]("norm2")))
    assert(got.length == 20)
    // driver-side ground truth: quantize with the same floor(x*1000+0.5),
    // exact long arithmetic, rank by cosine desc / id asc
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
      .toMap
    val qv = vecs(0L)
    val qn = qv.map(x => x * x).sum
    val scored = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val dot = v.zip(qv).map { case (a, b) => a * b }.sum
      val n2 = v.map(x => x * x).sum
      val cos = if (n2 == 0L || qn == 0L) 0.0 else dot.toDouble / (math.sqrt(n2.toDouble) * math.sqrt(qn.toDouble))
      (id, dot, n2, cos)
    }.sortBy { case (id, _, _, cos) => (-cos, id) }.take(20)
    assert(got.toSeq === scored.map { case (id, dot, n2, _) => (id, dot, n2) },
      "the distributed exact-int top-k must equal the driver recompute, values and order")
    // quantization at scale 1000 must not reorder this corpus' top-k vs
    // the float face — the twin stands in for q30, so the sets must agree
    val floatIds = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val overlap = got.map(_._1).count(floatIds.contains)
    assert(overlap >= 18, s"exact-int twin diverged from the float face: $overlap/20 shared")
  }

  test("approximate faces are ⊆ exact brute force: every LSH/IVF hit carries the true cosine") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // the whole corpus ranked exactly — any correct approximate result is
    // a subset of these (id, cosine) pairs with BIT-IDENTICAL cosines,
    // since both paths score with the same deterministic fold
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1000000)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 20).collect()
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 20).collect()
    assert(lsh.nonEmpty && ivf.nonEmpty)
    (lsh ++ ivf).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(exact.contains(id), s"approximate hit $id is not in the corpus ranking")
      assert(exact(id) == r.getAs[Double]("cosine"),
        s"approximate cosine for $id must equal the exact score bit-for-bit")
    }
  }

  test("exact-int probe twins: candidates ⊆ exact-int brute force with identical values; plan broadcasts") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // full exact-int ranking of the corpus: any correct probe result is a
    // subset with BIT-IDENTICAL (dot, norm2) — same quantization, same fold
    val exact = Similarity.bruteForceTopKExactInt(emb, "vec_id", "embedding", 0L, 1000000)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("dot"), r.getAs[Long]("norm2")))).toMap
    val lsh = Similarity.lshTopKExactInt(emb, "vec_id", "embedding", 0L, 20)
    val ivf = Similarity.ivfTopKExactInt(emb, "vec_id", "embedding", 0L, 20)
    for ((name, df) <- Seq("lsh" -> lsh, "ivf" -> ivf)) {
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name probe returned no candidates")
      rows.foreach { r =>
        val id = r.getAs[Long]("vec_id")
        assert(exact.get(id).contains((r.getAs[Long]("dot"), r.getAs[Long]("norm2"))),
          s"$name hit $id must carry the exact integer scores")
      }
      // ranking within the result must be the exact-int cosine order
      def score(dot: Long, n2: Long) =
        if (n2 == 0L) 0.0 else dot.toDouble / (math.sqrt(n2.toDouble) * math.sqrt(exactQNorm))
      val ranked = rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dot"), r.getAs[Long]("norm2")))
      val resorted = ranked.sortBy { case (id, dot, n2) => (-score(dot, n2), id) }
      assert(ranked.toSeq === resorted.toSeq, s"$name result must be ranked by exact cosine, id tie-break")
      // the query side is a broadcast; the probe must never cartesian the corpus
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"$name probe must broadcast the query side:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name probe must not cartesian:\n$plan")
    }
  }

  test("exact-int probes quarantine NULL embeddings (sq8 contract): never candidates, never NULL scores") {
    import spark.implicits._
    // without the quarantine a NULL vector bands with sig 0 in ALL bands
    // (every sign test falls to otherwise(0)) / gets an arbitrary IVF
    // cell, and with k > |corpus| its NULL dot/norm2 rows reach the top-k
    val rows = (0L until 12L).map { i =>
      (i, Array.tabulate(4)(d => (((i * 7 + d * 3) % 11).toFloat - 5.0f) / 5.0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
      .union(Seq((99L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val lsh = Similarity.lshTopKExactInt(emb, "vec_id", "embedding", 0L, 100).collect()
    val ivf = Similarity.ivfTopKExactInt(emb, "vec_id", "embedding", 0L, 100).collect()
    for ((name, got) <- Seq("lsh" -> lsh, "ivf" -> ivf)) {
      assert(got.nonEmpty, s"$name returned nothing")
      assert(!got.exists(_.getAs[Long]("vec_id") == 99L),
        s"$name ranked the NULL-embedding row")
      assert(got.forall(r => !r.isNullAt(r.fieldIndex("dot")) && !r.isNullAt(r.fieldIndex("norm2"))),
        s"$name emitted NULL scores")
    }
  }

  private lazy val exactQNorm: Double = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val qv = emb.where(col("vec_id") === 0L).select("embedding").head()
      .getSeq[Float](0).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
    math.sqrt(qv.map(x => x * x).sum.toDouble)
  }

  test("trainIvf and Pq.train accept array<double> vector columns (the ADVICE r9 latent cast)") {
    // The probe expressions always accepted array<float|double>; the
    // driver-side samplers hard-cast to Seq[Float] until round 10. A
    // double-typed corpus must train without ClassCastException and
    // produce the same shapes as a float one.
    val dbl = Seq.tabulate(64)(i => (i.toLong, Array.tabulate(8)(j => (i * 8 + j).toDouble)))
      .toDF("id", "vec")
    assert(dbl.schema("vec").dataType.simpleString == "array<double>")
    val ivf = Similarity.trainIvf(dbl, "id", "vec", nlist = 4, sampleRows = 64)
    assert(ivf.centroids.length == 4 && ivf.dim == 8)
    val full = Similarity.trainIvfFull(dbl, "id", "vec", nlist = 4, iters = 2)
    assert(full.centroids.length == 4 && full.dim == 8)
    val cb = graft.operators.Pq.train(dbl, "id", "vec", m = 2, ksub = 4, sampleRows = 64)
    assert(cb.m == 2 && cb.ksub == 4 && cb.dim == 8)
  }

  test("trainIvfFull quarantines corrupt vectors from the Lloyd scans, both seed modes") {
    // without the Lloyd-side finiteVec filter, a NaN-element vector
    // deterministically assigns to cell 0 (NearestCentroidsExpr ranks
    // NaN +inf), flows through VectorSumAgg, and turns that centroid
    // all-NaN after one iteration — no finite row ever re-assigns there
    // and the index loses the cell forever (r16 third review pass)
    val clean = Seq.tabulate(32)(i =>
      (i.toLong, Array.tabulate(4)(j => ((((i * 7 + j * 3) % 11) - 5).toFloat))))
    val df = (clean.map { case (i, v) => (i, v.toSeq) } ++ Seq(
      (100L, Seq(Float.NaN, 1.0f, 2.0f, 3.0f)),
      (101L, null.asInstanceOf[Seq[Float]])))
      .toDF("id", "vec")
    for (scalable <- Seq(false, true)) {
      val idx = graft.operators.Similarity.trainIvfFull(
        df, "id", "vec", nlist = 4, iters = 3, scalableSeed = scalable)
      assert(idx.centroids.forall(_.forall(java.lang.Double.isFinite)),
        s"scalableSeed=$scalable: corrupt vectors must never pull a centroid")
    }
  }

  test("Pq.train's sample draw quarantines null and non-finite vectors (r16 advice pin)") {
    // the finiteVec quarantine every other driver-side trainer already
    // had: a NULL vector in the xxhash-ordered sample head NPEd the
    // collect, and a NaN/Inf element poisoned a sub-centroid whose ADC
    // distances then rank NaN/Inf — silently losing screen recall
    val clean = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(4)(j => (((i * 7 + j * 3) % 11) - 5).toFloat)))
    val df = (clean.map { case (i, v) => (i, v.toSeq) } ++ Seq(
      (100L, null.asInstanceOf[Seq[Float]]),
      (101L, Seq(Float.NaN, 1.0f, 2.0f, 3.0f)),
      (102L, Seq(Float.PositiveInfinity, 0.0f, 0.0f, 0.0f))))
      .toDF("id", "vec")
    val cb = graft.operators.Pq.train(df, "id", "vec", m = 2, ksub = 4, sampleRows = 64)
    assert(cb.codebooks.forall(_.forall(_.forall(java.lang.Double.isFinite))),
      "corrupt vectors must never define a PQ sub-centroid")
    assert(cb.m == 2 && cb.ksub == 4 && cb.dsub == 2)
  }

  test("Pq.train at ksub=256 keeps the codebook near-fully utilized (r15 sampling-starvation pin)") {
    // Pq.train floors its sample at 32 × ksub (8,192 rows here) — before
    // the floor, buildPqAuto's 4 × ksub callsite trained 256
    // sub-centroids per subspace from 1,024 rows (4 points each), and
    // Lloyd at that ratio leaves codes duplicated or starved: encoded
    // corpora collapse onto few distinct codes, quantization coarsens,
    // and the ADC screen silently loses recall. On a spread corpus the
    // trained codebook must stay near-fully ADDRESSED: encoding the
    // corpus uses most of the 256 codes in every subspace.
    val corpus = Seq.tabulate(9000) { i =>
      (i.toLong, Array.tabulate(8) { j =>
        (((i * 2654435761L + j * 40503L) % 1000L).toDouble / 500.0) - 1.0
      })
    }.toDF("id", "vec")
    val cb = graft.operators.Pq.train(corpus, "id", "vec", m = 2, ksub = 256)
    assert(cb.m == 2 && cb.ksub == 256 && cb.dsub == 4)
    val vecs = corpus.select("vec").collect().map(_.getSeq[Double](0).toArray)
    val flat = cb.codebooks.flatten.flatten
    for (sub <- 0 until cb.m) {
      val used = vecs.map { v =>
        graft.expressions.PqKernels.encode(v, flat, cb.m, cb.ksub, cb.dsub)(sub) & 0xFF
      }.distinct.length
      assert(used >= 192,
        s"subspace $sub uses only $used/256 codes — codebook training starved " +
          "(did the 32 × ksub sample floor regress?)")
    }
  }

  test("lshTopK returns k rows with nonzero recall vs brute force (the round-1 regression)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 20)
      .select("vec_id").as[Long].collect().toSet
    assert(lsh.size == 20, "LSH ANN must actually return k neighbors")
    assert(brute.intersect(lsh).nonEmpty, "LSH must recall some true neighbors")
  }

  test("ivfTopK returns k rows and recalls brute-force neighbors from probed cells") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 20, nlist = 16, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.size == 20)
    assert(brute.intersect(ivf).nonEmpty, "IVF must recall some true neighbors")
  }

  test("ivfTopK: k-means-trained cells give high recall on a clustered corpus") {
    // 4 well-separated clusters (block pattern + deterministic jitter); ids
    // interleave clusters so naive first-N seeding cannot accidentally win.
    val clustered = spark.range(1000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (when(i >= (col("id") % 4) * 16 && i < ((col("id") % 4) + 1) * 16, lit(10.0f))
          .otherwise(lit(0.0f)) +
          pmod(xxhash64(col("id"), i), lit(100)).cast("float") / 1000f).cast("float"))
        .as("embedding"))
    val brute = Similarity.bruteForceTopK(clustered, "vec_id", "embedding", 0L, 20)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(clustered, "vec_id", "embedding", 0L, 20, nlist = 8, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.size == 20)
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"clustered-corpus recall was $recall")
  }

  test("NearestCentroidsExpr matches a driver-side argmin/sort (incl. ties)") {
    // Direct parity check of the native expression against the semantics
    // the composed (struct-array + array_sort) form had: ascending L2²,
    // ties keep the lower cell index.
    import org.apache.spark.sql.graft.ColumnBridge
    val dim = 8
    val nlist = 16
    val centroids = Array.tabulate(nlist, dim)((c, i) => ((c * 31 + i * 7) % 13).toDouble)
    // cells 3 and 3+13=... make a tie: duplicate one centroid exactly.
    centroids(9) = centroids(3).clone()
    val flat = centroids.flatten.toIndexedSeq

    val rows = spark.range(200).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (pmod(xxhash64(col("id"), i), lit(13))).cast("float")).as("v"))
    def cells(n: Int) = ColumnBridge.column(graft.expressions.NearestCentroidsExpr(
      ColumnBridge.eagerExpression(col("v")), flat, dim, n))
    val got = rows.select(col("id"), cells(3).as("cells"), col("v")).collect()
    got.foreach { r =>
      val v = r.getSeq[Float](2).map(_.toDouble).toArray
      val dists = centroids.map(c => c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum)
      val expect = dists.zipWithIndex.sortBy { case (d, i) => (d, i) }.take(3).map(_._2).toSeq
      assert(r.getSeq[Int](1) == expect, s"id=${r.getLong(0)}")
    }
    // The duplicated centroid pair must order 3 before 9 on exact ties.
    val tieProbe = rows.select(cells(nlist).as("all")).head.getSeq[Int](0)
    assert(tieProbe.indexOf(3) < tieProbe.indexOf(9), "tie must keep the lower cell first")

    // Corrupt vectors: NaN distances rank as +infinity, so the result is
    // still nprobe DISTINCT cells (0,1,2 — ascending on the tie), never
    // nprobe copies of a default slot.
    val bad = spark.sql("SELECT array(cast('NaN' as float), 1.0f) AS v")
    val badCells = bad.select(ColumnBridge.column(graft.expressions.NearestCentroidsExpr(
      ColumnBridge.eagerExpression(col("v")), flat, dim, 3)).as("c")).head.getSeq[Int](0)
    assert(badCells == Seq(0, 1, 2), s"NaN vector must yield distinct cells, got $badCells")
  }

  test("ivfTopK at nlist=256 with full probing is exactly brute force") {
    // nprobe = nlist scans every cell, so the native-expression IVF path
    // must reproduce brute-force top-k bit-for-bit — an exactness gate on
    // the assignment expression at a production-shaped cell count.
    val emb = Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 20,
      nlist = 256, nprobe = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute, "full-probe IVF must equal brute force exactly")
  }

  test("IvfIndex: train once, save/load round-trip, identical search results") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val index = Similarity.trainIvf(emb, "vec_id", "embedding", nlist = 16)
    val first = Similarity.ivfSearch(index, emb, "vec_id", "embedding", 0L, 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // a second query against the SAME index probes the same cells —
    // deterministic, no retraining collect
    val again = Similarity.ivfSearch(index, emb, "vec_id", "embedding", 0L, 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again == first)

    // persistence: the index survives a restart as a tiny parquet table
    val path = java.nio.file.Files.createTempDirectory("ivf-idx").toString + "/idx"
    index.save(spark, path)
    val loaded = Similarity.IvfIndex.load(spark, path)
    assert(loaded.nlist == index.nlist && loaded.dim == index.dim)
    assert(loaded.centroids.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)
    val fromLoaded = Similarity.ivfSearch(loaded, emb, "vec_id", "embedding", 0L, 20, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromLoaded == first, "a reloaded index must serve identical results")
  }

  test("IvfIndex.save is atomic: a load racing a re-save always sees a complete index") {
    // Two valid generations of the index; a loader hammering the path while
    // the saver alternates between them must ALWAYS get one of the two,
    // complete — never a missing/partial table (the old delete-then-write
    // overwrite had exactly that window).
    val a = Similarity.IvfIndex(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val b = Similarity.IvfIndex(Array(Array(2.0, 2.0), Array(3.0, 3.0)))
    val path = java.nio.file.Files.createTempDirectory("ivf-swap").toString + "/idx"
    a.save(spark, path)
    val valid = Set(a.centroids.map(_.toSeq).toSeq, b.centroids.map(_.toSeq).toSeq)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val loader = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = Similarity.IvfIndex.load(spark, path)
          if (!valid.contains(got.centroids.map(_.toSeq).toSeq))
            failures.add(s"partial index: ${got.centroids.map(_.mkString(",")).mkString(";")}")
        } catch {
          case e: Throwable => failures.add(s"load failed mid-save: ${e.getMessage}")
        }
      }
    })
    loader.start()
    try (1 to 4).foreach { i => (if (i % 2 == 0) a else b).save(spark, path) }
    finally { stop.set(true); loader.join() }
    assert(failures.isEmpty, s"concurrent loads must never observe a partial index: ${failures.peek()}")
  }

  test("cosineNearDupPairs: identical-vector flood is keeper-starred, not quadratic") {
    val flood = spark.range(2000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), i => (i.cast("float") / 64f)).as("embedding"))
    val pairs = Similarity
      .cosineNearDupPairs(flood, "vec_id", "embedding", threshold = 0.9, maxBucket = 50)
      .collect()
    assert(pairs.length == 1999, "star pairs: one per non-keeper member")
    assert(pairs.forall(r => r.getAs[Long]("id_a") == 0L && r.getAs[Double]("cosine") == 1.0))
  }

  test("cosineNearDupPairs finds planted scaled copies (cosine = 1 up to fp error)") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val planted = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
    val pairs = Similarity
      .cosineNearDupPairs(emb.unionByName(planted), "vec_id", "embedding", threshold = 0.999)
      .collect()
    val found = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    (0L until 5L).foreach { i =>
      assert(found.contains((i, i + 1000L)), s"scaled copy of $i must be found")
    }
  }
}
