package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking
import graft.sources.Tables

/** TF-IDF / BM25 semantics on hand corpora plus the plan shapes the scale
  * story depends on. The `ln`-scored paths are validated here against
  * independent driver-side recomputations (same JVM ⇒ same `Math.log`
  * bits); the arithmetic-only twin (q51c) is hash-gated by the DuckDB
  * oracle instead.
  */
class RankingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge spark window join"),
    (2L, "merge merge merge table scan"),
    (3L, "window join scan scan scan scan"),
    (4L, "the the the the spark")).toDF("doc_id", "text")

  test("ngramNovelty: unique bigrams count as novel, shared ones don't") {
    val docs = Seq(
      (1L, "a b c"),        // bigrams: "a b", "b c"
      (2L, "a b x"),        // bigrams: "a b", "b x"
      (3L, "q")             // short doc: single shingle "q"
    ).toDF("doc_id", "text")
    val got = Ranking.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("sum_df"), r.getAs[Double]("novelty")))).toMap
    assert(got(1L) === ((2L, 1L, 3L, 0.5)))  // "a b" df=2, "b c" df=1
    assert(got(2L) === ((2L, 1L, 3L, 0.5)))
    assert(got(3L) === ((1L, 1L, 1L, 1.0)), "short docs shingle to their whole text")
  }

  test("ngramNovelty dedups within-doc repeats before counting df") {
    val docs = Seq(
      (1L, "a b a b a b"),  // bigrams repeat; distinct set: "a b","b a"
      (2L, "z z")
    ).toDF("doc_id", "text")
    val got = Ranking.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel")))).toMap
    assert(got(1L) === ((2L, 2L)), "within-doc repetition must not inflate df")
  }

  test("termFrequencies matches a naive driver-side tokenization") {
    val got = Ranking.termFrequencies(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    val expected = corpus.as[(Long, String)].collect().flatMap { case (id, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (term, xs) => (id, term, xs.length.toLong) }
    }.toSet
    assert(got === expected)
  }

  test("tfidfTopTerms (ln idf) equals an independent recomputation, including ties") {
    val k = 2
    val got = Ranking.tfidfTopTerms(corpus, "doc_id", "text", k)
      .select("doc_id", "term", "tf", "df", "score")
      .as[(Long, String, Long, Long, Double)].collect().toSet

    val rows = corpus.as[(Long, String)].collect()
    val n = rows.length.toDouble
    val tf = rows.flatMap { case (id, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (term, xs) => (id, term, xs.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (term, xs) => term -> xs.length.toLong }
    val expected = tf.map { case (id, term, f) =>
      (id, term, f, df(term), f.toDouble * math.log(n / df(term).toDouble))
    }.groupBy(_._1).values.flatMap(terms =>
      terms.sortBy(t => (-t._5, t._2)).take(k)).toSet
    assert(got === expected)
  }

  test("bm25 reproduces the formula on a hand corpus; absent-term docs are absent") {
    val k1 = 1.2; val b = 0.75
    val got = Ranking.bm25(corpus, "doc_id", "text", Seq("spark", "merge"), k1, b)
      .as[(Long, Double)].collect()

    val rows = corpus.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = rows.length.toDouble
    val avgdl = rows.map(_._2.length).sum.toDouble / n
    def dfOf(term: String) = rows.count(_._2.contains(term)).toDouble
    val expected = rows.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val ws = Seq("spark", "merge").flatMap { term =>
        val f = toks.count(_ == term).toDouble
        if (f == 0) None
        else {
          val df = dfOf(term)
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          Some(idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl / avgdl)))
        }
      }
      if (ws.isEmpty) None else Some(id -> ws.sum)
    }.toMap

    assert(got.map(_._1).toSet === expected.keySet, "doc 3 shares no term — must be absent")
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-12, s"doc $id: $s vs ${expected(id)}")
    }
    // descending with doc_id tiebreak
    assert(got.sortBy(r => (-r._2, r._1)).toSeq === got.toSeq)
  }

  test("bm25 plan broadcasts the query-term df side and IN-filters before the tf exchange") {
    val plan = Ranking.bm25(corpus, "doc_id", "text", Seq("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"df join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus-wide term join:\n$plan")
  }

  test("tfidfTopTerms runs on the bounded-heap native plan, not a window sort") {
    val plan = Ranking.tfidfTopTerms(corpus, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected the native top-k exec:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to row_number:\n$plan")
  }

  test("nondeterministic input: pinned per the stability contract, both actions agree") {
    // rand()-derived docs re-roll per job — the exact shape the scaladoc's
    // two-action contract (corpus-size scalar + scoring job) warns about.
    // Pinning fixes ONE materialization for both actions; tfidfTopTerms on
    // the pinned frame must then equal an independent recomputation on it.
    val wild = spark.range(500).select(
      col("id").as("doc_id"),
      concat(
        lit("alpha beta"),
        when(floor(rand(seed = 7) * 2) === 0, lit(" gamma")).otherwise(lit(" delta")))
        .as("text"))
    val pinned = graft.operators.Caches.pin(wild)
    try {
      val n = pinned.count()
      val tf = graft.operators.Ranking.termFrequencies(pinned, "doc_id", "text")
      val df = graft.operators.Ranking.documentFrequencies(tf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = graft.operators.Ranking.tfidfTopTerms(
        pinned, "doc_id", "text", k = 1,
        score = graft.operators.Ranking.ratioIdfScore)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"))).toMap
      // per-doc winner: the rarer of (gamma|delta) beats the universal terms
      // (tf all 1, score = n/df); consistency across the two actions means
      // the df map from action 1 predicts action 2's winners exactly
      val rarer = Seq("gamma", "delta").minBy(df.getOrElse(_, Long.MaxValue))
      val universal = df("alpha")
      assert(universal == n, "pinned frame: every doc carries alpha")
      got.foreach { case (_, term) =>
        assert(Seq("gamma", "delta").contains(term),
          s"winner must be a split term (df < $universal), got $term")
      }
      assert(got.values.count(_ == rarer) > 0, "the rarer split term wins somewhere")
    } finally pinned.unpersist()
  }

  test("bm25ExactRational: single-term ranking identical to float bm25 (monotone image)") {
    // with ONE query term the per-doc score is a single monotone image of
    // (tf, dl) in both variants — idf is a doc-independent positive factor
    // — so the full orderings must agree exactly (doc_id tiebreak shared);
    // multi-term orderings can legitimately differ (ln compresses relative
    // term weights), which is why q52c is its own catalog entry rather
    // than a bit-twin of q52
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val floatRank = graft.operators.Ranking.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val exactRank = graft.operators.Ranking.bm25ExactRational(docs, "doc_id", "text", Seq("spark"))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(floatRank == exactRank, "single-term orderings must match exactly")
    assert(floatRank.nonEmpty)
  }

  test("q51/q51c/q52 return sane results on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val lnTop = Queries.q51TfidfTopTerms.fn(spark, dir)
    assert(lnTop.groupBy("doc_id").count().agg(max("count")).head().getLong(0) <= 3)
    assert(lnTop.count() > 0)
    val ratioTop = Queries.q51cTfidfRatioExact.fn(spark, dir)
    assert(ratioTop.columns.toSeq ===
      Seq("doc_id", "term", "tf", "df", "score_ratio"))
    val bm = Queries.q52Bm25.fn(spark, dir).as[(Long, Double)].collect()
    assert(bm.length === 20)
    assert(bm.sortBy(r => (-r._2, r._1)).toSeq === bm.toSeq)
  }

  test("vocabStats: exact types/tokens/hapaxes per source, empty and null sources") {
    val docs = Seq(
      (Option("x"), "a b a"),   // x: tokens a:2 b:1 (+ c below)
      (Option("x"), "c"),
      (Option("empty"), "   "), // whitespace-only → zero tokens
      (Option.empty[String], "z z")
    ).toDF("source", "text")
    val got = Ranking.vocabStats(docs, "source", "text")
      .collect().map(r => Option(r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Double]("type_token_ratio"),
          r.getAs[Double]("hapax_ratio")))).toMap
    assert(got(Some("x")) === ((2L, 4L, 3L, 2L, 3.0 / 4.0, 2.0 / 3.0)))
    assert(got(Some("empty")) === ((1L, 0L, 0L, 0L, 0.0, 0.0)),
      "an all-empty source must report zeros, not vanish")
    assert(got(None) === ((1L, 2L, 1L, 0L, 1.0 / 2.0, 0.0)),
      "null sources are one real group")
  }

  test("rrfFuse: ranks, tie-break, missing-run nulls, fixed-order fused sum") {
    val runA = Seq((1L, 0.9), (2L, 0.8), (3L, 0.8)).toDF("doc_id", "score")
    val runB = Seq((3L, 0.5), (4L, 0.4)).toDF("doc_id", "score")
    val fused = Ranking.rrfFuse(Seq("a" -> runA, "b" -> runB), "doc_id", "score", k = 10)
    val rows = fused.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[Integer]("rank_a")).map(_.toInt),
          Option(r.getAs[Integer]("rank_b")).map(_.toInt),
          r.getAs[Double]("rrf"))))
      .toMap
    // score ties rank by id asc: doc 2 before doc 3 in run a
    assert(rows(2L)._1 === Some(2) && rows(3L)._1 === Some(3))
    // a doc absent from a run carries NULL for that run and no contribution
    assert(rows(1L) === ((Some(1), None, 1.0 / 61)))
    assert(rows(4L) === ((None, Some(2), 1.0 / 62)))
    // both-runs doc sums exactly, in run order
    assert(rows(3L) === ((Some(3), Some(1), 1.0 / 63 + 1.0 / 61)))
    // fused ordering: doc 3 (two runs) first
    assert(fused.collect().head.getAs[Long]("doc_id") === 3L)
    // the ranking must NOT ride a global window (the single-partition trap)
    assert(!fused.queryExecution.executedPlan.toString.contains("Window"),
      "rrfFuse must rank bounded runs without a Window operator")
    // a NULL-score row is ABSENT from its run, never rank 1: every
    // comparison against NULL is NULL, so without the filter the
    // scoreless doc would count zero better rows and steal the top rank
    val withNull = Seq((1L, Some(0.9)), (9L, Option.empty[Double])).toDF("doc_id", "score")
    val nf = Ranking.rrfFuse(Seq("a" -> withNull), "doc_id", "score", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[Integer]("rank_a"))).toMap
    assert(nf(1L) === Some(1) && nf.get(9L).forall(_.isEmpty),
      s"scoreless docs must contribute nothing, got $nf")
  }

  test("rrfFuse: a duplicate id inside one run keeps its best score and never multiplies rows") {
    // doc 1 appears twice in run a (0.9 and 0.3): it ranks by 0.9 and
    // emits ONE fused row; doc 2's rank counts doc 1 once, not twice
    val runA = Seq((1L, 0.9), (1L, 0.3), (2L, 0.5)).toDF("doc_id", "score")
    val runB = Seq((1L, 0.7)).toDF("doc_id", "score")
    val fused = Ranking.rrfFuse(Seq("a" -> runA, "b" -> runB), "doc_id", "score", k = 10)
    val rows = fused.collect()
    assert(rows.length === 2, s"duplicate ids must not multiply through the full-outer join")
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Integer]("rank_a").toInt, r.getAs[Double]("rrf")))).toMap
    assert(byId(1L)._1 === 1 && byId(2L)._1 === 2)
    assert(byId(1L)._2 === 1.0 / 61 + 1.0 / 61)
  }

  test("evalRun: hand-computed metrics incl. ndcg; zero-hit and zero-judgment queries report zeros") {
    // q1: run [d10(r1), d20(r2), d30(r3)]; relevant: d20 g2, d30 g1, d99 g3 (unretrieved)
    // q2: run [d40(r1)]; no relevant docs at all
    // q3: run [d50(r1)]; relevant d60 g1 only (zero hits, nonzero judgments)
    val run = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 40L, 1),
      (3L, 50L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 20L, 2), (1L, 30L, 1), (1L, 99L, 3),
      (3L, 60L, 1)).toDF("query_id", "doc_id", "grade")
    val out = graft.operators.Ranking.evalRun(run, qrels, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // q1@2: hits = {d20@2}; rr = 1/2; dcg = (2^2−1)/log2(3); idcg = grades
    // 3,2 at ranks 1,2 = 7/1 + 3/log2(3)
    val dcg = 3.0 / lg2(3.0)
    val idcg = 7.0 / lg2(2.0) + 3.0 / lg2(3.0)
    val (nRel1, hits1, p1, r1, rr1, nd1) = out(1L)
    assert((nRel1, hits1, p1, r1, rr1) === ((3L, 1L, 0.5, 1.0 / 3.0, 0.5)))
    assert(math.abs(nd1 - dcg / idcg) < 1e-12, s"ndcg: $nd1 vs ${dcg / idcg}")
    assert(out(2L) === ((0L, 0L, 0.0, 0.0, 0.0, 0.0)), "no judgments → all zeros, row present")
    assert(out(3L) === ((1L, 0L, 0.0, 0.0, 0.0, 0.0)), "zero hits → zeros with n_rel reported")
  }

  test("evalRun ndcg matches a driver mirror on the q120 fixture") {
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val run = d.where(col("doc_id") < 200).select(
      (col("doc_id") % 20).as("query_id"), col("doc_id"),
      (expr("doc_id div 20") + 1).cast("int").as("rank"))
    val qrels = d.where(col("doc_id") % 3 === 0).select(
      (col("doc_id") % 20).as("query_id"), col("doc_id"),
      (expr("(doc_id div 20) % 3") + 1).cast("int").as("grade"))
    val k = 5
    val got = graft.operators.Ranking.evalRun(run, qrels, k)
      .select("query_id", "ndcg_k").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent driver mirror
    val runRows = run.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val relRows = qrels.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val byQ = runRows.map(_._1).distinct.map { q =>
      val rel = relRows.filter(_._1 == q).map(t => t._2 -> t._3).toMap
      val dcg = runRows.filter(t => t._1 == q && t._3 <= k)
        .filter(t => rel.contains(t._2))
        .map(t => (math.pow(2.0, rel(t._2)) - 1.0) / lg2(t._3 + 1.0)).sum
      val idcg = rel.toSeq.sortBy { case (d0, g) => (-g, d0) }.take(k).zipWithIndex
        .map { case ((_, g), i) => (math.pow(2.0, g) - 1.0) / lg2(i + 2.0) }.sum
      q -> (if (idcg > 0) dcg / idcg else 0.0)
    }.toMap
    for ((q, nd) <- byQ)
      assert(math.abs(got(q) - nd) < 1e-12, s"query $q: ${got(q)} vs $nd")
    assert(byQ.values.exists(_ > 0) && byQ.values.exists(_ < 1.0),
      "fixture must exercise non-trivial ndcg values")
  }
}
