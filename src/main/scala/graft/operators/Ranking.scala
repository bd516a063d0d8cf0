package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Corpus-statistics relevance ranking: TF-IDF term extraction and BM25
  * document scoring over the tokenized corpus.
  *
  * Scale shape, by stage:
  *
  *   term frequencies   explode + groupBy(doc, term): ONE shuffle, and
  *                      partial aggregation collapses each task's repeats
  *                      before the exchange — the wire carries distinct
  *                      (doc, term) pairs, not token instances.
  *   document freqs     derived from the tf frame (already one row per
  *                      (doc, term)): groupBy(term).count — no DISTINCT
  *                      pass, no second tokenization.
  *   tf-idf join        tf ⋈ df on term: vocabulary-sized right side, so
  *                      at corpus scale this is the sort-merge join it
  *                      should be; the per-doc top-k then runs on the
  *                      bounded-heap native plan ([[graft.plans.TopK]]),
  *                      never a full per-doc sort.
  *   BM25               the query has a handful of terms, and the filter
  *                      `term IN (query)` is applied BEFORE any shuffle —
  *                      the tf exchange carries only matching rows, the
  *                      query-side df is ≤ |query| rows and explicitly
  *                      broadcast (plan-asserted). Scoring a 100 TB corpus
  *                      against a query is one filtered scan + one tiny
  *                      broadcast, NOT a corpus-wide term join.
  *
  * STABILITY NOTE: [[tfidfTopTerms]] and [[bm25]] read `docs` in two
  * actions (corpus-size scalar + the scoring job). Same contract as
  * `Frequency.heavyHitters`: nondeterministic frames must be pinned first.
  */
object Ranking {

  /** (doc_id, term, tf) — lower-cased whitespace tokens (same tokenizer as
    * the q47 heavy-hitter family).
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(text.tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (term, df) — number of docs containing the term, derived from the tf
    * frame so the corpus is tokenized exactly once.
    */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  /** Standard tf·ln(N/df) scoring. */
  val lnIdfScore: (Column, Column, Column) => Column =
    (tf, df, n) => tf * log(n / df)

  /** Oracle-exact variant: (tf·N)/df uses only IEEE +,*,/ — bit-identical
    * across engines, unlike `ln` (last-ulp implementation-defined), so a
    * query using it can be hash-compared against an ANSI oracle. Same
    * ranking intent (monotone in tf, anti-monotone in df), different
    * scale.
    */
  val ratioIdfScore: (Column, Column, Column) => Column =
    (tf, df, n) => tf * n / df

  /** Top-k terms per document by `score(tf, df, N)` (desc, term asc) via
    * the bounded-heap top-k plan. Output: doc_id, term, tf, df, score.
    */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      score: (Column, Column, Column) => Column = lnIdfScore): DataFrame = {
    val n = docs.count()
    val tf = termFrequencies(docs, idCol, textCol)
    val df = documentFrequencies(tf)
    val scored = tf.join(df, "term")
      .select(
        col("doc_id"), col("term"), col("tf"), col("df"),
        score(col("tf").cast("double"), col("df").cast("double"), lit(n.toDouble))
          .as("score"))
    graft.plans.TopK.perKey(
      scored, Seq("doc_id"), Seq(col("score").desc, col("term").asc), k)
  }

  /** BM25 document scores for a bag-of-terms query (Robertson/Spärck
    * Jones): per matching (doc, term),
    *
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *   w(d, t)  = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * summed per doc, descending (doc_id tiebreak). Documents sharing no
    * term with the query are absent (their score is 0 by definition).
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val terms = query.map(_.toLowerCase)
    val tokenized = docs.select(
      col(idCol).as("doc_id"),
      text.tokens(lower(col(textCol))).as("toks"))
    val stats = tokenized.agg(
      count(lit(1)).as("n"), avg(size(col("toks"))).as("avgdl")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getDouble(1)

    // IN-filter before the (doc, term) exchange: only query-term tokens
    // ever shuffle
    val tf = tokenized
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = documentFrequencies(tf.select("doc_id", "term", "tf"))

    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(df), "term")
      .select(col("doc_id"), (idf * tfNorm).as("w"))
      .groupBy("doc_id")
      .agg(sum(col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Corpus n-gram novelty: how much of each document's n-gram set is
    * unique to it — the self-similarity signal pretraining pipelines use
    * to find boilerplate/template farms that per-document quality scores
    * (q21) and pairwise dedup (q25) both miss. Per document, over its
    * DISTINCT word n-grams ([[text.shingles]], the q34 shingle
    * definition):
    *
    *   n_grams  — distinct n-grams in the doc
    *   n_novel  — those occurring in NO other doc (corpus df = 1)
    *   sum_df   — Σ corpus df (the "how templated" integral signal)
    *   novelty  — n_novel / n_grams (one correctly-rounded division of
    *              exact longs — hash-comparable across engines)
    *
    * Scale shape: the TF-IDF pipeline's (explode + groupBy + enrich-join
    * + doc rollup). The gram→df join is 1:1 enrichment whose LEFT side is
    * skewed by construction (every doc has "of the"); that is exactly the
    * shape AQE's skew-join split handles (the df side is replicable), and
    * the gram frame is derived once — same pin-first stability contract
    * as the rest of this object.
    */
  def ngramNovelty(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    require(n > 0, "n-gram size must be positive")
    val grams = docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(text.shingles(lower(col(textCol)), n))).as("gram"))
    val gramDf = grams.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    grams.join(gramDf, "gram")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("gram_df") === 1L, 1L).otherwise(0L)).as("n_novel"),
        sum(col("gram_df")).as("sum_df"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** ORACLE-EXACT BM25 twin at fixed k1 = 6/5, b = 3/4 (the [[bm25]]
    * defaults): the same plan shape and the same monotone ranking intent,
    * but every per-term weight is a ratio of two EXACT integers, so both
    * engines compute bit-identical doubles with ONE correctly-rounded
    * division each (the q51c trick, applied to BM25's harder shape):
    *
    *  - `ln(1 + (N−df+0.5)/(df+0.5))` → the rational `(2N−2df+1)/(2df+1)`
    *    (monotone image of the same idf argument, so ranking intent holds);
    *  - `avgdl = D/N` never materializes as a float: multiplying the
    *    tf-normalization through by `10·D` clears k1, b AND avgdl at once:
    *      w(d,t) = (2N−2df+1)·22·tf·D /
    *               ((2df+1)·(10·tf·D + 3·D + 9·dl·N))
    *    with D = Σ dl. All products stay far under 2^53 (D ≈ 10⁶ tokens ×
    *    tf ≤ 10³ × N ≤ 10⁶ would still fit);
    *  - per-doc summation never runs float addition in shuffle order: the
    *    ≤|query| weights pivot into fixed columns (exactly one (doc,term)
    *    row each, so `max` is selection, not arithmetic) and add in QUERY
    *    ORDER — the one float expression both engines evaluate identically.
    *
    * Output: (doc_id, score), descending (doc_id tiebreak).
    */
  def bm25ExactRational(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String]): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val terms = query.map(_.toLowerCase).distinct
    val tokenized = docs.select(
      col(idCol).as("doc_id"),
      text.tokens(lower(col(textCol))).as("toks"))
    val stats = tokenized.agg(
      count(lit(1)).as("n"), sum(size(col("toks")).cast("long")).as("d")).head()
    val n = stats.getLong(0)
    val dTot = stats.getLong(1)

    val tf = tokenized
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    bm25RationalScores(tf, terms, n, dTot)
  }

  /** The exact-rational BM25 core shared by [[bm25ExactRational]] and
    * [[TextIndex.searchTopK]]: scores a (doc_id, dl, term, tf) frame for
    * the DISTINCT lower-cased `terms` given corpus row count `n` and
    * total token mass `dTot`. Per-term document frequencies are derived
    * from the frame itself (one row per (doc, term), so a plain count),
    * weights are single correctly-rounded divisions of exact integers,
    * and the per-doc sum adds ≤|terms| pivoted columns in QUERY order —
    * every float op identical across engines. Output: (doc_id, score)
    * descending (doc_id tiebreak).
    */
  private[graft] def bm25RationalScores(
      tf: DataFrame,
      terms: Seq[String],
      n: Long,
      dTot: Long,
      requireAll: Boolean = false): DataFrame = {
    val df = documentFrequencies(tf.select("doc_id", "term", "tf"))
    val num = (lit(2L * n) - lit(2L) * col("df") + lit(1L)) * lit(22L) * col("tf") * lit(dTot)
    val den = (lit(2L) * col("df") + lit(1L)) *
      (lit(10L) * col("tf") * lit(dTot) + lit(3L * dTot) + lit(9L) * col("dl") * lit(n))
    val perTerm = tf.join(broadcast(df), "term")
      .select(col("doc_id"), col("term"), (num.cast("double") / den.cast("double")).as("w"))
    val pivoted = perTerm.groupBy("doc_id").agg(
      max(when(col("term") === terms.head, col("w"))).as(s"__w0"),
      terms.tail.zipWithIndex.map { case (t, i) =>
        max(when(col("term") === t, col("w"))).as(s"__w${i + 1}")
      }: _*)
    val gated =
      if (requireAll)
        // conjunctive (AND) search: every pivoted weight present — the
        // filter runs on the candidate-sized pivot, never the corpus
        pivoted.where(terms.indices.map(i => col(s"__w$i").isNotNull).reduce(_ && _))
      else pivoted
    gated
      .select(
        col("doc_id"),
        terms.indices.map(i => coalesce(col(s"__w$i"), lit(0.0))).reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Per-source vocabulary statistics — the corpus-health dashboard row
    * curation pipelines watch: type count (distinct terms), token mass,
    * hapax count (terms seen exactly once — crawl noise and OCR garbage
    * inflate it), type/token ratio (lexical diversity; template farms
    * score low), hapax/type ratio. Output: (source, n_docs, n_tokens,
    * n_types, n_hapax, type_token_ratio, hapax_ratio); a source whose
    * documents are all empty reports zeros, null sources form one real
    * group (mirrored in the oracle with IS NOT DISTINCT FROM).
    *
    * Scale contract: the term-stats branch is the [[termFrequencies]]
    * shape keyed by (source, term) — map-side combine collapses token
    * instances to distinct pairs before the only data-sized exchange —
    * and the rollup to source cardinality rides a second, tiny exchange.
    * The doc-count branch is a separate scan of `docs` (token explosion
    * loses empty documents, and a union-sentinel to avoid the rescan
    * would widen every token row for a count's sake); both branches feed
    * ONE action, but a nondeterministic `docs` should be pinned first —
    * the standard multi-pass contract ([[Frequency]]).
    */
  def vocabStats(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val perSource = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val termStats = docs
      .select(col(sourceCol).as("source"), explode(text.tokens(col(textCol))).as("term"))
      .groupBy("source", "term")
      .agg(count(lit(1)).as("tf"))
    val vocab = termStats
      .groupBy(col("source").as("__vsrc"))
      .agg(
        count(lit(1)).as("__n_types"),
        sum("tf").as("__n_tokens"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("__n_hapax"))
    perSource
      .join(broadcast(vocab), col("source") <=> col("__vsrc"), "left")
      .select(
        col("source"),
        col("n_docs"),
        coalesce(col("__n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("__n_types"), lit(0L)).as("n_types"),
        coalesce(col("__n_hapax"), lit(0L)).as("n_hapax"))
      .withColumn("type_token_ratio",
        when(col("n_tokens") > 0L,
          col("n_types").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("hapax_ratio",
        when(col("n_types") > 0L,
          col("n_hapax").cast("double") / col("n_types").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** 1-based COMPETITION rank (standard "1224" ranking: 1 + the number
    * of strictly-better rows under score desc, id asc tie-break — the id
    * tie-break makes ranks distinct, so here it coincides with a row
    * number) of each row in a BOUNDED top-k run, computed by a self-join
    * count instead of a window: a global `Window.orderBy` funnels
    * everything through ONE partition, and while that is harmless at k
    * rows it would rot into a scale bug the first time someone feeds a
    * corpus-sized frame. The O(k²) join is the honest contract — it is
    * only correct-size for runs that are already top-k lists, which is
    * the only input [[rrfFuse]] accepts.
    */
  private def rankRun(run: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    // NULL scores are ABSENT from the run, not rank-1: every comparison
    // against NULL evaluates NULL, so the self-join would count zero
    // better rows and hand a scoreless doc the top rank (and rrfFuse the
    // maximal contribution) — caught by review in round 11. A doc with
    // no score made no retrieval claim; it contributes nothing.
    //
    // A duplicate id keeps only its BEST score (max_by semantics via
    // groupBy/max): a run that repeats an id would otherwise both skew
    // every worse row's count and MULTIPLY rows through rrfFuse's
    // full-outer join with no loud failure (round-12 advice). The guard
    // is one k-sized aggregate — free at top-k scale.
    val scored = run.where(col(scoreCol).isNotNull)
      .groupBy(col(idCol).as("__gid"))
      .agg(max(col(scoreCol)).as("__gs"))
    val a = scored.select(col("__gid").as("__id"), col("__gs").as("__s"))
    val b = scored.select(col("__gid").as("__bid"), col("__gs").as("__bs"))
    a.join(b,
        col("__bs") > col("__s") ||
          (col("__bs") === col("__s") && col("__bid") < col("__id")),
        "left")
      .groupBy(col("__id"))
      .agg((count(col("__bid")) + 1L).cast("int").as("__rank"))
  }

  /** Reciprocal-rank fusion of N ranked retrieval runs (Cormack et al.:
    * score(d) = Σ_runs 1/(k₀ + rank_run(d))) — the standard way to serve
    * hybrid keyword+vector search without score calibration, since only
    * RANKS cross the fusion boundary and BM25/cosine magnitudes never
    * mix. Each input is a (id, score) TOP-K run (driver-bounded by its
    * own limit — [[graft.operators.TextIndex.searchTopK]],
    * [[Similarity.bruteForceTopKExactInt]], an ANN probe); documents
    * missing from a run contribute nothing for it. Emits one row per
    * distinct id: per-run ranks (`rank_<name>`, NULL when absent) and
    * the fused `rrf` score, top `k` by rrf desc (id asc tie-break).
    *
    * Determinism, the oracle-facing contract: ranks are exact integers,
    * and the fused sum is a FIXED left-to-right chain of
    * `coalesce(1/(k₀+rank), 0)` terms in run order — never a SUM
    * aggregate whose accumulation order floats — so the emitted double
    * is the same correctly-rounded value on any engine. All joins are
    * k-sized; nothing corpus-sized enters the fusion.
    */
  def rrfFuse(
      runs: Seq[(String, DataFrame)],
      idCol: String,
      scoreCol: String,
      k: Int,
      k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(runs.map(_._1).distinct.size == runs.size, "run names must be distinct")
    require(k > 0 && k0 > 0, "k and k0 must be positive")
    val ranked = runs.map { case (name, run) =>
      rankRun(run, idCol, scoreCol)
        .select(col("__id").as(idCol), col("__rank").as(s"rank_$name"))
    }
    val joined = ranked.reduce((l, r) => l.join(r, Seq(idCol), "full_outer"))
    val rrf = runs.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k0).cast("double") + col(s"rank_$name").cast("double")), lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Retrieval-quality evaluation of a ranked run against judgments —
    * the closing loop of the serving stack (build → probe → fuse →
    * MEASURE): per query, reciprocal rank, hits/precision/recall at k,
    * and nDCG@k with exponential gains.
    *
    * Inputs: `run` carries (queryCol, docCol, rankCol) with rank 1-based
    * and unique per query; `qrels` carries (queryCol, docCol, gradeCol),
    * grade > 0 meaning relevant, ONE judgment per (query, doc) — a
    * duplicate judgment would inflate n_rel and double-count its hit
    * through the join (dropDuplicates upstream if your qrels can carry
    * revisions). Every query present in the run reports
    * a row — zero-hit queries with zeros, and a query with NO relevant
    * judgments reports recall 0 BY DEFINITION HERE (not NULL: a monitor
    * summing recall over queries must not silently skip them).
    *
    * Exactness split (the q51 tfidf discipline): rr, precision_k,
    * recall_k are ratios of small integers — bit-identical on any
    * engine, the q120 oracle face. ndcg_k divides by log2 (libm-
    * dependent last-ulp), so it rides the SAME row under a driver-mirror
    * spec instead of the SQL oracle; the DCG sum is a per-query
    * aggregation of ≤ k terms whose accumulation order Spark does not
    * guarantee — RankingSpec pins value agreement at 1e-12, not bit
    * equality.
    *
    * Scale: both inputs group/join on the query key only — run rows are
    * k-bounded per query by contract, qrels are judgment-sized; nothing
    * corpus-sized enters. One join + three query-keyed aggregates.
    */
  def evalRun(
      run: DataFrame,
      qrels: DataFrame,
      k: Int,
      queryCol: String = "query_id",
      docCol: String = "doc_id",
      rankCol: String = "rank",
      gradeCol: String = "grade"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val rel = qrels.where(col(gradeCol) > 0)
      .select(col(queryCol).as("__q"), col(docCol).as("__d"), col(gradeCol).as("__g"))
    val nRel = rel.groupBy("__q").agg(count(lit(1)).as("n_rel"))
    val r = run.select(
      col(queryCol).as("__q"), col(docCol).as("__d"), col(rankCol).as("__r"))
    val gain = pow(lit(2.0), col("__g").cast("double")) - lit(1.0)
    val disc = log2(col("__r").cast("double") + lit(1.0))
    val hitsAgg = r.join(rel, Seq("__q", "__d"))
      .groupBy("__q")
      .agg(
        sum(when(col("__r") <= k, 1L).otherwise(0L)).as("hits_k"),
        min("__r").as("__first"),
        sum(when(col("__r") <= k, gain / disc).otherwise(lit(0.0))).as("__dcg"))
    // ideal DCG: the query's grades sorted descending occupy ranks 1..k
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy("__q").orderBy(col("__g").desc, col("__d"))
    val idcg = rel.withColumn("__ir", row_number().over(iw))
      .where(col("__ir") <= k)
      .groupBy("__q")
      .agg(sum(
        (pow(lit(2.0), col("__g").cast("double")) - lit(1.0)) /
          log2(col("__ir").cast("double") + lit(1.0))).as("__idcg"))
    r.select("__q").distinct()
      .join(hitsAgg, Seq("__q"), "left")
      .join(nRel, Seq("__q"), "left")
      .join(idcg, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits_k"), lit(0L)).as("hits_k"),
        (coalesce(col("hits_k"), lit(0L)).cast("double") / k).as("precision_k"),
        when(coalesce(col("n_rel"), lit(0L)) > 0L,
          coalesce(col("hits_k"), lit(0L)).cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0)).as("recall_k"),
        when(col("__first").isNotNull, lit(1.0) / col("__first").cast("double"))
          .otherwise(lit(0.0)).as("rr"),
        when(coalesce(col("__idcg"), lit(0.0)) > 0.0,
          coalesce(col("__dcg"), lit(0.0)) / col("__idcg"))
          .otherwise(lit(0.0)).as("ndcg_k"))
  }
}
