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
}
