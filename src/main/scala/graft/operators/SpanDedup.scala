package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Span-level exact substring dedup (the token-window form of Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models
  * Better"): document-level dedup ([[Dedup]]) misses the boilerplate a
  * crawl stamps INSIDE otherwise-unique pages — license footers,
  * navigation crumbs, quote chains — and training memorizes exactly
  * those repeated spans. This operator finds every `l`-token window
  * whose exact text occurs in ≥ `minDf` DISTINCT documents and strips
  * all tokens covered by any such window, keeping the unique remainder.
  *
  * Definitions (over [[text.tokens]] whitespace tokens, so the cleaned
  * text is whitespace-normalized):
  *  - window i (0-based) of a doc = tokens [i, i+l); its gram is the
  *    space-join (unambiguous: tokens contain no whitespace).
  *  - a window is REPEATED iff its gram appears in ≥ minDf distinct docs
  *    (multiplicity inside one doc alone does not flag it — that is
  *    [[graft.operators.Ranking.ngramNovelty]]'s self-similarity signal).
  *  - a token is dropped iff some repeated window covers it; covered
  *    spans merge transitively by overlap, exactly like the reference
  *    algorithm's span union.
  *
  * Output: (doc_id, clean_text, n_tokens, n_kept, n_dropped, n_windows)
  * — one row per input doc (null text: null clean_text, zero counts;
  * docs shorter than `l` have no windows and round-trip whole).
  *
  * Scale shape (the TF-IDF family): the gram pass explodes ~n windows
  * per doc and aggregates df with map-side combine — the one
  * corpus-token-scale exchange; the repeated-gram set filters BEFORE
  * the join back (left-semi on gram, AQE handles the skew that flagged
  * boilerplate is by definition); span union and reconstruction are
  * doc-keyed aggregations of surviving positions only. No all-pairs
  * anywhere; a 100× corpus scales each exchange linearly. The tokenized
  * prep is pinned ([[Caches.pin]]) — tokenize once, read thrice.
  */
object SpanDedup {

  def stripRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      minDf: Long = 2L): DataFrame = {
    require(l >= 1, "window length must be at least 1")
    require(minDf >= 2L, "minDf < 2 would flag every window of every doc")
    val toked = Caches.pin(
      Partitioning.spread(docs)
        .select(col(idCol).as("doc_id"), text.tokens(col(textCol)).as("__toks")))
    val n = size(col("__toks")).cast("long")

    // (doc_id, i, gram) for every window start i ∈ [0, n-l]
    val grams = toked
      .where(n >= l)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), n - l),
          i => concat_ws(" ", slice(col("__toks"), (i + 1L).cast("int"), lit(l))))))
      .toDF("doc_id", "i", "gram")

    // grams in ≥ minDf distinct docs. count_distinct, not count: within-
    // doc repetition must not flag (documented contract). The df pass is
    // the corpus-scale exchange; everything after runs on flagged data.
    val repeated = grams
      .groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("__df"))
      .where(col("__df") >= minDf)
      .select("gram")

    val flagged = Caches.pin(
      grams.join(repeated, Seq("gram"), "left_semi").select("doc_id", "i"))

    // positions covered by any flagged window (span union = DISTINCT)
    val covered = flagged
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (l - 1))).as("j"))
      .distinct()

    val keptAgg = toked
      .select(col("doc_id"), posexplode(col("__toks")).as(Seq("j", "tok")))
      .join(covered, Seq("doc_id", "j"), "left_anti")
      .groupBy("doc_id")
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("j"), col("tok")))),
            s => s.getField("tok"))).as("__clean"),
        count(lit(1)).as("__n_kept"))

    val windowCounts = flagged.groupBy("doc_id").agg(count(lit(1)).as("__n_windows"))

    toked
      .join(keptAgg, Seq("doc_id"), "left")
      .join(windowCounts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("__toks").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit(""))).as("clean_text"),
        coalesce(n, lit(0L)).as("n_tokens"),
        coalesce(col("__n_kept"), lit(0L)).as("n_kept"),
        (coalesce(n, lit(0L)) - coalesce(col("__n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("__n_windows"), lit(0L)).as("n_windows"))
  }

  /** Audit face: the flagged windows themselves — (doc_id, i, gram) of
    * every repeated `l`-window, the rows [[stripRepeatedSpans]] unions
    * into drops. Run it to eyeball WHAT is being stripped and tune
    * (l, minDf) before committing a strip.
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      minDf: Long = 2L): DataFrame = {
    require(l >= 1, "window length must be at least 1")
    require(minDf >= 2L, "minDf < 2 would flag every window of every doc")
    val toked = docs.select(col(idCol).as("doc_id"), text.tokens(col(textCol)).as("__toks"))
    val n = size(col("__toks")).cast("long")
    val grams = toked
      .where(n >= l)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), n - l),
          i => concat_ws(" ", slice(col("__toks"), (i + 1L).cast("int"), lit(l))))))
      .toDF("doc_id", "i", "gram")
    val repeated = grams
      .groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("__df"))
      .where(col("__df") >= minDf)
      .select("gram")
    grams.join(repeated, Seq("gram"), "left_semi")
      .select("doc_id", "i", "gram")
  }

  /** Memorization audit: the top-`k` most-repeated `l`-token windows of
    * the corpus — (gram, df, occurrences), df = distinct docs carrying
    * the window, ranked df desc / occurrences desc / gram asc. The
    * published memorization result (Lee et al. 2022; Carlini et al.
    * 2022) is that models regurgitate exactly these spans, so this list
    * IS the pre-training risk report: what a model trained on this
    * corpus will emit verbatim. Feed the offenders to
    * [[stripRepeatedSpans]]'s (l, minDf) tuning, or diff audits across
    * corpus versions to see new boilerplate arriving.
    *
    * Scale shape: one corpus-token-scale exchange (window grams with
    * map-side combine on (gram) carrying two partial counts), then the
    * bounded top-k (TakeOrderedAndProject — never a global sort). The
    * count_distinct over doc ids is the one honest cost; windows are
    * already doc-distinct-heavy, and the partial aggregation collapses
    * within-partition repeats before the wire.
    */
  def memorizationAudit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      k: Int): DataFrame = {
    require(l >= 1, "window length must be at least 1")
    require(k >= 1, "k must be positive")
    val toked = docs.select(col(idCol).as("doc_id"), text.tokens(col(textCol)).as("__toks"))
    val n = size(col("__toks")).cast("long")
    toked
      .where(n >= l)
      .select(
        col("doc_id"),
        explode(transform(
          sequence(lit(0L), n - l),
          i => concat_ws(" ", slice(col("__toks"), (i + 1L).cast("int"), lit(l)))))
          .as("gram"))
      .groupBy("gram")
      .agg(
        count_distinct(col("doc_id")).as("df"),
        count(lit(1)).as("occurrences"))
      .where(col("df") >= 2L)
      .orderBy(col("df").desc, col("occurrences").desc, col("gram"))
      .limit(k)
  }
}
