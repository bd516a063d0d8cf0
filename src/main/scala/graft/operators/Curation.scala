package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** One-call corpus curation: the standard pretraining cleanup chain —
  *
  *   boilerplate strip → stutter collapse → span strip → quality filter
  *   → exact dedup → decontamination → fluency (LM) cut → per-source
  *   keep cut
  *
  * — composed from the individually-gated stage operators, in the order
  * the stages depend on each other (stripping changes the text every
  * later signal reads; dedup must see cleaned text or trivially-equal
  * chrome survives; the keep cut runs last so quotas apply to what's
  * actually shippable). Every stage is optional via [[CurationConfig]];
  * a disabled stage is a no-op, not an identity scan.
  *
  * Scale contract: the composition adds NOTHING to the stages' own
  * costs — quality filtering fuses into the scan as a plain `where`,
  * dedup is one fingerprint aggregation + semi-join, decontamination is
  * a broadcast semi-join (zero corpus-side shuffle), and the keep cut is
  * the one window exchange [[Filtering.topFractionBySource]] documents
  * (prefer the sketch form off-pipeline for quota-free 100 TB cuts).
  * When the tail of the chain references the filtered frame three or
  * more times (dedup + decontamination/fluency — each is a two-sided
  * consumer), the composition pins the survivors ONCE (disk-spillable,
  * released via [[Caches.release]]) instead of re-running the
  * tokenize-heavy filters per reference; a single-consumer tail never
  * materializes a corpus copy. The boilerplate stage's common-line
  * collection is the one eager action ([[Boilerplate.stripCommonLines]]'s
  * contract — it scans `docs` once at composition time), so
  * nondeterministic inputs follow the standard pin-first rule.
  */
final case class CurationConfig(
    idCol: String = "doc_id",
    textCol: String = "text",
    sourceCol: String = "source",
    gopher: Option[Filtering.GopherThresholds] = Some(Filtering.GopherThresholds()),
    compressionBounds: Option[(Double, Double)] = None,
    boilerplateMinDf: Option[Long] = None,
    collapseTokenRuns: Boolean = false,
    spanStripWindow: Option[Int] = None,
    spanStripMinDf: Long = 2L,
    exactDedup: Boolean = true,
    benchmark: Option[DataFrame] = None,
    benchTextCol: String = "text",
    contaminationN: Int = 13,
    maxContamination: Double = 0.05,
    fluencyModel: Option[DataFrame] = None,
    fluencyHeadFraction: Double = 0.3,
    fluencyMiddleFraction: Double = 0.4,
    keepTopFraction: Option[Double] = None)

object Curation {

  /** Run the configured stages over `docs`. Output: the surviving rows
    * with the original schema — except that when the boilerplate stage
    * is on, `textCol` holds the CLEANED text and an `n_lines_dropped`
    * audit column is appended (the raw text is consumed, not carried;
    * a pipeline that wants both should join back on `idCol`).
    */
  def run(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    var cur = docs
    cfg.boilerplateMinDf.foreach { minDf =>
      cur = Boilerplate
        .stripCommonLines(cur, cfg.textCol, minDf)
        .withColumn(cfg.textCol, col("text_clean"))
        .drop("text_clean")
    }
    if (cfg.collapseTokenRuns)
      // stutter collapse rewrites the text like the strip stages (and
      // runs before quality signals judge it); zero shuffle — it fuses
      // into whatever scan follows
      cur = cur.withColumn(cfg.textCol, text.collapseRunsText(col(cfg.textCol)))
    cfg.spanStripWindow.foreach { l =>
      // span strip rewrites the text (like the boilerplate stage) and
      // appends an `n_span_tokens_dropped` audit column; it runs BEFORE
      // quality signals so they judge the de-boilerplated text
      val stripped = SpanDedup
        .stripRepeatedSpans(cur, cfg.idCol, cfg.textCol, l, cfg.spanStripMinDf)
        .select(
          col("doc_id").as("__sd_id"),
          col("clean_text"),
          col("n_dropped").as("n_span_tokens_dropped"))
      // null-safe key: a null-id doc must be rewritten, not silently
      // dropped by the join (the stage's rewrite-never-drop contract)
      cur = cur
        .join(stripped, cur(cfg.idCol) <=> col("__sd_id"))
        .drop("__sd_id")
        .withColumn(cfg.textCol, col("clean_text"))
        .drop("clean_text")
    }
    cfg.gopher.foreach { th =>
      cur = Filtering.gopherFilter(cur, cfg.textCol, th)
    }
    cfg.compressionBounds.foreach { case (lo, hi) =>
      // compressibility window: below lo is boilerplate loops, above hi
      // is noise/base64 — both ends cut; judges the CLEANED text like
      // every quality signal, and fuses into the scan as a plain where.
      // coalesce(false): NULL text is unscorable and always fails — a
      // bare `where(NULL)` would drop it too, but the audited twin must
      // ledger it, so both paths share one explicit rule
      cur = cur.where(coalesce(
        Quality.deflateRatio(col(cfg.textCol)).between(lo, hi), lit(false)))
    }
    // Pin the filtered survivors ONCE before a multi-consumer tail: the
    // dedup semi-join evaluates its input twice (keeper aggregate + the
    // kept side), decontamination twice more (the pinned shingle pass and
    // the keep join) — unpinned, the tokenize-heavy quality filters above
    // re-run per reference (~4 full passes measured in the r20 q81
    // probe). One disk-spillable materialization replaces those
    // re-evaluations (guide §5: reused AND expensive to recompute);
    // released via Caches.release like every operator pin. A single-
    // consumer tail (e.g. dedup alone) keeps the zero-copy contract — two
    // cheap-filter evaluations beat materializing the corpus.
    val tailRefs =
      (if (cfg.exactDedup) 2 else 0) +
        (if (cfg.benchmark.nonEmpty) 2 else 0) +
        (if (cfg.fluencyModel.nonEmpty) 2 else 0)
    if (tailRefs >= 3) cur = Caches.pin(cur)
    if (cfg.exactDedup)
      cur = Dedup.exactDedup(cur, cfg.textCol, cfg.idCol)
    cfg.benchmark.foreach { bench =>
      cur = Decontaminate.clean(
        cur, cfg.textCol, cfg.idCol, bench, cfg.benchTextCol,
        cfg.contaminationN, cfg.maxContamination)
    }
    cfg.fluencyModel.foreach { model =>
      // CCNet LM stage: pooled-likelihood score, per-source head/middle/
      // tail cut, tail dropped. Docs without a single token transition
      // (< 2 tokens) are unscorable and are dropped with the tail — the
      // quality filter ahead of this stage normally removes them anyway.
      val scored = NgramLm
        .pooledLikelihood(cur, model, cfg.idCol, cfg.textCol, 1L, 1L)
        .select(
          col("doc_id").as("__fl_id"),
          (col("num_mass").cast("double") / col("den_mass").cast("double")).as("__fl_score"))
      cur = Filtering
        .scoreBucketsBySource(
          cur.join(scored, cur(cfg.idCol) <=> col("__fl_id")).drop("__fl_id"),
          cfg.sourceCol, cfg.idCol, "__fl_score",
          cfg.fluencyHeadFraction, cfg.fluencyMiddleFraction)
        .where(col("bucket") =!= "tail")
        .drop("bucket", "__fl_score")
    }
    cfg.keepTopFraction.foreach { f =>
      cur = Filtering
        .topFractionBySource(
          cur.withColumn("__score", text.tokenCount(col(cfg.textCol)).cast("long")),
          cfg.sourceCol, cfg.idCol, "__score", f)
        .drop("__score")
    }
    cur
  }

  /** [[run]] with a drop ledger: returns (kept, ledger) where `ledger`
    * is one row per DROPPED document — (idCol, stage, reason) — naming
    * the stage that killed it (`gopher` rows carry the failing rule
    * names; the rest carry the stage name). Rewrite stages (boilerplate,
    * span strip) drop nothing and appear only through their audit
    * columns on `kept`. The operations answer to "where did my corpus
    * go": Σ ledger per stage + kept = input, provable per run.
    *
    * Cost contract: each filtering stage pays ONE extra id-keyed
    * anti/semi join over [[run]] (the audit is a real dataflow, not a
    * log); the gopher stage reuses its report scan for both verdicts and
    * reasons. Null ids are not supported here — the id is the ledger
    * key ([[run]] itself has no such restriction).
    */
  def runAudited(docs: DataFrame, cfg: CurationConfig = CurationConfig()): (DataFrame, DataFrame) = {
    var cur = docs
    var ledgers = List.empty[DataFrame]
    def drops(before: DataFrame, after: DataFrame, stage: String): DataFrame =
      before.select(col(cfg.idCol))
        .join(after.select(col(cfg.idCol)), Seq(cfg.idCol), "left_anti")
        .select(col(cfg.idCol), lit(stage).as("stage"), lit(stage).as("reason"))

    cfg.boilerplateMinDf.foreach { minDf =>
      cur = Boilerplate
        .stripCommonLines(cur, cfg.textCol, minDf)
        .withColumn(cfg.textCol, col("text_clean"))
        .drop("text_clean")
    }
    if (cfg.collapseTokenRuns)
      cur = cur.withColumn(cfg.textCol, text.collapseRunsText(col(cfg.textCol)))
    cfg.spanStripWindow.foreach { l =>
      val stripped = SpanDedup
        .stripRepeatedSpans(cur, cfg.idCol, cfg.textCol, l, cfg.spanStripMinDf)
        .select(
          col("doc_id").as("__sd_id"),
          col("clean_text"),
          col("n_dropped").as("n_span_tokens_dropped"))
      cur = cur
        .join(stripped, cur(cfg.idCol) <=> col("__sd_id"))
        .drop("__sd_id")
        .withColumn(cfg.textCol, col("clean_text"))
        .drop("clean_text")
    }
    cfg.gopher.foreach { th =>
      // ONE report scan yields both the verdict and the failing-rule list
      val rep = Filtering.gopherReport(cur, cfg.idCol, cfg.textCol, th)
      val ruleNames = Filtering.rules(th, col).map(_._1)
      val failed = concat_ws(",",
        ruleNames.map(n => when(!col(n), lit(n))): _*)
      ledgers ::= rep.where(!col("passes"))
        .select(col(cfg.idCol), lit("gopher").as("stage"), failed.as("reason"))
      cur = cur.join(
        rep.where(col("passes")).select(col(cfg.idCol)), Seq(cfg.idCol), "left_semi")
    }
    cfg.compressionBounds.foreach { case (lo, hi) =>
      // evaluation-count note: ProjectCollapse inlines __cr into every
      // use site (2 in each filter, +1 in the reason), so the audit path
      // pays a few DEFLATE passes per row — acceptable for the opt-in
      // ledger (BEST_SPEED deflate is microseconds per doc); the run()
      // path's single `where` stays at ~2 per row. A persist barrier
      // here would cost more than it saves at stage granularity.
      // `ok` is coalesced so NULL-text rows fail EXPLICITLY and land in
      // the ledger as unscorable — a bare !between(NULL) is NULL, which
      // skipped them in BOTH filters and broke the kept + dropped =
      // input invariant (review, round 12)
      val withRatio = cur.withColumn(
        "__cr", Quality.deflateRatio(col(cfg.textCol)))
      val ok = coalesce(col("__cr").between(lo, hi), lit(false))
      ledgers ::= withRatio.where(!ok)
        .select(col(cfg.idCol), lit("compression").as("stage"),
          when(col("__cr").isNull, lit("unscorable"))
            .when(col("__cr") < lo, lit("too_compressible"))
            .otherwise(lit("incompressible")).as("reason"))
      cur = withRatio.where(ok).drop("__cr")
    }
    if (cfg.exactDedup) {
      val before = cur
      cur = Dedup.exactDedup(cur, cfg.textCol, cfg.idCol)
      ledgers ::= drops(before, cur, "exact_dup")
    }
    cfg.benchmark.foreach { bench =>
      val before = cur
      cur = Decontaminate.clean(
        cur, cfg.textCol, cfg.idCol, bench, cfg.benchTextCol,
        cfg.contaminationN, cfg.maxContamination)
      ledgers ::= drops(before, cur, "contaminated")
    }
    cfg.fluencyModel.foreach { model =>
      val before = cur
      val scored = NgramLm
        .pooledLikelihood(cur, model, cfg.idCol, cfg.textCol, 1L, 1L)
        .select(
          col("doc_id").as("__fl_id"),
          (col("num_mass").cast("double") / col("den_mass").cast("double")).as("__fl_score"))
      cur = Filtering
        .scoreBucketsBySource(
          cur.join(scored, cur(cfg.idCol) <=> col("__fl_id")).drop("__fl_id"),
          cfg.sourceCol, cfg.idCol, "__fl_score",
          cfg.fluencyHeadFraction, cfg.fluencyMiddleFraction)
        .where(col("bucket") =!= "tail")
        .drop("bucket", "__fl_score")
      ledgers ::= drops(before, cur, "fluency_tail")
    }
    cfg.keepTopFraction.foreach { f =>
      val before = cur
      cur = Filtering
        .topFractionBySource(
          cur.withColumn("__score", text.tokenCount(col(cfg.textCol)).cast("long")),
          cfg.sourceCol, cfg.idCol, "__score", f)
        .drop("__score")
      ledgers ::= drops(before, cur, "quota_cut")
    }
    val emptyLedger = docs
      .select(col(cfg.idCol), lit("").as("stage"), lit("").as("reason"))
      .where(lit(false))
    (cur, ledgers.foldLeft(emptyLedger)(_ unionByName _))
  }
}
