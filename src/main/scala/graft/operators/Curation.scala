package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** One-call corpus curation: the standard pretraining cleanup chain —
  *
  *   boilerplate strip → quality filter → exact dedup →
  *   decontamination → per-source keep cut
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
  * (prefer the sketch form off-pipeline for quota-free 100 TB cuts). No
  * intermediate corpus copy is ever materialized by the composition
  * itself; the boilerplate stage's common-line collection is the one
  * eager action ([[Boilerplate.stripCommonLines]]'s contract — it scans
  * `docs` once at composition time), so nondeterministic inputs follow
  * the standard pin-first rule.
  */
final case class CurationConfig(
    idCol: String = "doc_id",
    textCol: String = "text",
    sourceCol: String = "source",
    gopher: Option[Filtering.GopherThresholds] = Some(Filtering.GopherThresholds()),
    boilerplateMinDf: Option[Long] = None,
    exactDedup: Boolean = true,
    benchmark: Option[DataFrame] = None,
    benchTextCol: String = "text",
    contaminationN: Int = 13,
    maxContamination: Double = 0.05,
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
    cfg.gopher.foreach { th =>
      cur = Filtering.gopherFilter(cur, cfg.textCol, th)
    }
    if (cfg.exactDedup)
      cur = Dedup.exactDedup(cur, cfg.textCol, cfg.idCol)
    cfg.benchmark.foreach { bench =>
      cur = Decontaminate.clean(
        cur, cfg.textCol, cfg.idCol, bench, cfg.benchTextCol,
        cfg.contaminationN, cfg.maxContamination)
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
}
