package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** DSIR-style data selection via hashed-feature importance weights
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every crawl document by how much more likely its
  * features are under a TARGET corpus (the distribution you want more
  * of — curated reference text) than under the SOURCE corpus (the raw
  * crawl), then keep the docs whose importance ratio clears a threshold.
  * This is the principled upgrade over binary quality classification
  * ([[Classifier]]): the weight is a likelihood RATIO, so it ranks "how
  * target-like", not just "is reference".
  *
  * Features are HASHED unigram buckets — the defining DSIR trait: the
  * model is a fixed `buckets`-sized table regardless of corpus
  * vocabulary, so at 100 TB both models broadcast (a few KB) and scoring
  * is one map-side join; an unhashed vocabulary model would be
  * corpus-sized state. The bucket hash is the INJECTABLE linear family
  * (the q26c/q85 move): a 31-multiplier byte polynomial mod the
  * [[Projection.LinearP]] prime, mod `buckets` — pure integer
  * arithmetic an external SQL engine rebuilds byte-for-byte, which is
  * what makes the whole path oracle-gateable (production pipelines can
  * swap in xxhash64 with one column swap; the mechanics are identical).
  *
  * Scoring is the LOG-FREE pooled face (the q82c move — exact integer
  * masses instead of float log-sums, so nothing depends on summation
  * order): with add-one-smoothed bucket models
  *
  *   num_mass = Σ_tokens (ct(bucket) + 1)        — target-model mass
  *   den_mass = Σ_tokens (cs(bucket) + 1)        — source-model mass
  *   importance = (num_mass · (CS + B)) / (den_mass · (CT + B))
  *
  * where CT/CS are the models' total counts and B = buckets (the
  * Laplace normalizers). The masses are exact longs; `importance` is a
  * fixed-shape product/quotient of exact integers, hence the same
  * correctly-rounded double on any engine. True DSIR exponentiates a
  * per-token log-ratio sum; the pooled ratio is the same
  * target-vs-source contrast with exact arithmetic — the trade every
  * oracle-gated float family in this repo makes (q82c, q80c).
  *
  * Overflow contract: `num_mass ≤ n_tokens_per_doc · (CT + 1)` must fit
  * a long — at 2⁶³ that allows a 10⁶-token doc against a 10¹²-token
  * target model; shard the model count scale before that (counts can be
  * downsampled uniformly — only the ratio matters).
  */
object Importance {

  /** Hashed feature bucket of one token: 31-polynomial over the token's
    * UTF-8 bytes mod [[Projection.LinearP]], mod `buckets` — shared
    * verbatim with the DuckDB oracle of q106.
    */
  def bucketOf(tok: Column, buckets: Int): Column = {
    require(buckets >= 2, "need at least 2 feature buckets")
    val bin = encode(tok, "UTF-8")
    def byteAt(i: Column): Column =
      conv(hex(bin.substr(i, lit(1))), 16, 10).cast("long")
    aggregate(
      transform(sequence(lit(1), octet_length(bin)), i => byteAt(i)),
      lit(0L),
      (acc, b) => (acc * 31L + b) % Projection.LinearP) % buckets
  }

  /** Hashed-unigram bucket model of a corpus: (bucket, cnt) — at most
    * `buckets` rows, ONE hash exchange with map-side combine. Broadcast
    * this into [[pooledImportance]]; persist it like any other model
    * artifact for reuse across scoring runs.
    */
  def hashedBucketCounts(corpus: DataFrame, textCol: String, buckets: Int): DataFrame =
    Partitioning.spread(corpus)
      .select(explode(text.tokens(col(textCol))).as("__w"))
      .select(bucketOf(col("__w"), buckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Corpus drift monitor: the `k` hashed buckets whose token-mass SHARE
    * moved most between two corpus versions — the report that flags a
    * crawl-distribution shift (a new boilerplate flood, a source gone
    * dark, a language mix change) BEFORE a training run pays for it.
    * Same fixed-size bucket models as [[pooledImportance]], so the
    * monitor costs two corpus scans and a `buckets`-row join regardless
    * of vocabulary; diff the persisted models instead to make it a
    * KB-scale comparison with no rescan at all.
    *
    * Output: (bucket, old_cnt, new_cnt, old_share, new_share, delta),
    * top `k` by |delta| desc (bucket asc tie-break). Counts exact longs;
    * shares one correctly-rounded division each (0.0 for an empty
    * corpus), so the ranking is engine-reproducible. Buckets absent from
    * one side count 0 there — appearing and vanishing ARE drift.
    */
  def driftReport(
      oldCorpus: DataFrame,
      newCorpus: DataFrame,
      textCol: String,
      buckets: Int,
      k: Int): DataFrame =
    driftReportFromModels(
      hashedBucketCounts(oldCorpus, textCol, buckets),
      hashedBucketCounts(newCorpus, textCol, buckets),
      k)

  /** [[driftReport]] over PREBUILT bucket models (each a
    * [[hashedBucketCounts]] frame) — the no-rescan face: persisted
    * models are KB-scale, so diffing last month's crawl against this
    * month's costs two tiny scans, and a streaming monitor can hold the
    * baseline fixed while batches flow ([[graft.streaming.Streams
    * .driftMonitorIngest]]).
    */
  def driftReportFromModels(
      oldModel: DataFrame,
      newModel: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    def share(cnt: Column, tot: Column): Column =
      when(tot === 0L, lit(0.0)).otherwise(cnt.cast("double") / tot.cast("double"))
    val o = oldModel.select(col("bucket"), col("cnt").as("old_cnt"))
    val n = newModel.select(col("bucket"), col("cnt").as("new_cnt"))
    val oTot = o.agg(coalesce(sum("old_cnt"), lit(0L)).as("__ot"))
    val nTot = n.agg(coalesce(sum("new_cnt"), lit(0L)).as("__nt"))
    val oldShare = share(col("old_cnt"), col("__ot"))
    val newShare = share(col("new_cnt"), col("__nt"))
    o.join(n, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("old_cnt"), lit(0L)).as("old_cnt"),
        coalesce(col("new_cnt"), lit(0L)).as("new_cnt"))
      .crossJoin(broadcast(oTot))
      .crossJoin(broadcast(nTot))
      .select(
        col("bucket"), col("old_cnt"), col("new_cnt"),
        oldShare.as("old_share"), newShare.as("new_share"),
        (newShare - oldShare).as("delta"))
      .orderBy(abs(col("delta")).desc, col("bucket"))
      .limit(k)
  }

  /** Per-doc pooled importance vs a `target` and `source` bucket model
    * (both from [[hashedBucketCounts]] with the SAME `buckets`):
    * (doc_id, num_mass, den_mass, importance, selected). Docs with no
    * tokens (null/empty text) emit zero masses, importance 0.0,
    * selected false — present, never dropped.
    *
    * `selected` is `importance >= threshold` on the deterministic
    * double; with the masses themselves hash-gated, the boolean is
    * reproducible anywhere the double is.
    *
    * Scale shape: models broadcast (≤ `buckets` rows each); scoring is
    * explode → broadcast-join → one doc-keyed exchange with map-side
    * partial sums (no (doc, bucket) pre-aggregation — the per-token
    * masses sum directly), plus the doc-keyed join back to the full doc
    * list that re-adds zero-token rows without rescanning text. Two
    * doc-keyed exchanges total; drop the join-back (and the zero-token
    * rows) if the id list itself is the 100 TB bottleneck.
    */
  def pooledImportance(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      source: DataFrame,
      buckets: Int,
      threshold: Double = 1.0): DataFrame = {
    val tTot = target.agg(coalesce(sum("cnt"), lit(0L)).cast("long").as("__ct_tot"))
    val sTot = source.agg(coalesce(sum("cnt"), lit(0L)).cast("long").as("__cs_tot"))
    val masses = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"), explode(text.tokens(col(textCol))).as("__w"))
      .select(col("doc_id"), bucketOf(col("__w"), buckets).as("bucket"))
      .join(broadcast(target.select(col("bucket"), col("cnt").as("__ct"))), Seq("bucket"), "left")
      .join(broadcast(source.select(col("bucket"), col("cnt").as("__cs"))), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(
        sum(coalesce(col("__ct"), lit(0L)) + 1L).as("num_mass"),
        sum(coalesce(col("__cs"), lit(0L)) + 1L).as("den_mass"))
    val importance =
      when(coalesce(col("den_mass"), lit(0L)) === 0L, lit(0.0))
        .otherwise(
          (col("num_mass").cast("double") * (col("__cs_tot") + buckets).cast("double")) /
            (col("den_mass").cast("double") * (col("__ct_tot") + buckets).cast("double")))
    docs.select(col(idCol).as("doc_id"))
      .join(masses, Seq("doc_id"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(sTot))
      .select(
        col("doc_id"),
        coalesce(col("num_mass"), lit(0L)).as("num_mass"),
        coalesce(col("den_mass"), lit(0L)).as("den_mass"),
        importance.as("importance"),
        (importance >= threshold).as("selected"))
  }
}
