package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016) —
  * the tokenizer-fitting stage of a pretraining pipeline. The reference
  * repo has no tokenizer stage; this is the standard extension that turns
  * the corpus layer ([[Filtering]] → [[Dedup]] → [[Chunker]]) into
  * model-ready token streams with a vocabulary fitted ON the corpus.
  *
  * Formulation: the "no end-of-word marker" variant — symbols start as
  * the word's characters, each merge round fuses the globally
  * most-frequent adjacent symbol pair (weighted by word frequency),
  * greedy left-to-right within a word, ties broken lexicographically on
  * (pair) so training is deterministic under any partitioning.
  * [[encode]] replays the merge list in training order, which keeps
  * encode exactly consistent with what training computed round by round.
  *
  * Scale contract: training never touches raw text after the ONE
  * word-frequency aggregation ([[wordFrequencies]] — map-side combine,
  * vocabulary-scale output); each merge round is one pair-keyed
  * aggregation over the vocabulary plus an O(1)-row argmax action, and
  * the symbol table is re-persisted per round with the previous round
  * unpersisted (every `checkpointEvery` rounds a localCheckpoint cuts
  * logical-plan lineage — on a real cluster, point
  * `spark.sparkContext.setCheckpointDir` at durable storage and swap in
  * `checkpoint()` if executor loss during training matters). The number
  * of Spark jobs is O(numMerges) by construction — that is BPE's
  * sequential nature, not an implementation artifact; each job is a
  * vocabulary-scale (not corpus-scale) shuffle. [[encode]] is a pure
  * per-row projection (zero shuffle), one nested fold per merge — fine
  * for the catalog-scale merge counts used here; a production tokenizer
  * with 10⁴⁺ merges would encode via a dedicated rank-priority
  * `mapPartitions` encoder instead (the documented last resort).
  */
object Bpe {

  /** Corpus word frequencies: (word, wf). The only corpus-scale pass. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(text.tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wf"))

  /** Character symbols of a word (code-point granularity, mirroring the
    * oracle's regex semantics for BMP text).
    */
  private def charSyms(word: Column): Column =
    regexp_extract_all(word, lit("."), lit(0))

  /** Round-0 symbol table for a (word, wf) frame: (syms, wf). */
  def initialSymbolTable(wordFreq: DataFrame): DataFrame =
    wordFreq.select(charSyms(col("word")).as("syms"), col("wf"))

  /** Weighted adjacent-pair counts over a symbol table (syms, wf):
    * (a, b, pair_wf), pair multiplicity within a word counted.
    */
  def pairCounts(symTable: DataFrame): DataFrame =
    symTable
      .select(
        col("wf"),
        explode(when(size(col("syms")) >= 2,
          transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(
              element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(sum("wf").as("pair_wf"))

  /** One greedy left-to-right merge pass of (a, b) → a+b over a symbol
    * array — the standard BPE within-word application (non-overlapping:
    * "aaa" under (a,a) → ["aa", "a"]).
    */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges over the corpus. Returns the merge list
    * in training order — the model IS this O(numMerges) list, so it lives
    * on the driver by design (the [[Similarity]] centroid precedent).
    * Rounds stop early when no pair reaches `minPairCount`.
    */
  def trainMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 1L,
      checkpointEvery: Int = 10): Seq[(String, String)] = {
    require(numMerges >= 1, "numMerges must be at least 1")
    require(minPairCount >= 1L, "minPairCount must be at least 1")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")
    var table = initialSymbolTable(wordFrequencies(docs, textCol)).persist()
    table.count()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = pairCounts(table)
        .where(col("pair_wf") >= minPairCount)
        .orderBy(col("pair_wf").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += ((a, b))
        val prev = table
        val merged = prev.select(mergeOnce(col("syms"), a, b).as("syms"), col("wf"))
        table =
          if ((round + 1) % checkpointEvery == 0) merged.localCheckpoint(true)
          else { val t = merged.persist(); t.count(); t }
        prev.unpersist()
        round += 1
      }
    }
    table.unpersist()
    merges.result()
  }

  /** Tokenize `textCol` with a trained merge list: one subword-array
    * column `subwords` per document (word boundaries never merged). Pure
    * projection — zero shuffle, no model join.
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame =
    docs.withColumn(
      "subwords",
      flatten(transform(text.tokens(col(textCol)),
        w => merges.foldLeft(charSyms(w))((c, m) => mergeOnce(c, m._1, m._2)))))
}
