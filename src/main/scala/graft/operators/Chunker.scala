package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Token-budget document chunking: split each document into fixed-size
  * overlapping token windows — the segmentation step between cleaning and
  * tokenizer/packing in a training-data pipeline (long documents must be
  * cut to the model's context budget; the overlap preserves cross-chunk
  * context so no span is seen only at a chunk boundary).
  *
  * Pure narrow dataflow: tokenize → per-row window arithmetic → explode.
  * No shuffle at ANY corpus size — chunking 100 TB is one scan emitting
  * chunk rows, and downstream packing ([[Partitioning.packByBudget]])
  * handles distribution. The token array is computed once per document
  * (pinned prep frame — higher-order lambdas would otherwise re-tokenize
  * per chunk under Catalyst's projection collapse; same discipline as
  * [[Dedup]]).
  */
object Chunker {

  /** One row per (document, chunk): (id, chunk_id, chunk_text, n_tokens).
    * Chunks start every `maxTokens - overlap` tokens and carry up to
    * `maxTokens` tokens; the last chunk may be shorter. A document within
    * budget yields exactly one chunk; a zero-token document (empty or
    * whitespace-only) yields one EMPTY chunk (doc coverage stays total —
    * dropping rows is a quality filter's decision, not the chunker's);
    * NULL text yields no chunks (undefined input, consistent with the
    * dedup family's null contract).
    */
  def chunk(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val step = maxTokens - overlap
    val toked = Caches.pin(
      Partitioning.spread(docs)
        .select(col(idCol).as("id"), text.tokens(col(textCol)).as("__toks")))
    val n = size(col("__toks")).cast("long")
    // ceil((n - maxTokens) / step) + 1 in integer arithmetic; 1 chunk when
    // the document fits the budget (including the zero-token edge)
    val nChunks =
      when(n <= maxTokens, lit(1L))
        .otherwise((n - maxTokens + (step - 1)).divide(step).cast("long") + 1L)
    toked
      .select(
        col("id"),
        col("__toks"),
        n.as("__n"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(
        col("id"),
        col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), (col("chunk_id") * step + 1L).cast("int"), lit(maxTokens)))
          .as("chunk_text"),
        least(lit(maxTokens.toLong), col("__n") - col("chunk_id") * step)
          .as("n_tokens"))
  }

  /** Chunk coverage invariantly holds: every token index of every
    * document appears in at least one chunk, consecutive chunks share
    * exactly `overlap` tokens (except a shorter final chunk). Exposed for
    * audits as a per-doc summary: (id, n_tokens, n_chunks,
    * covered_tokens) where covered_tokens counts distinct token positions
    * across chunks — equal to n_tokens by construction.
    */
  def coverage(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    val step = maxTokens - overlap
    chunk(docs, textCol, idCol, maxTokens, overlap)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_chunks"),
        max(col("chunk_id") * step + col("n_tokens")).as("covered_tokens"))
  }
}
