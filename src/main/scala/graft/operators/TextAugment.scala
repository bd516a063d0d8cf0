package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text augmentation for denoising-objective training data
  * (the T5 span-corruption recipe — Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning…", §3.1.4 — simplified to an unnumbered
  * sentinel and restated): every masking decision is a PURE FUNCTION of
  * `(id, position, seed)` through the injectable linear-mod-P hash
  * family (the q26c bridge), so re-runs, retries, and external engines
  * reproduce the corrupted corpus byte-for-byte — augmentation that
  * changes under recomputation silently breaks loss-curve comparisons
  * between runs that believe they trained on the same data.
  *
  * Everything is codegen'd array builtins over the token array — zero
  * shuffle, zero UDFs. Per-row cost is O(tokens · spanLen) for the
  * windowed mask test; spanLen is a small constant by construction.
  */
object TextAugment {

  val P: Long = 2147483647L
  val Mask = "<mask>"

  private def isStart(id: Column, j: Column, seed: Long, permille: Int): Column =
    pmod(id * 1103515245L + j * 12345L + seed, lit(P)) % 1000L < permille

  /** Independent per-token deletion at `dropPermille`/1000: the
    * word-dropout robustness augmentation. Deterministic per
    * (id, position, seed); emits the surviving tokens.
    */
  def tokenDropout(
      df: DataFrame, idCol: String, tokensCol: String,
      dropPermille: Int, seed: Long): DataFrame = {
    require(dropPermille >= 0 && dropPermille < 1000,
      s"dropPermille out of [0, 1000): $dropPermille")
    val toks = col(tokensCol)
    val n = size(toks)
    val pos = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))
    df.withColumn("kept_tokens",
      flatten(transform(pos, i =>
        when(isStart(col(idCol), i, seed, dropPermille), array())
          .otherwise(array(element_at(toks, i + 1))))))
  }

  /** SPAN CORRUPTION: positions where the hash fires open a mask span of
    * `spanLen` tokens (overlapping spans merge into one run). Each
    * maximal masked run collapses to ONE `<mask>` sentinel in
    * `input_tokens`; `target_tokens` carries the removed tokens with a
    * `<mask>` opener per run — the (input, target) pair a denoising
    * objective trains on. `n_masked` counts removed tokens, the
    * corruption-rate audit column.
    *
    * Expected corruption rate ≈ startPermille/1000 · spanLen (before
    * overlap merging) — tune `startPermille` down as `spanLen` grows.
    */
  def spanCorrupt(
      df: DataFrame, idCol: String, tokensCol: String,
      startPermille: Int, spanLen: Int, seed: Long): DataFrame = {
    require(startPermille >= 0 && startPermille < 1000,
      s"startPermille out of [0, 1000): $startPermille")
    require(spanLen >= 1, "spanLen must be positive")
    val toks = col(tokensCol)
    val id = col(idCol)
    val n = size(toks)
    val pos = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))
    def maskedAt(i: Column): Column =
      exists(sequence(greatest(lit(0), i - (spanLen - 1)), i),
        j => isStart(id, j, seed, startPermille))
    def prevMasked(i: Column): Column =
      i > 0 && exists(sequence(greatest(lit(0), i - spanLen), i - 1),
        j => isStart(id, j, seed, startPermille))
    // ONE per-position pass emits (input-part, target-part, masked-bit);
    // the parts array is then referenced only through a transform lambda
    // slot (the repetitionRatio single-eval discipline) so the O(n·L)
    // window test runs once per row, not once per consumer.
    val parts = transform(pos, i => {
      val tok = element_at(toks, i + 1)
      val m = maskedAt(i)
      val boundary = m && !prevMasked(i)
      struct(
        when(boundary, array(lit(Mask)))
          .when(m, array())
          .otherwise(array(tok)).as("inp"),
        when(boundary, array(lit(Mask), tok))
          .when(m, array(tok))
          .otherwise(array()).as("tgt"),
        m.cast("int").as("m"))
    })
    val packed = element_at(
      transform(array(parts), ps => struct(
        flatten(transform(ps, p => p.getField("inp"))).as("input_tokens"),
        flatten(transform(ps, p => p.getField("tgt"))).as("target_tokens"),
        aggregate(ps, lit(0L), (acc, p) => acc + p.getField("m")).as("n_masked"))),
      1)
    df.withColumn("input_tokens", packed.getField("input_tokens"))
      .withColumn("target_tokens", packed.getField("target_tokens"))
      .withColumn("n_masked", packed.getField("n_masked"))
  }
}
