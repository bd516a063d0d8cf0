package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic random projection (Johnson–Lindenstrauss with ±1 signs,
  * Achlioptas 2003) — the dimensionality-reduction stage in front of
  * embedding ANN/dedup: a d-dim corpus projects to k ≪ d dims with
  * pairwise distances preserved within (1 ± ε), ε ≈ √(ln n / k), and
  * every downstream index ([[AnnIndex]], [[Similarity]]) gets k-dim
  * vectors to bucket and scan.
  *
  * No materialized projection matrix anywhere: the sign s(i, j) of
  * output dim i × input dim j is a pure function of (i, j, seed), so the
  * operator is a per-row projection — zero shuffle, zero broadcast, no
  * driver state, reproducible across runs/retries/engines by
  * construction (the [[graft.operators.Partitioning.hashSplit]]
  * determinism contract, applied to a matrix).
  *
  * Components are computed over ×10⁶ floor-quantized integer inputs, so
  * each output component is an EXACT integer sum — order-free under any
  * partitioning, and (with the [[linearSign]] family, whose modular
  * arithmetic any SQL engine reproduces) hash-gateable against an ANSI
  * oracle (q85). The default [[xxhashSign]] family mixes better and is
  * the production face (q85b; spec-gated — xxhash64 is not in DuckDB).
  *
  * Scale: per-row cost O(k · d) inside whole-stage codegen HOFs; a
  * 100 TB embedding table projects in one map stage that scales with
  * input splits. Quantization: |component error| ≤ d/10⁶ per dim —
  * negligible against unit-norm embeddings; [[descale]] returns to
  * doubles including the 1/√k JL normalizer.
  */
object Projection {

  /** ±1 sign from xxhash64(seed, i, j) parity — well-mixed, the default. */
  def xxhashSign(seed: Long)(i: Column, j: Column): Column =
    when(pmod(xxhash64(lit(seed), i, j), lit(2L)) === 0L, lit(1L)).otherwise(lit(-1L))

  /** ±1 sign from a 2-universal linear form mod a prime:
    * +1 iff ((A·i + B·j + seed) mod P) is in the lower half of [0, P).
    * Weaker mixing than xxhash but exactly reproducible in ANSI SQL —
    * the oracle face. All products stay far below 2⁶³.
    */
  val LinearA = 1103515245L
  val LinearB = 12345L
  val LinearP = 2147483647L
  def linearSign(seed: Long)(i: Column, j: Column): Column = {
    require(seed >= 0L, "linearSign needs a non-negative seed")
    when((lit(LinearA) * i + lit(LinearB) * j + lit(seed)) % lit(LinearP) * 2L < lit(LinearP),
      lit(1L)).otherwise(lit(-1L))
  }

  /** Project `vecCol` (array<float|double>) to `k` integer components:
    * (idCol…, proj array<long>) where proj[i] = Σⱼ s(i,j)·⌊10⁶·v[j]⌋.
    * A null vector projects to a null array.
    */
  def project(
      vecs: DataFrame,
      vecCol: String,
      k: Int,
      sign: (Column, Column) => Column): DataFrame = {
    require(k >= 1, "target dimensionality must be positive")
    val qv = transform(col(vecCol),
      v => floor(v.cast("double") * lit(1000000.0)).cast("long"))
    vecs.withColumn(
      "proj",
      when(col(vecCol).isNull, lit(null).cast("array<bigint>"))
        // empty vector: the sum over no inputs is 0 per output dim (and
        // sequence(0, -1) would otherwise step backwards into element 0)
        .when(size(col(vecCol)) === 0,
          transform(sequence(lit(0L), lit(k - 1L)), _ => lit(0L)))
        .otherwise(transform(
          sequence(lit(0L), lit(k - 1L)),
          i => aggregate(
            sequence(lit(0L), size(col(vecCol)).cast("long") - 1L),
            lit(0L),
            (acc, j) => acc + sign(i, j) * element_at(qv, (j + 1L).cast("int"))))))
  }

  /** The integer projection back in JL-normalized doubles:
    * proj[i] / (10⁶ · √k) — the array downstream cosine/ANN consumes.
    */
  def descale(projected: DataFrame, k: Int): DataFrame =
    projected.withColumn(
      "proj",
      transform(col("proj"), y => y.cast("double") / lit(1e6 * math.sqrt(k.toDouble))))
}
