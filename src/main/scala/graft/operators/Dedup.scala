package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Document deduplication for training-data pipelines, at four fidelities:
  *
  *  1. exact        — canonical-hash groupBy (one shuffle on a 128-bit key)
  *  2. MinHash+LSH  — shingle → minhash sketch → banded bucket join
  *  3. SimHash      — 64-bit near-dup fingerprint, hamming-close pairs
  *  4. n-gram Jaccard — exact verification on candidate pairs only
  *
  * Scale design: the quadratic all-pairs comparison never happens. LSH
  * banding turns it into an equi-join on (band, bandHash) — the classic
  * MMDS ch.3 scheme — so cost is O(n·bands) shuffle + within-bucket pairs.
  * Sketches are computed with higher-order array expressions (codegen'd,
  * no UDF), embarrassingly parallel over input splits.
  */
object Dedup {

  /** Exact dedup on a canonical text hash. Deterministic keeper: min(id).
    * Output: one row per distinct content with its keeper id and copy count.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(text.fingerprintMd5(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("copies"))

  /** Exact dedup: keep exactly the keeper rows (min id per canonical hash). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keepers = exactGroups(df, textCol, idCol)
      .select(col("keeper_id").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  // --- MinHash ---

  /** 64-bit minhash sketch: element j = min over shingles of
    * xxhash64(shingle, seed_j). `numPerm` permutations approximate Jaccard
    * with stderr ≈ 1/sqrt(numPerm).
    */
  def minHashSketch(textC: Column, numPerm: Int, shingleK: Int = 3): Column =
    transform(
      sequence(lit(0), lit(numPerm - 1)),
      j => array_min(transform(text.shingles(textC, shingleK), s => xxhash64(s, j))))

  /** Banded LSH candidate pairs: split the sketch into `bands` bands of
    * rows = numPerm/bands, hash each band, and equi-join documents that
    * collide in any band. Output: (id_a, id_b, est_jaccard) with id_a < id_b,
    * distinct. est_jaccard = fraction of matching minhash positions.
    */
  def minHashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numPerm: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands evenly")
    val rows = numPerm / bands
    val sketched = df
      .select(col(idCol).as("id"), minHashSketch(col(textCol), numPerm, shingleK).as("mh"))
    // One row per (doc, band): bucket key = hash of that band's slice.
    val banded = sketched.select(
      col("id"),
      col("mh"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(concat_ws(",", slice(col("mh"), b * rows + 1, lit(rows)))).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("mh"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("mh").as("mh_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("mh").as("mh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (size(filter(zip_with(col("mh_a"), col("mh_b"), (x, y) => x === y), m => m))
          .cast("double") / numPerm).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      .agg(max("est_jaccard").as("est_jaccard"))
  }

  /** Exact word-shingle Jaccard verification over candidate pairs only.
    * `pairs` must have (id_a, id_b); texts are joined back in, so this is
    * two broadcast-able equi-joins + a per-row set computation.
    */
  def jaccardVerify(
      pairs: DataFrame,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(text.shingles(col(textCol), shingleK)).as("sh"))
    val withA = pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
    val withB = withA.join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    withB
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --- SimHash ---

  /** 64-bit SimHash over token hashes: bit i of the result is the majority
    * vote of bit i across all token xxhash64 values. Near-duplicate docs
    * land within a small hamming distance.
    */
  def simHash(textC: Column): Column = {
    // Dynamic shift amounts need the SQL shiftright/shiftleft (the Scala
    // helpers only take Int literals) — call_function reaches them.
    def shr(v: Column, n: Column): Column = call_function("shiftright", v, n)
    def shl(v: Column, n: Column): Column = call_function("shiftleft", v, n)
    val tokHashes = transform(text.tokens(textC), t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, i) => {
        val votes = aggregate(
          tokHashes,
          lit(0),
          (v, h) => v + when(shr(h, i).bitwiseAND(1L) === 1L, 1).otherwise(-1))
        acc + when(votes > 0, shl(lit(1L), i)).otherwise(lit(0L))
      })
  }

  /** SimHash near-dup pairs by 16-bit band blocking (hamming ≤ 3 across 4
    * bands guarantees at least one identical band — pigeonhole).
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val banded = sigs.select(
      col("id"),
      col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(3)),
          b => struct(
            b.as("band"),
            call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xffffL).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
