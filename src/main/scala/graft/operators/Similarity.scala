package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - `bruteForceTopK`: exact cosine top-k. The query side is a 1-row
  *    broadcast; the corpus streams map-side, then a single top-k sort
  *    (TakeOrderedAndProject — no full global sort materialization).
  *  - `lshTopK`: random-hyperplane LSH. Corpus is pre-bucketed by a
  *    multi-band signature; search probes only colliding buckets, so at
  *    1000 executors each query touches ~corpus/2^bits of the data instead
  *    of all of it. Recall is tunable via bands (more bands = more probes).
  */
object Similarity {

  /** Exact top-k by cosine against the embedding of `queryId`. */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int): DataFrame = {
    val q = emb
      .where(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    Partitioning.spread(emb)
      .join(broadcast(q))
      .where(col(idCol) =!= queryId)
      .select(
        col(idCol),
        vectors.cosine(col(vecCol), col("__qvec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Multi-band random-hyperplane LSH: `bands` independent signatures of
    * `bitsPerBand` hyperplanes each. Two vectors are candidates when ANY
    * band signature matches exactly. Returns top-k candidates by exact
    * cosine — recall < 1, cost ≈ corpus/2^bitsPerBand per band.
    *
    * Defaults are sized so expected bucket occupancy > 1 at the test scale
    * (2^8 = 256 buckets per band against a 10^3-row corpus): the round-1
    * defaults (bands=4, bits=12 → 4096 buckets) made every bucket a
    * singleton and the ANN query silently returned zero rows.
    *
    * `multiProbe` additionally probes every hamming-1 neighbor of each query
    * band signature (flip one hyperplane's vote). That multiplies only the
    * 1-row broadcast side by (1 + bitsPerBand) and recovers the neighbors
    * that fell just across a single hyperplane — the standard multi-probe
    * LSH recall boost for free at corpus scale.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      dim: Int = 64,
      bands: Int = 8,
      bitsPerBand: Int = 8,
      multiProbe: Boolean = true,
      seed: Long = 42L): DataFrame = {
    val bandPlanes = (0 until bands).map { b =>
      vectors.randomPlanes(bitsPerBand, dim, seed + b)
    }
    def signatures(df: DataFrame) = df.select(
      col(idCol),
      col(vecCol),
      explode(array(bandPlanes.zipWithIndex.map { case (planes, b) =>
        struct(lit(b).as("band"), vectors.lshSignature(col(vecCol), planes).as("sig"))
      }: _*)).as("bs"))
      .select(col(idCol), col(vecCol), col("bs.band"), col("bs.sig"))

    val corpus = signatures(Partitioning.spread(emb.where(col(idCol) =!= queryId)))
    val exactQuery = signatures(emb.where(col(idCol) === queryId))
      .select(col("band"), col("sig"), col(vecCol).as("__qvec"))
    val query =
      if (!multiProbe) exactQuery
      else exactQuery.select(
        col("band"),
        explode(array(
          (col("sig") +: (0 until bitsPerBand).map(p => col("sig").bitwiseXOR(lit(1L << p)))): _*))
          .as("sig"),
        col("__qvec"))

    corpus
      .join(broadcast(query), Seq("band", "sig"))
      .select(col(idCol), vectors.cosine(col(vecCol), col("__qvec")).as("cosine"))
      .groupBy(idCol)
      .agg(max("cosine").as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: corpus vectors are assigned to the nearest of `nlist`
    * coarse centroids; a query probes only its `nprobe` nearest cells and
    * brute-forces within them — the classic inverted-file scale path
    * (search cost ≈ corpus × nprobe/nlist instead of the full corpus).
    *
    * "Training" here is a deterministic stub — the first `nlist` vectors
    * serve as centroids, collected once to the driver and baked into the
    * assignment expression as literals (at real scale you'd k-means a
    * sample the same way; the collected centroid table is tiny either way,
    * and shipping it as plan literals broadcasts it for free). Cell
    * assignment, probe selection, and the in-cell scan are all plain
    * expressions — no shuffle beyond the final top-k.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val centroids: Array[Array[Double]] = emb
      .where(col(idCol) < nlist)
      .orderBy(idCol)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centroids.nonEmpty, s"not enough vectors with $idCol < $nlist to seed centroids")

    def cellDists(v: Column): Column = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(vectors.l2Sq(v, array(c.map(lit(_)): _*)).as("d"), lit(i).as("cell"))
    }: _*)
    def cellOf(v: Column): Column = array_min(cellDists(v)).getField("cell")
    def probesOf(v: Column): Column =
      transform(slice(array_sort(cellDists(v)), 1, nprobe), s => s.getField("cell"))

    val corpus = Partitioning.spread(emb.where(col(idCol) =!= queryId))
      .withColumn("__cell", cellOf(col(vecCol)))
    val q = emb
      .where(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), probesOf(col(vecCol)).as("__probes"))
    corpus
      .join(broadcast(q), array_contains(col("__probes"), col("__cell")))
      .select(col(idCol), vectors.cosine(col(vecCol), col("__qvec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near-duplicate detection by embedding cosine ≥ threshold,
    * LSH-blocked so the quadratic comparison only happens within buckets.
    */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      dim: Int = 64,
      bands: Int = 8,
      bitsPerBand: Int = 8,
      seed: Long = 42L): DataFrame = {
    // persist: both self-join sides read this — without the barrier the
    // full signature computation runs once per side.
    val banded = Partitioning.spread(emb).select(
      col(idCol).as("id"),
      col(vecCol).as("v"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          vectors.lshSignature(col(vecCol), vectors.randomPlanes(bitsPerBand, dim, seed + b)).as("sig"))
      }: _*)).as("bs"))
      .select(col("id"), col("v"), col("bs.band"), col("bs.sig"))
      .transform(Caches.pin)
    val a = banded.select(col("band"), col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = banded.select(col("band"), col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("band", "sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), vectors.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(max("cosine").as("cosine"))
  }
}
