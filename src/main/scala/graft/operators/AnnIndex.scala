package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.vectors
import graft.operators.Similarity.IvfIndex

/** Persistable IVF embedding index — the production shape of similarity
  * search, and the vector twin of [[DedupIndex]]. [[Similarity.ivfSearch]]
  * answers "what is near this query in THIS frame" and re-lands corpus
  * vectors on every call; a training-data pipeline instead receives
  * embedding batches forever and must answer "is this NEW embedding near
  * anything already accepted" without rescanning the accepted corpus.
  * This module persists the two artifacts the IVF pipeline computes — the
  * trained coarse quantizer (tiny, driver-side) and the cell-assigned
  * vector postings (corpus-sized, on disk) — so each incoming batch pays
  * O(batch + probed-cell postings), never O(corpus):
  *
  *   1. [[build]]/[[append]] — assign a batch's vectors to their coarse
  *      cell once and land them as a new immutable `batch=<label>`
  *      partition of the postings table (atomic rename; readers see the
  *      whole batch or none of it).
  *   2. [[crossNeighbors]] — probe a new batch against the index: the
  *      batch's probed-cell set broadcast-semi-joins the postings scan
  *      (map-side pruning, the corpus side never shuffles), survivors are
  *      verified by exact cosine on the stored vectors.
  *   3. [[dedupBatch]] — end-to-end acceptance: drop batch vectors that
  *      near-duplicate the corpus, then near-dedup the rest among
  *      themselves.
  *
  * On-disk layout under `path` (plain parquet, engine-agnostic):
  * {{{
  *   centroids/            (cell, centroid: array<double>) — quantizer +
  *                         existence marker, written via atomic swap
  *   vectors/batch=<b>/    (cell, id, vec: array<float>) — postings,
  *                         range-clustered by cell
  * }}}
  * Batch partitions are staged under a dot-prefixed directory (invisible
  * to Spark's file listing) and renamed into place — [[DedupIndex]]'s
  * protocol, shared via [[DedupIndex.appendDir]]. With a single postings
  * table the rename itself is the commit marker, so retry loops need no
  * two-table repair: [[appendIdempotent]] is "skip if the label exists".
  *
  * Scale notes (100 TB corpus, ~10⁹ vectors):
  *  - postings are written `repartitionByRange(cell)` and sorted within
  *    partitions, so files and row groups carry disjoint cell ranges and
  *    the probe's semi-join prunes whole files before any exchange.
  *  - a probe touches ≈ corpus × nprobe/nlist rows; `nlist` is the scale
  *    knob, fixed at [[build]] (re-training requires a rebuild — [[init]]
  *    refuses to replace centroids once batches exist, because postings
  *    carry the OLD assignment and a probe against new centroids would
  *    look in the wrong cells).
  *  - degenerate corpora (one embedding repeated 10⁸ times) concentrate a
  *    cell; `maxCell` routes over-cap cells to a linear keeper-only
  *    verification with an audit view ([[hotCells]]) — the same bounded,
  *    observable recall contract as every capped operator in the repo.
  *
  * Cache lifecycle: [[crossNeighbors]]/[[dedupBatch]] pin batch prep
  * tables like every graft operator; a per-batch caller should scope each
  * batch with [[Caches.inScope]] and release after consuming the result.
  */
object AnnIndex {

  private def centroidsDir(path: String) = s"$path/centroids"
  private def vectorsDir(path: String) = s"$path/vectors"

  private def nearestCells(index: IvfIndex, v: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.NearestCentroidsExpr(
      ColumnBridge.eagerExpression(v), index.flat, index.dim, n))
  }

  /** Persist a trained quantizer as the index at `path`. Refuses to
    * replace the centroids of an index that already holds postings: cell
    * ids in landed batches were assigned by the OLD centroids, and a
    * probe through new ones would look in the wrong cells. Re-training is
    * a rebuild (new path, re-append, atomic switch at the caller).
    */
  def init(spark: SparkSession, path: String, index: IvfIndex): Unit = {
    require(batches(spark, path).isEmpty,
      s"index at $path already has batches; re-training requires a rebuild")
    index.save(spark, centroidsDir(path))
  }

  /** Load the index's quantizer. Fails loudly if `path` holds no index. */
  def quantizer(spark: SparkSession, path: String): IvfIndex =
    IvfIndex.load(spark, centroidsDir(path))

  /** Labels of the batches currently in the index, sorted. A directory
    * listing of `vectors/` — O(batches), never touches data files.
    */
  def batches(spark: SparkSession, path: String): Seq[String] = {
    val dir = new Path(vectorsDir(path))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch="))
      .sorted
  }

  /** Next zero-padded numeric batch label (`00000001`, …). */
  def nextBatchLabel(spark: SparkSession, path: String): String = {
    val used = batches(spark, path).flatMap(_.toLongOption)
    f"${used.foldLeft(0L)(math.max) + 1}%08d"
  }

  /** Assign `emb`'s vectors to their coarse cell with the index's
    * quantizer and land the result as batch partition `batch` of the
    * postings table. The batch becomes visible to probes atomically
    * (staging + rename) and is immutable afterwards. Vectors must have
    * the quantizer's dimension (a shorter vector scores over its prefix —
    * the expression contract — so mixed-dim corpora belong in separate
    * indexes). Callers dedup BEFORE appending ([[dedupBatch]] does) — the
    * index stores what the pipeline accepted, it does not re-judge it.
    */
  def append(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      batch: String): Unit = {
    require(batch.nonEmpty && !batch.contains('/') && !batch.startsWith("."),
      s"invalid batch label '$batch'")
    val index = quantizer(emb.sparkSession, path)
    DedupIndex.appendDir(
      emb.select(
        nearestCells(index, col(vecCol), 1).getItem(0).as("cell"),
        col(idCol).as("id"),
        col(vecCol).as("vec"))
        .repartitionByRange(col("cell"))
        .sortWithinPartitions("cell", "id"),
      vectorsDir(path), batch)
  }

  /** Retry-safe [[append]] for exactly-once ingestion loops (streaming
    * foreachBatch re-executes a micro-batch after a crash with the SAME
    * batch id). One postings table, one rename: the `batch=` directory IS
    * the commit marker, so "already landed" is a plain existence check.
    */
  def appendIdempotent(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      batch: String): Unit =
    if (!batches(emb.sparkSession, path).contains(batch))
      append(emb, idCol, vecCol, path, batch)

  /** Train + [[init]] + [[append]] the first batch in one call. */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int = 16,
      sampleRows: Int = 512,
      kmeansIters: Int = 5,
      batch: String = "00000001"): Unit = {
    init(emb.sparkSession, path,
      Similarity.trainIvf(emb, idCol, vecCol, nlist, sampleRows, kmeansIters))
    append(emb, idCol, vecCol, path, batch)
  }

  /** [[build]] with the quantizer trained over the FULL corpus
    * (distributed Lloyd, [[Similarity.trainIvfFull]]) instead of a
    * driver-side sample — the variant for corpora whose distribution a
    * 512-point sample misrepresents. Same lifecycle afterwards.
    */
  def buildFullTrain(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int = 16,
      kmeansIters: Int = 5,
      batch: String = "00000001"): Unit = {
    init(emb.sparkSession, path,
      Similarity.trainIvfFull(emb, idCol, vecCol, nlist, kmeansIters))
    append(emb, idCol, vecCol, path, batch)
  }

  /** Per-batch postings counts — the maintenance signal for [[compact]]:
    * (batch, vectors). One narrow count per batch; the label comes from
    * the file path (`_metadata.file_path`), not the inferred partition
    * column, so zero-padded labels survive numeric type inference.
    */
  def stats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(vectorsDir(path))
      .groupBy(regexp_extract(col("_metadata.file_path"), "/batch=([^/]+)/", 1).as("batch"))
      .agg(count(lit(1)).as("vectors"))

  /** Coalesce every current batch into ONE new batch partition and drop
    * the sources. Restores the range clustering ([[append]]'s
    * repartitionByRange is per batch, so cell ranges overlap ACROSS
    * batches until re-clustered) and bounds file-listing overhead for
    * per-micro-batch ingestion loops. Returns the merged batch label.
    *
    * Concurrency contract (same as [[DedupIndex.compact]]): safe against
    * concurrent PROBES in the promote-then-delete window — duplicated
    * postings cannot change a probe's answer ([[crossNeighbors]]
    * deduplicates postings and collapses pairs via groupBy-max, and its
    * occupancy cap counts distinct members). A probe that already LISTED
    * a source batch's files when the delete lands fails with a transient
    * file-not-found — retry it. Do NOT run concurrently with [[append]]
    * or another compact.
    */
  def compact(spark: SparkSession, path: String): String = {
    val old = batches(spark, path)
    require(old.nonEmpty, s"nothing to compact at $path")
    if (old.size == 1) return old.head
    val label = nextBatchLabel(spark, path)
    DedupIndex.appendDir(
      spark.read.parquet(old.map(b => s"${vectorsDir(path)}/batch=$b"): _*)
        .repartitionByRange(col("cell"))
        .sortWithinPartitions("cell", "id"),
      vectorsDir(path), label)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    old.foreach(b => fs.delete(new Path(s"${vectorsDir(path)}/batch=$b"), true))
    label
  }

  /** Delete invisible staging residue left by crashed appends. Safe while
    * readers are active; do NOT run concurrently with an in-flight
    * [[append]] to the same index.
    */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val root = new Path(vectorsDir(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(".staging_"))
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** Near-neighbor pairs between a new batch and the indexed corpus:
    * (batch_id, corpus_id, cosine) with cosine ≥ threshold, one row per
    * pair (max over probe paths). Each batch vector probes its `nprobe`
    * nearest cells; the probed-cell set broadcast-semi-joins the postings
    * scan (map-side file pruning — the corpus side never enters an
    * exchange), and every candidate is verified by exact cosine on the
    * stored vectors. Cost: one batch pass + a postings scan restricted to
    * probed cells + candidate-sized verification — corpus vectors outside
    * probed cells are never read.
    *
    * Recall contract: a pair is found iff the corpus vector's home cell
    * is among the batch vector's `nprobe` nearest cells — the standard
    * IVF trade (raise `nprobe` toward `nlist` for exact). Over-cap cells
    * (`maxCell`) contribute only their keeper (min corpus id), verified
    * by true cosine — bounded extra loss, observable via [[hotCells]].
    */
  def crossNeighbors(
      batchDf: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      threshold: Double = 0.95,
      nprobe: Int = 4,
      maxCell: Int = Int.MaxValue): DataFrame = {
    val spark = batchDf.sparkSession
    val index = quantizer(spark, path)
    // Batch probes: read twice (probed-cell set + candidate join) → pinned.
    val probes = Caches.pin(
      batchDf.select(
        col(idCol).as("batch_id"),
        col(vecCol).as("__qvec"),
        explode(nearestCells(index, col(vecCol), math.min(nprobe, index.nlist)))
          .as("cell")))
    if (batches(spark, path).isEmpty)
      return probes
        .select(col("batch_id"), col("batch_id").as("corpus_id"), lit(0.0).as("cosine"))
        .where(lit(false))

    // Postings restricted to probed cells. The distinct cell set is tiny
    // (≤ batch_rows × nprobe ints) → broadcast; the semi-join prunes the
    // postings scan map-side. distinct(): during compact's promote-then-
    // delete window every posting exists twice — raw-row occupancy would
    // double __occ and flip under-cap cells onto the keeper-only path.
    // Re-read by the occupancy split below → pinned (probed-cells-sized,
    // not corpus-sized).
    val matched = Caches.pin(
      spark.read.parquet(vectorsDir(path))
        .join(broadcast(probes.select("cell").distinct()), Seq("cell"), "left_semi")
        .select(col("cell"), col("id").as("corpus_id"), col("vec"))
        .distinct())

    val occ = Blocking.withOccupancy(matched, Seq("cell"))
    val cold = occ.where(col("__occ") <= maxCell)
      .select(col("cell"), col("corpus_id"), col("vec"))
    val hotKeepers = occ.where(col("__occ") > maxCell)
      .groupBy("cell")
      .agg(min(col("corpus_id")).as("corpus_id"), min_by(col("vec"), col("corpus_id")).as("vec"))
    cold.unionByName(hotKeepers)
      .join(broadcast(probes), Seq("cell"))
      .select(
        col("batch_id"), col("corpus_id"),
        vectors.cosine(col("vec"), col("__qvec")).as("cosine"))
      .where(col("cosine") >= threshold)
      .groupBy("batch_id", "corpus_id")
      .agg(max("cosine").as("cosine"))
  }

  /** Top-k corpus neighbors per batch vector: (batch_id, corpus_id,
    * cosine, rank), rank 1 = nearest, ties broken by corpus_id. Same
    * probe machinery as [[crossNeighbors]] without a threshold — the
    * ANN-search face of the index ([[Similarity.ivfSearch]] without the
    * corpus rescan).
    */
  def topNeighbors(
      batchDf: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      k: Int,
      nprobe: Int = 4,
      maxCell: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = crossNeighbors(
      batchDf, idCol, vecCol, path, threshold = -1.0, nprobe, maxCell)
    scored
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("batch_id").orderBy(col("cosine").desc, col("corpus_id"))))
      .where(col("rank") <= k)
  }

  /** Audit view of the index cells the probe cap short-circuits for this
    * batch: (cell, occupancy) over probed cells whose distinct corpus
    * membership exceeds `maxCell`. Run alongside [[crossNeighbors]] to
    * observe (and tune) what the cap routes to the keeper path.
    */
  def hotCells(
      batchDf: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nprobe: Int = 4,
      maxCell: Int = 256): DataFrame = {
    val spark = batchDf.sparkSession
    val index = quantizer(spark, path)
    val probed = batchDf.select(
      explode(nearestCells(index, col(vecCol), math.min(nprobe, index.nlist))).as("cell"))
      .distinct()
    if (batches(spark, path).isEmpty)
      return probed.select(col("cell"), lit(0L).as("occupancy")).where(lit(false))
    spark.read.parquet(vectorsDir(path))
      .join(broadcast(probed), Seq("cell"), "left_semi")
      .groupBy("cell")
      .agg(count_distinct(col("id")).as("occupancy"))
      .where(col("occupancy") > maxCell)
  }

  /** End-to-end batch acceptance: drop batch vectors that near-duplicate
    * the indexed corpus ([[crossNeighbors]]), then near-dedup the
    * survivors among themselves (LSH-blocked cosine pairs → connected
    * components → keep each cluster's min id). Returns the accepted rows
    * of `batchDf` — the frame a pipeline would then [[append]] under a
    * fresh batch label and write downstream.
    */
  def dedupBatch(
      batchDf: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      threshold: Double = 0.95,
      nprobe: Int = 4,
      maxCell: Int = Int.MaxValue,
      dim: Int = 64): DataFrame = {
    val inCorpus = crossNeighbors(batchDf, idCol, vecCol, path, threshold, nprobe, maxCell)
      .select(col("batch_id").as(idCol))
      .distinct()
    val fresh = batchDf.join(inCorpus, Seq(idCol), "left_anti")
    val pairs = Similarity.cosineNearDupPairs(
      fresh, idCol, vecCol, threshold, dim = dim,
      maxBucket = if (maxCell == Int.MaxValue) Int.MaxValue else maxCell)
    val dropped = Dedup.duplicateClusters(pairs)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    fresh.join(dropped, Seq(idCol), "left_anti")
  }
}
