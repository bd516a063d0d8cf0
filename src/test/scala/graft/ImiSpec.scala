package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{NearestCentroidsExpr, NearestImiCellsExpr}
import graft.operators.{AnnIndex, Caches, Imi, Similarity}

/** The two-level (IMI) coarse quantizer: the product-cell assignment must
  * EQUAL the single-level expression over the expanded product-centroid
  * table (squared L2 to a product centroid decomposes into the two
  * half-distances — exact on integer-valued vectors, the repo's standard
  * cross-path determinism fixture), and the index lifecycle (build,
  * probe, auto-switch, rebuild across the quantizer-type boundary,
  * PQ composition) must serve the same answers as the flat path.
  */
class ImiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_imi_spec").toString

  test("NearestImiCellsExpr == NearestCentroidsExpr over the expanded product table") {
    // integer-valued halves of UNEVEN width (dim1 = 2, dim2 = 1 — the
    // odd-dim split), WITH a duplicate centroid in q1 (rows 0 and 2) so
    // exact distance ties across different product cells exercise the
    // (distance, cell-id) tie-break on both paths
    val q1 = Array(Array(0.0, 0.0), Array(4.0, 0.0), Array(0.0, 0.0))
    val q2 = Array(Array(1.0), Array(3.0), Array(1.0), Array(7.0))
    val dim1 = 2; val dim2 = 1
    val k1 = q1.length; val k2 = q2.length
    val product: IndexedSeq[Double] =
      (for (a <- q1; b <- q2) yield a ++ b).flatten.toIndexedSeq
    val flat1 = q1.flatten.toIndexedSeq
    val flat2 = q2.flatten.toIndexedSeq
    val rows = Seq.tabulate(64) { i =>
      Array.tabulate(3)(j => (((i * 13 + j * 7) % 9) - 4).toFloat)
    } ++ Seq(
      Array(Float.NaN, 1.0f, 2.0f),  // corrupt row: NaN ranks +inf, still nprobe cells
      Array(1.0f))                   // short row: prefix contract
    val df = rows.map(v => Tuple1(v.toSeq)).toDF("vec")
    for (nprobe <- Seq(1, 3, k1 * k2)) {
      val imi = ColumnBridge.column(NearestImiCellsExpr(
        ColumnBridge.eagerExpression(col("vec")), flat1, flat2, dim1, dim2, nprobe))
      val ref = ColumnBridge.column(NearestCentroidsExpr(
        ColumnBridge.eagerExpression(col("vec")), product, dim1 + dim2, nprobe))
      val got = df.select(imi.as("a"), ref.as("b"))
        .collect()
        .map(r => (r.getSeq[Int](0), r.getSeq[Int](1)))
      got.zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"row $i nprobe=$nprobe: imi=$a product=$b")
      }
    }
  }

  test("nearestCells dispatch: the multi-sequence branch equals the scan at a real grid") {
    // 64 × 64 = 4096 cells with duplicated centroids (forced sum ties):
    // past the 2048-cell dispatch floor, so nprobe ∈ {1, 4, 64} runs the
    // multi-sequence traversal inside nearestCells itself while the
    // fullScan call here recomputes the reference order exhaustively —
    // the end-to-end twin of the ImiProperties kernel pin. nprobe = 4096
    // (Fraction(1.0)) stays on the scan branch by design.
    import graft.expressions.ImiKernels
    val dim1 = 3; val dim2 = 2; val k = 64
    def cent(h: Int, c: Int, w: Int): Array[Double] =
      Array.tabulate(w)(j => (((c / 2) * 31 + h * 17 + j * 7) % 13 - 6).toDouble)
    val f1 = Array.tabulate(k)(c => cent(1, c, dim1)).flatten
    val f2 = Array.tabulate(k)(c => cent(2, c, dim2)).flatten
    val vecs = Seq.tabulate(32)(i =>
      Array.tabulate(dim1 + dim2)(j => (((i * 11 + j * 5) % 15) - 7).toDouble)) ++
      Seq(Array(Double.NaN, 1.0, 2.0, 3.0, 4.0), Array(2.0)) // corrupt + short
    for (v <- vecs; nprobe <- Seq(1, 4, 64, k * k)) {
      val padded = java.util.Arrays.copyOf(v, dim1 + dim2)
      val got = ImiKernels.nearestCells(
        padded, v.length, f1, f2, dim1, dim2, k, k, nprobe).toSeq
      val d1 = Array.tabulate(k) { c =>
        var d = 0.0
        for (j <- 0 until math.min(v.length, dim1)) { val x = v(j) - f1(c * dim1 + j); d += x * x }
        d
      }
      val d2 = Array.tabulate(k) { c =>
        var d = 0.0
        for (j <- 0 until math.max(0, math.min(v.length, dim1 + dim2) - dim1)) {
          val x = v(dim1 + j) - f2(c * dim2 + j); d += x * x
        }
        d
      }
      val ref = ImiKernels.fullScan(d1, d2, k, nprobe).toSeq
      assert(got == ref, s"v=${v.toSeq} nprobe=$nprobe: dispatch=$got scan=$ref")
    }
  }

  test("ImiIndex: shapes, save/load roundtrip, guards") {
    val idx = Imi.ImiIndex(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(5.0, 6.0), Array(7.0, 8.0), Array(9.0, 10.0)))
    assert(idx.k1 == 2 && idx.k2 == 3 && idx.nlist == 6 && idx.dim == 4)
    val path = tmp() + "/imi"
    idx.save(spark, path)
    val back = Imi.ImiIndex.load(spark, path)
    assert(back.q1.map(_.toSeq).toSeq == idx.q1.map(_.toSeq).toSeq)
    assert(back.q2.map(_.toSeq).toSeq == idx.q2.map(_.toSeq).toSeq)
    // uneven halves are legal (odd-dim corpora split ceil/floor) ...
    val uneven = Imi.ImiIndex(Array(Array(1.0)), Array(Array(1.0, 2.0)))
    assert(uneven.dim1 == 1 && uneven.dim2 == 2 && uneven.dim == 3)
    // ... ragged centroids within one half are not
    intercept[IllegalArgumentException](
      Imi.ImiIndex(Array(Array(1.0), Array(1.0, 2.0)), Array(Array(1.0))))
  }

  test("trainImi trains both halves; odd dims split ceil/floor") {
    val emb = Seq.tabulate(64)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 8 + j) % 17).toFloat))).toDF("id", "vec")
    val idx = Imi.trainImi(emb, "id", "vec", kPerHalf = 4)
    assert(idx.dim1 == 4 && idx.dim2 == 4 && idx.k1 == 4 && idx.k2 == 4 && idx.nlist == 16)
    // odd dims are not excluded (the r16 review finding): 5 splits 3 + 2,
    // and the trained index serves exact full-fraction answers
    val odd = Seq.tabulate(32)(i =>
      (i.toLong, Array.tabulate(5)(j => (((i * 5 + j) % 11) - 5).toFloat))).toDF("id", "vec")
    val oidx = Imi.trainImi(odd, "id", "vec", kPerHalf = 2)
    assert(oidx.dim1 == 3 && oidx.dim2 == 2 && oidx.dim == 5)
    val path = tmp()
    AnnIndex.initImi(spark, path, oidx)
    AnnIndex.append(odd, "id", "vec", path, "00000001")
    val batch = odd.where(col("id") % 4 === 0)
      .select((col("id") + 100L).as("id"),
        transform(col("vec"), x => (x * lit(1.001f)).cast("float")).as("vec"))
    val probed = AnnIndex.crossNeighbors(
      batch, "id", "vec", path, 0.99, AnnIndex.Probe.Fraction(1.0), Int.MaxValue)
      .select(col("corpus_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineNearDupPairsExact(
      odd.unionByName(batch), "id", "vec", threshold = 0.99)
      .where(col("id_a") < 100L && col("id_b") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed == exact && probed.nonEmpty,
      s"odd-dim IMI full-fraction probe must be exact: $probed vs $exact")
    Caches.release()
  }

  test("trainImi's sampled draw quarantines null and non-finite vectors (r16 review pin)") {
    // a NULL vector NPEd the sample collect; a NaN element poisoned a
    // half-centroid (its distances rank +inf forever). Both must be
    // excluded from SEEDING while still being assignable at build time.
    val clean = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(4)(j => (((i * 7 + j * 3) % 11) - 5).toFloat)))
    val dirty = clean.map { case (i, v) => (i, v: Any) } ++ Seq(
      (100L, null: Any),
      (101L, Array(Float.NaN, 1.0f, 2.0f, 3.0f): Any),
      (102L, Array(Float.PositiveInfinity, 0.0f, 0.0f, 0.0f): Any))
    val df = dirty.map { case (i, v) =>
      (i, Option(v).map(_.asInstanceOf[Array[Float]]).map(_.toSeq).orNull)
    }.toDF("id", "vec")
    val idx = Imi.trainImi(df, "id", "vec", kPerHalf = 3)
    assert(idx.q1.forall(_.forall(java.lang.Double.isFinite)) &&
      idx.q2.forall(_.forall(java.lang.Double.isFinite)),
      "corrupt vectors must never define a centroid")
    assert(idx.k1 >= 1 && idx.k2 >= 1)
  }

  test("buildImi + full-fraction probe equals brute-force exact cross pairs") {
    val corpus = Seq.tabulate(48) { i =>
      (i.toLong, Array.tabulate(8)(j => ((((i * 31 + j * 11) % 19) - 9).toFloat)))
    }.toDF("id", "vec")
    val batch = corpus.where(col("id") % 6 === 0)
      .select((col("id") + 100L).as("id"),
        transform(col("vec"), x => (x * lit(1.001f)).cast("float")).as("vec"))
    val path = tmp()
    val nlist = AnnIndex.buildImi(corpus, "id", "vec", path, kPerHalf = 3)
    assert(AnnIndex.hasImi(spark, path))
    assert(nlist == 9)
    val probed = AnnIndex.crossNeighbors(
      batch, "id", "vec", path, 0.99, AnnIndex.Probe.Fraction(1.0), Int.MaxValue)
      .select(col("corpus_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineNearDupPairsExact(
      corpus.unionByName(batch), "id", "vec", threshold = 0.99)
      .where(col("id_a") < 100L && col("id_b") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed == exact, s"full-fraction IMI probe must be exact: $probed vs $exact")
    assert(probed.nonEmpty, "planted scaled copies must pair")
    Caches.release()
  }

  test("buildAuto crosses to IMI above imiAbove; rebuildAuto crosses back to flat") {
    val corpus = Seq.tabulate(64) { i =>
      val v = Array.fill(16)(0.0f); v(i % 16) = 1.0f; v((i * 7) % 16) += 2.0f
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
    val path = tmp()
    // sized = ceil(64/4) = 16 cells > imiAbove = 9 -> IMI with k = 4
    val nlist = AnnIndex.buildAuto(
      corpus, "id", "vec", path, targetCellRows = 4L, minNlist = 2,
      fullTrainAbove = 2, imiAbove = 9)
    assert(AnnIndex.hasImi(spark, path), "sized 16 > imiAbove 9 must build IMI")
    assert(nlist <= 16 && nlist >= 9, s"trained product nlist = $nlist")
    // report + nprobeFor read the product geometry through the same face
    assert(AnnIndex.nprobeFor(spark, path, 1.0) == nlist)
    val report = AnnIndex.resizeReport(spark, path, targetCellRows = 4L).head()
    assert(report.getAs[Int]("nlist") == nlist)
    // full-fraction probe is exact over the planted copies
    val batch = corpus.where(col("id") % 8 === 0)
      .select((col("id") + 100L).as("id"),
        transform(col("vec"), x => (x * lit(1.001f)).cast("float")).as("vec"))
    def pairs(p: String) = AnnIndex.crossNeighbors(
      batch, "id", "vec", p, 0.99, AnnIndex.Probe.Fraction(1.0), Int.MaxValue)
      .select(col("corpus_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs(path)
    assert(before.nonEmpty)
    // rebuild with a roomy cell target drops sized below imiAbove -> flat
    val newPath = tmp() + "/flat"
    AnnIndex.rebuildAuto(spark, path, newPath,
      targetCellRows = 16L, minNlist = 2, imiAbove = 9)
    assert(!AnnIndex.hasImi(spark, newPath), "sized 4 <= imiAbove must rebuild flat")
    assert(pairs(newPath) == before,
      "full-fraction answers must survive the quantizer-type crossing")
    Caches.release()
  }

  test("IMI + PQ compose: buildPqAuto above imiAbove screens through the product grid") {
    val corpus = Seq.tabulate(64) { i =>
      (i.toLong, Array.tabulate(8)(j => ((((i * 29 + j * 13) % 21) - 10).toFloat)))
    }.toDF("id", "vec")
    val path = tmp()
    val nlist = AnnIndex.buildPqAuto(
      corpus, "id", "vec", path, targetCellRows = 4L, m = 2, ksub = 4,
      minNlist = 2, fullTrainAbove = 2, imiAbove = 9)
    assert(AnnIndex.hasImi(spark, path) && AnnIndex.hasPq(spark, path))
    val batch = corpus.where(col("id") % 6 === 0)
      .select((col("id") + 100L).as("id"),
        transform(col("vec"), x => (x * lit(1.001f)).cast("float")).as("vec"))
    val pq = AnnIndex.crossNeighborsPq(
      batch, "id", "vec", path, 0.99, AnnIndex.Probe.Fraction(1.0),
      Int.MaxValue, margin = 0.3, scoreWithLut = false)
      .select(col("corpus_id"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineNearDupPairsExact(
      corpus.unionByName(batch), "id", "vec", threshold = 0.99)
      .where(col("id_a") < 100L && col("id_b") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq == exact, s"IMI+PQ full-fraction probe must verify exactly: $pq vs $exact")
    assert(pq.nonEmpty)
    assert(nlist >= 9, s"product nlist = $nlist")
    Caches.release()
  }
}
