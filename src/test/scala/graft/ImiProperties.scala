package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.expressions.ImiKernels

/** Property pins for the inverted-multi-index kernel: over random
  * INTEGER-valued half-quantizers and vectors (exact FP — sums of
  * products of small integers), the product-cell selection must equal a
  * brute-force nearest-of-product-grid reference with the
  * [[graft.expressions.NearestCentroidsExpr]] tie/NaN discipline
  * (ascending (distance, cell id), NaN → +infinity). ImiSpec pins the
  * DataFrame/codegen path against the real single-level expression; this
  * covers the kernel itself over a much wider random space, including
  * duplicate centroids (forced sum ties) and short/corrupt vectors.
  */
object ImiProperties extends Properties("graft.imi") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val genCase: Gen[(Int, Int, Array[Double], Array[Double], Array[Double], Int)] =
    for {
      dim1 <- Gen.choose(1, 4)
      dim2 <- Gen.choose(1, 4) // independent of dim1: uneven halves are legal
      k1 <- Gen.choose(1, 5)
      k2 <- Gen.choose(1, 5)
      // small-integer coordinates: exact arithmetic AND frequent ties
      f1 <- Gen.containerOfN[Array, Double](k1 * dim1, Gen.choose(-2, 2).map(_.toDouble))
      f2 <- Gen.containerOfN[Array, Double](k2 * dim2, Gen.choose(-2, 2).map(_.toDouble))
      vLen <- Gen.choose(0, dim1 + dim2)
      v <- Gen.containerOfN[Array, Double](vLen, Gen.choose(-3, 3).map(_.toDouble))
      nprobe <- Gen.choose(1, k1 * k2)
    } yield (dim1, dim2, f1, f2, v, nprobe)

  /** Brute-force reference: expand the product grid, score each cell
    * over the vector prefix, bounded-select by (distance, cell id).
    */
  private def reference(
      dim1: Int,
      dim2: Int,
      f1: Array[Double],
      f2: Array[Double],
      v: Array[Double],
      nprobe: Int): Seq[Int] = {
    val k1 = f1.length / dim1
    val k2 = f2.length / dim2
    val scored = for (c1 <- 0 until k1; c2 <- 0 until k2) yield {
      val cent = f1.slice(c1 * dim1, (c1 + 1) * dim1) ++
        f2.slice(c2 * dim2, (c2 + 1) * dim2)
      var d = 0.0
      var i = 0
      while (i < math.min(v.length, dim1 + dim2)) {
        val x = v(i) - cent(i); d += x * x; i += 1
      }
      if (d.isNaN) d = Double.PositiveInfinity
      (d, c1 * k2 + c2)
    }
    scored.sortBy(identity).take(nprobe).map(_._2)
  }

  property("kernel == brute-force nearest-of-product-grid, ties, prefix, uneven halves") =
    forAll(genCase) { case (dim1, dim2, f1, f2, v, nprobe) =>
      val padded = java.util.Arrays.copyOf(v, dim1 + dim2)
      val got = ImiKernels.nearestCells(
        padded, v.length, f1, f2, dim1, dim2, f1.length / dim1, f2.length / dim2, nprobe)
      got.toSeq == reference(dim1, dim2, f1, f2, v, nprobe)
    }

  property("corrupt vectors (NaN element) still yield nprobe distinct cells, id-ascending among +inf") =
    forAll(genCase) { case (dim1, dim2, f1, f2, _, nprobe) =>
      val v = Array.fill(dim1 + dim2)(Double.NaN)
      val got = ImiKernels.nearestCells(
        v, v.length, f1, f2, dim1, dim2, f1.length / dim1, f2.length / dim2, nprobe)
      got.length == nprobe && got.toSeq.distinct == got.toSeq &&
        got.toSeq == reference(dim1, dim2, f1, f2, v, nprobe)
    }

  /** Half-distance arrays straight from the generator — small integers
    * for forced ties, plus injected NaN/+infinity entries (a NaN half
    * ranks +inf; an overflow half is already +inf) so the canonical-
    * ization inside the traversal is exercised, not just finite sums.
    */
  private val genHalves: Gen[(Array[Double], Array[Double], Int)] =
    for {
      k1 <- Gen.choose(1, 9)
      k2 <- Gen.choose(1, 9)
      d1 <- Gen.containerOfN[Array, Double](k1,
        Gen.frequency(
          8 -> Gen.choose(0, 4).map(_.toDouble),
          1 -> Gen.const(Double.NaN),
          1 -> Gen.const(Double.PositiveInfinity),
          // ROUNDING ties below +inf: 1e308 + 0 == 1e308 + 4, and two
          // 1e308 halves overflow to +inf — both classes broke the naive
          // traversal order and must stay covered
          1 -> Gen.const(1e308)))
      d2 <- Gen.containerOfN[Array, Double](k2,
        Gen.frequency(
          8 -> Gen.choose(0, 4).map(_.toDouble),
          1 -> Gen.const(Double.NaN),
          1 -> Gen.const(Double.PositiveInfinity),
          1 -> Gen.const(1e308)))
      nprobe <- Gen.choose(1, k1 * k2 + 2) // past the grid: sentinel padding
    } yield (d1, d2, nprobe)

  /** The round-17 selection-path pin: the multi-sequence traversal must
    * be BITWISE-EQUAL to the exhaustive scan — ids AND order, tie runs
    * included — whatever the dispatch in nearestCells would have chosen.
    * This is the contract that makes the dispatch a pure cost choice.
    */
  property("multiSequence == fullScan: ids, order, ties, NaN/+inf, sentinel padding") =
    forAll(genHalves) { case (d1, d2, nprobe) =>
      val k2 = d2.length
      ImiKernels.multiSequence(d1, d2, k2, nprobe).toSeq ==
        ImiKernels.fullScan(d1, d2, k2, nprobe).toSeq
    }

  /** Zero-length halves (unreachable through NearestImiCellsExpr, which
    * requires nonEmpty flats, but inside the private[graft] kernel
    * contract): the grid is empty, so both kernels must return the pure
    * sentinel array instead of the traversal indexing into an empty
    * half (the r17 ADVICE finding).
    */
  property("multiSequence == fullScan on empty halves: pure sentinel array") =
    forAll(Gen.choose(0, 5), Gen.choose(1, 7), Gen.oneOf(true, false)) {
      (k, nprobe, emptyFirst) =>
        val full = Array.tabulate(k)(_.toDouble)
        val d1 = if (emptyFirst) Array.empty[Double] else full
        val d2 = if (emptyFirst) full else Array.empty[Double]
        val ms = ImiKernels.multiSequence(d1, d2, d2.length, nprobe).toSeq
        ms == ImiKernels.fullScan(d1, d2, d2.length, nprobe).toSeq &&
          ms == Seq.fill(nprobe)(Int.MaxValue)
    }
}
