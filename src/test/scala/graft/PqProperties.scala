package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.expressions.PqKernels

/** Property pins for the product-quantization kernels — the bit-identity
  * and well-formedness claims the probe paths rely on, checked over
  * random codebooks/vectors rather than the tiny fixture corpora.
  */
object PqProperties extends Properties("graft.pq") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genCase: Gen[(Int, Int, Int, Array[Double], Array[Double], Array[Double])] =
    for {
      m <- Gen.choose(1, 6)
      dsub <- Gen.choose(1, 5)
      ksub <- Gen.choose(1, 9)
      flat <- Gen.containerOfN[Array, Double](m * ksub * dsub, Gen.choose(-8.0, 8.0))
      q <- Gen.containerOfN[Array, Double](m * dsub, Gen.choose(-8.0, 8.0))
      v <- Gen.containerOfN[Array, Double](m * dsub, Gen.choose(-8.0, 8.0))
    } yield (m, dsub, ksub, flat, q, v)

  property("encode emits m codes, each addressing inside the codebook") =
    forAll(genCase) { case (m, dsub, ksub, flat, _, v) =>
      val code = PqKernels.encode(v, flat, m, ksub, dsub)
      code.length == m && code.forall(b => (b & 0xFF) < ksub)
    }

  property("encode picks the true argmin sub-centroid per subspace") =
    forAll(genCase) { case (m, dsub, ksub, flat, _, v) =>
      val code = PqKernels.encode(v, flat, m, ksub, dsub)
      Prop.all((0 until m).map { sub =>
        def d2(k: Int): Double =
          (0 until dsub).map { i =>
            val d = v(sub * dsub + i) - flat(PqKernels.centroidBase(sub, k, ksub, dsub) + i)
            d * d
          }.sum
        val chosen = d2(code(sub) & 0xFF)
        Prop((0 until ksub).forall(k => d2(k) >= chosen)) :|
          s"sub=$sub chose ${code(sub) & 0xFF} but a closer centroid exists"
      }: _*)
    }

  property("adcDot == lut gather + lutDot, BIT-identical (scoring-path swap law)") =
    forAll(genCase) { case (m, dsub, ksub, flat, q, v) =>
      val code = PqKernels.encode(v, flat, m, ksub, dsub)
      val direct = PqKernels.adcDot(q, code, flat, m, ksub, dsub)
      val viaLut = PqKernels.lutDot(code, PqKernels.lut(q, flat, m, ksub, dsub), m, ksub)
      Prop(java.lang.Double.doubleToRawLongBits(direct) ==
        java.lang.Double.doubleToRawLongBits(viaLut)) :| s"$direct != $viaLut"
    }

  property("a vector assembled from sub-centroids quantizes losslessly") =
    forAll(genCase.flatMap { case t @ (m, _, ksub, _, _, _) =>
      Gen.listOfN(m, Gen.choose(0, ksub - 1)).map(ks => (t, ks.toArray))
    }) { case ((m, dsub, ksub, flat, _, _), ks) =>
      val v = new Array[Double](m * dsub)
      for (sub <- 0 until m; i <- 0 until dsub)
        v(sub * dsub + i) = flat(PqKernels.centroidBase(sub, ks(sub), ksub, dsub) + i)
      val code = PqKernels.encode(v, flat, m, ksub, dsub)
      // the chosen centroid must MATCH the assembled content (a content
      // twin of ks(sub) is fine — ties break by index, content is what
      // the ADC score reads)
      Prop.all((for (sub <- 0 until m; i <- 0 until dsub) yield {
        val got = flat(PqKernels.centroidBase(sub, code(sub) & 0xFF, ksub, dsub) + i)
        Prop(got == v(sub * dsub + i)) :| s"lossy at sub=$sub dim=$i"
      }): _*)
    }
}
