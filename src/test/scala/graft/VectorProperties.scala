package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.vectors

/** Laws of the native vector kernel. */
object VectorProperties extends Properties("graft.vectors") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genVec: Gen[List[Float]] =
    Gen.listOfN(16, Gen.choose(-10.0f, 10.0f))

  private def eval(a: List[Float], b: List[Float], f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b"))).head().getDouble(0)

  property("dot matches a driver-side double fold exactly") =
    forAll(genVec, genVec) { (a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      eval(a, b, vectors.dot) == expected
    }

  property("cosine is bounded in [-1, 1] (up to fp eps) and symmetric") =
    forAll(genVec, genVec) { (a, b) =>
      val c1 = eval(a, b, vectors.cosine)
      val c2 = eval(b, a, vectors.cosine)
      math.abs(c1) <= 1.0 + 1e-9 && c1 == c2
    }

  property("cosine(v, v) = 1 for nonzero v; 0 against the zero vector") =
    forAll(genVec.suchThat(_.exists(_ != 0.0f))) { v =>
      val self = eval(v, v, vectors.cosine)
      val zero = eval(v, List.fill(v.length)(0.0f), vectors.cosine)
      math.abs(self - 1.0) < 1e-9 && zero == 0.0
    }

  property("l2Sq(a, a) = 0 and l2Sq = |a|² + |b|² - 2·dot") =
    forAll(genVec, genVec) { (a, b) =>
      val l2 = eval(a, b, vectors.l2Sq)
      val viaDot = eval(a, a, vectors.dot) + eval(b, b, vectors.dot) - 2 * eval(a, b, vectors.dot)
      eval(a, a, vectors.l2Sq) == 0.0 && math.abs(l2 - viaDot) < 1e-6 * (1 + math.abs(l2))
    }
}
