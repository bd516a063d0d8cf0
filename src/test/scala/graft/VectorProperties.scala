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

  property("sq8 codes: driver-parity, range bound, reconstruction within scale/2") =
    forAll(genVec) { v =>
      val row = Seq(Tuple1(v)).toDF("v")
        .select(graft.operators.Quantize.sq8Codes(col("v")).as("c")).head()
      val codes = row.getSeq[Byte](0)
      val amax = v.map(x => math.abs(x.toDouble)).max
      val ref = v.map(x =>
        if (amax == 0.0) 0L else math.floor(x.toDouble * 127.0 / amax + 0.5).toLong)
      val scale = if (amax == 0.0) 0.0 else amax / 127.0
      codes.map(_.toLong) == ref &&
        codes.forall(c => c >= -127 && c <= 127) &&
        codes.zip(v).forall { case (c, x) =>
          math.abs(c * scale - x.toDouble) <= scale / 2 + 1e-12
        }
    }

  property("importance bucket hash: driver-parity over arbitrary Unicode, range bound") =
    forAll(Gen.listOfN(4, Gen.identifier), Gen.listOfN(2, arbitraryUnicode)) { (ids, uni) =>
      val toks = (ids ++ uni).filter(_.nonEmpty)
      toks.isEmpty || {
        val B = 32
        val got = toks.toDF("w")
          .select(graft.operators.Importance.bucketOf(col("w"), B).as("b"))
          .collect().map(_.getLong(0)).toList
        val want = toks.map { t =>
          t.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31L + (b & 0xff)) % 2147483647L) % B
        }
        got == want && got.forall(b => b >= 0 && b < B)
      }
    }

  private def arbitraryUnicode: Gen[String] =
    Gen.listOfN(6, Gen.frequency(
      3 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('Δ', 'ß', '中', '→', 'é', 'ü'),
      1 -> Gen.choose('¡', '⿿'))).map(_.mkString)
}
