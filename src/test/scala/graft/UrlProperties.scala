package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Urls

/** [[Urls.resolve]] against the JDK's own RFC 3986 resolver
  * (`java.net.URI.resolve` + `normalize`) over random bases and
  * references — an independent implementation of the same public spec,
  * the normalizeUnicode-vs-java.text.Normalizer move for URLs.
  *
  * Generator bounds, with reasons:
  *   - `..` depth stays within the base directory's depth — java.net
  *     historically leaves above-root `/../` in place where RFC 3986
  *     (and this operator) clamp to the root, so the divergent zone is
  *     pinned by the EXPLICIT §5.4 abnormal-case asserts in UrlsSpec
  *     instead of the property;
  *   - no empty and no fragment-only refs — the frontier contract maps
  *     those to NULL where the JDK returns the base itself.
  */
object UrlProperties extends Properties("graft.urls") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val seg = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(5).mkString)

  private val genBase: Gen[String] = for {
    host <- Gen.oneOf("a.io", "b.example.org")
    depth <- Gen.choose(2, 4)
    segs <- Gen.listOfN(depth, seg)
    file <- Gen.option(seg)
  } yield s"http://$host/${segs.mkString("/")}" + file.map("/" + _).getOrElse("/")

  private def genRef(baseDepth: Int): Gen[String] = Gen.oneOf(
    // plain relative: optional ./ and bounded ../ runs, then segments
    for {
      ups <- Gen.choose(0, baseDepth - 1)
      dots <- Gen.oneOf("", "./")
      segs <- Gen.nonEmptyListOf(seg).map(_.take(3))
      q <- Gen.option(seg.map("?" + _ + "=1"))
    } yield dots + ("../" * ups) + segs.mkString("/") + q.getOrElse(""),
    // root-relative
    Gen.nonEmptyListOf(seg).map(s => "/" + s.take(3).mkString("/")),
    // absolute and protocol-relative
    seg.map(s => s"https://c.net/$s"),
    seg.map(s => s"//d.net/$s"))
  // Query-only refs ("?y") are deliberately absent: java.net.URI.resolve
  // drops the base's last path segment for them (long-standing JDK
  // deviation from RFC 3986 §5.2.2 — "?y" against "http://a/b/c/d;p?q"
  // must keep path "/b/c/d;p"), and THIS operator follows the RFC: the
  // §5.4 reference vector for "?y" is asserted explicitly in UrlsSpec,
  // which is the authority the property defers to.

  private def viaSpark(base: String, ref: String): Option[String] =
    Option(Seq((base, ref)).toDF("b", "r")
      .select(Urls.resolve(col("b"), col("r")).as("x"))
      .head().getAs[String]("x"))

  private def viaJdk(base: String, ref: String): String = {
    val r = new java.net.URI(base).resolve(new java.net.URI(ref)).normalize()
    // java.net renders protocol-relative results with the base scheme the
    // same way; strip any fragment the same way the operator does
    r.toString.replaceAll("#.*$", "")
  }

  property("resolve agrees with java.net.URI over the shared RFC 3986 domain") =
    forAll(genBase.flatMap(b => genRef(b.count(_ == '/') - 3 + 1).map(b -> _))) {
      case (base, ref) =>
        val got = viaSpark(base, ref)
        val want = viaJdk(base, ref)
        val ok = got.contains(want)
        if (!ok) println(s"resolve mismatch: base=$base ref=$ref got=$got jdk=$want")
        ok
    }

  property("resolve is idempotent on its own absolute output") =
    forAll(genBase.flatMap(b => genRef(2).map(b -> _))) { case (base, ref) =>
      viaSpark(base, ref).forall { abs =>
        viaSpark("http://unused.io/q/r", abs).contains(abs)
      }
    }
}
