package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{AsofJoin, CdcMerge, Scd2}
import graft.plans.TopK

/** Property-based invariants for the core operators, checked against
  * random inputs (ScalaCheck) and driver-side reference implementations.
  * Sample counts are kept small — each sample is a full Spark job.
  */
object OperatorProperties extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genKey = Gen.oneOf("a", "b", "c")
  private val genDay = Gen.choose(1, 28)
  private val genVal = Gen.option(Gen.oneOf("X", "Y", "Z"))

  private val genTimeline: Gen[List[(String, Int, Option[String])]] =
    Gen.listOfN(12, Gen.zip(genKey, genDay, genVal)).map(
      _.map { case (k, d, v) => (k, d, v) }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList) // one row per (key, date)

  property("scd2: intervals tile [first change, 9999-12-31] with one current row") =
    forAll(genTimeline) { rows =>
      rows.isEmpty || {
        val df = rows
          .map { case (k, d, v) => (k, Date.valueOf(f"2022-01-$d%02d"), v.orNull) }
          .toDF("k", "change_date", "attr")
        val dim = Scd2
          .build(df, Scd2.Config(Seq("k"), "change_date", Seq("attr"), nullSafe = true))
          .collect()
          .map(r => (
            r.getAs[String]("k"),
            r.getAs[Date]("effective_start_date").toLocalDate,
            r.getAs[Date]("effective_end_date").toLocalDate,
            r.getAs[Boolean]("is_current")))
        dim.groupBy(_._1).forall { case (_, vs) =>
          val sorted = vs.sortBy(_._2.toEpochDay)
          val contiguous = sorted.sliding(2).forall {
            case Array((_, _, e1, _), (_, s2, _, _)) => e1.plusDays(1) == s2
            case _ => true
          }
          contiguous &&
            sorted.last._3.toString == "9999-12-31" &&
            vs.count(_._4) == 1 &&
            sorted.zip(sorted.drop(1)).forall { case (a, b) => a._3.isBefore(b._3) }
        }
      }
    }

  property("cdc merge (deterministic) is idempotent and unique per key") =
    forAll(Gen.listOfN(15, Gen.zip(Gen.choose(0L, 6L), Gen.choose(0, 9), Gen.alphaStr.map(_.take(4))))) { rows =>
      rows.isEmpty || {
        val fresh = rows.map { case (k, t, p) => (k, t, p) }.toDF("k", "tie", "payload")
        val once = CdcMerge.mergeDeterministic(None, fresh, Seq("k"), Seq("tie", "payload"))
        val twice = CdcMerge.mergeDeterministic(Some(once), fresh, Seq("k"), Seq("tie", "payload"))
        val a = once.collect().map(_.toSeq).toSet
        val b = twice.collect().map(_.toSeq).toSet
        a == b && a.size == rows.map(_._1).distinct.size
      }
    }

  property("asof join agrees with a driver-side reference implementation") =
    forAll(
      Gen.listOfN(10, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0, 50))),
      Gen.listOfN(10, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0, 50)))) { (lefts, rights) =>
      val left = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t.toLong) }.toDF("id", "k", "t")
      val rightRows = rights.distinct
        .groupBy(identity).keys.toList // unique (k, t)
        .map { case (k, t) => (k, t.toLong, k * 100.0 + t) }
      val right = rightRows.toDF("k", "t", "v")
      val out = AsofJoin.lastValueJoin(left, right, Seq("k"), "t", Seq("v"))
        .collect()
        .map(r => r.getAs[Long]("id") -> Option(r.getAs[java.lang.Double]("v")).map(_.toDouble))
        .toMap
      val expected = lefts.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rightRows.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption.map(_._3)
      }.toMap
      out == expected
    }

  property("exact inverted-index Jaccard equals driver-side set arithmetic on random corpora") =
    forAll(
      Gen.listOfN(8, Gen.listOf(Gen.oneOf("w1", "w2", "w3", "w4", "w5")).map(_.take(12)))) {
      docs =>
        docs.isEmpty || {
          val df = docs.zipWithIndex
            .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
            .toDF("id", "text")
          val out = graft.operators.Dedup
            .exactJaccardPairs(df, "text", "id", shingleK = 2, threshold = 0.3)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
            .toMap
          // driver-side reference: same shingle definition, plain Scala sets
          def sh(ws: List[String]): Set[String] =
            if (ws.length < 2) Set(ws.mkString(" "))
            else ws.sliding(2).map(_.mkString(" ")).toSet
          val ref = (for {
            (a, ia) <- docs.zipWithIndex; (b, ib) <- docs.zipWithIndex
            if ia < ib
            inter = sh(a).intersect(sh(b)).size
            union = sh(a).union(sh(b)).size
            j = inter.toDouble / union
            if j >= 0.3
          } yield (ia.toLong, ib.toLong) -> j).toMap
          out == ref
        }
    }

  property("native top-k per key equals driver-side sort-take") =
    forAll(
      Gen.listOfN(20, Gen.zip(Gen.oneOf("p", "q"), Gen.choose(0, 100))),
      Gen.choose(1, 5)) { (rows, k) =>
      rows.isEmpty || {
        val withId = rows.zipWithIndex.map { case ((key, v), i) => (key, i.toLong, v) }
        val df = withId.toDF("k", "id", "v")
        val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        // .values first: flatMap directly on the Map would rebuild a Map of
        // (key, id) tuples and silently dedup to one entry per key
        val expected = withId.groupBy(_._1).values.flatMap { vs =>
          vs.sortBy(r => (-r._3, r._2)).take(k).map(r => (r._1, r._2))
        }.toSet
        out == expected
      }
    }
}
