package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{GraftFunctions, MinHashSketchExpr}
import graft.operators.Dedup

/** The native codegen'd minhash expression: interpreted vs codegen parity,
  * SQL registration, and sketch semantics.
  */
class MinHashExprSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("codegen and interpreted eval agree") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 20L, 30L)),
      (3L, Seq(99L)),
      (4L, Seq.empty[Long])).toDF("id", "hashes")
    // Normal query path → whole-stage codegen.
    val viaQuery = df.select(col("id"), Dedup.minHashFromHashes(col("hashes"), 16).as("mh"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    // Direct interpreted eval of the same expression.
    import org.apache.spark.sql.catalyst.util.ArrayData
    val interp = Map(
      1L -> ArrayData.toArrayData(Array(10L, 20L, 30L)),
      3L -> ArrayData.toArrayData(Array(99L)),
      4L -> ArrayData.toArrayData(Array.empty[Long])
    ).map { case (k, v) =>
      k -> MinHashSketchExpr(org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)), 16).nullSafeEval(v)
        .asInstanceOf[ArrayData].toLongArray.toSeq
    }
    assert(viaQuery(1L) == interp(1L))
    assert(viaQuery(3L) == interp(3L))
    assert(viaQuery(4L) == interp(4L))
    assert(viaQuery(1L) == viaQuery(2L), "same input, same sketch")
    assert(viaQuery(1L).length == 16)
    assert(viaQuery(4L).forall(_ == Long.MaxValue), "empty set → identity sketch")
  }

  test("sketch min-merges: sketch(A ∪ B) = elementwise min of sketches") {
    val a = Array(1L, 2L, 3L)
    val b = Array(4L, 5L)
    import org.apache.spark.sql.catalyst.util.ArrayData
    def sk(xs: Array[Long]) = MinHashSketchExpr(org.apache.spark.sql.graft.ColumnBridge.expression(lit(1)), 32)
      .nullSafeEval(ArrayData.toArrayData(xs)).asInstanceOf[ArrayData].toLongArray
    val merged = sk(a).zip(sk(b)).map { case (x, y) => math.min(x, y) }
    assert(sk(a ++ b).sameElements(merged))
  }

  test("graft_minhash is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_minhash(array(xxhash64('a'), xxhash64('b')), 8) AS mh")
      .head().getSeq[Long](0)
    assert(out.length == 8)
    assert(out.forall(_ != Long.MaxValue))
    val defaulted = spark.sql("SELECT graft_minhash(array(1L, 2L)) AS mh").head().getSeq[Long](0)
    assert(defaulted.length == 64)
  }
}
