package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the MinHash sketch.
  *
  * Input: `array<bigint>` of (distinct) shingle hashes. Output: an
  * `array<bigint>` of `numPerm` elements where element j =
  * min over shingle hashes h of XXH64(h, seed = j).
  *
  * Why an Expression and not `aggregate`/`zip_with`: Spark's higher-order
  * array functions are interpreted — every element step allocates lambda
  * bindings and walks an expression tree, and the O(shingles × numPerm)
  * inner product of a minhash is exactly the wrong place for that. This
  * expression runs the whole product as two tight primitive `long` loops
  * (hand-written in `nullSafeEval`, emitted as Java in `doGenCode`), stays
  * inside whole-stage codegen, allocates once per row, and returns an
  * `UnsafeArrayData` backed by the primitive array.
  *
  * Reference scope note: the reference engine needs no custom expressions
  * (SURVEY.md §2.10) — this exists for the training-data dedup extension,
  * where sketching dominates the 100 TB cost profile.
  */
case class MinHashSketchExpr(child: Expression, numPerm: Int) extends UnaryExpression {

  require(numPerm > 0, "numPerm must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(numPerm)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < numPerm) {
          val v = XXH64.hashLong(h, j.toLong)
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("mhOut")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $out = new long[$numPerm];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i);
         |    for (int $j = 0; $j < $numPerm; $j++) {
         |      long $v = $xxh.hashLong($h, (long) $j);
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSketchExpr =
    copy(child = newChild)
}
