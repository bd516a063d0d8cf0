package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole shingle-hash computation as one static method, called from
  * both the interpreted and the codegen path: the generated Java is a
  * single invocation, so the hot loop lives in ONE JVM-compiled method
  * that C2 optimizes once per process — the stable-codegen pattern the
  * MinHash expression uses.
  */
object ShingleHashes {

  // identical regex/flags to Spark's split(c, "\\s+") (ASCII \s, no flags)
  private val Whitespace = Pattern.compile("\\s+")

  /** Distinct (first-occurrence order) xxhash64 values of the word
    * k-shingles of `text` — value-identical to
    * `array_distinct(transform(text.shingles(c, k), s => xxhash64(s)))`.
    */
  def eval(text: UTF8String, k: Int): UnsafeArrayData = {
    // trim == Spark's trim(): ASCII space only, both ends
    val parts = Whitespace.split(text.trim().toString, -1)
    var n = 0
    val toks = new Array[String](parts.length)
    var p = 0
    while (p < parts.length) {
      if (parts(p).nonEmpty) { toks(n) = parts(p); n += 1 }
      p += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(1, n))
    def add(shingle: String): Unit = {
      val h = hash(shingle)
      if (seen.add(h)) out += h
    }
    if (n < k) {
      // short/empty docs: ONE shingle = all tokens joined ("" when none)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < n) { if (i > 0) sb.append(' '); sb.append(toks(i)); i += 1 }
      add(sb.toString)
    } else {
      var i = 0
      while (i <= n - k) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        add(sb.toString)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  /** xxhash64(string, seed 42) exactly as Spark's `xxhash64` function:
    * XXH64 over the UTF-8 bytes.
    */
  private def hash(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }
}

/** Native form of the dedup prep's shingle hashing.
  *
  * The composed column — `split` → `filter` → CASE → `sequence` →
  * `transform(slice/concat_ws)` → `transform(xxhash64)` → `array_distinct`
  * — evaluates through interpreted higher-order functions: per row it
  * allocates lambda bindings, an index array, a sliced copy per shingle,
  * and walks an expression tree per element. That chain was the dominant
  * CPU of the MinHash dedup pipeline (the sketch itself is already the
  * native [[MinHashSketchExpr]]). This expression produces value-identical
  * output (spec- and property-pinned against the composed form) in one
  * tight method: ~tokens array allocations per row and nothing else.
  *
  * Output contract (shared with the composed form): NULL text → NULL;
  * fewer than k tokens → the single joined-tokens shingle ("" when no
  * tokens); hashes are xxhash64(shingle, seed 42); distinct preserving
  * first occurrence.
  */
case class ShingleHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "shingle size k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes requires a string column, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.eval(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.expressions.ShingleHashes.eval($text, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}
