package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Accent/diacritic stripping as a native codegen'd expression — the
  * search-normalization step (`café` → `cafe`, `Zürich` → `Zurich`)
  * that folds typographic variants of the same word into one token
  * identity before matching, deduplication, or language-agnostic
  * indexing. Works on COMPOSED and DECOMPOSED input alike:
  * NFD-decompose, drop every combining mark (Unicode categories Mn,
  * Mc, Me — the utf8proc STRIPMARK set DuckDB's `strip_accents`
  * implements, which the q160 oracle gates against), then
  * NFC-recompose what remains. Letters with no decomposition (`ø`,
  * `ß`, `đ`) pass through unchanged by Unicode's own rules — this is
  * mark removal, not ASCII transliteration.
  *
  * Fast path: pure-ASCII input (the overwhelming majority of a crawl
  * corpus) returns the original UTF8String after one byte scan — no
  * decompose, no allocation. Stays inside whole-stage codegen with one
  * static call per row.
  */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_strip_accents requires a string child, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(v: Any): Any =
    StripAccentsExpr.strip(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = StripAccentsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $cls.strip($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object StripAccentsExpr {

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** Static worker shared by interpreted eval and generated code. */
  def strip(v: UTF8String): UTF8String = {
    // ASCII fast path on the raw bytes — no String materialization
    val n = v.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((v.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return v
    val d = Normalizer.normalize(v.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val cp = d.codePointAt(j)
      if (!isMark(cp)) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
