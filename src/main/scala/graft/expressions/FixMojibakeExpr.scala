package graft.expressions

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Undo CP1252↔UTF-8 double encoding ("mojibake": `café` shipped as
  * `cafÃ©`, `’` as `â€™`) — the ftfy-core repair every crawl corpus
  * needs, as a native codegen'd expression.
  *
  * The rule is conservative and deterministic: re-encode the string
  * as windows-1252 (STRICT — any unmappable char aborts) and strictly
  * decode those bytes as UTF-8; accept only if that succeeds. A
  * character ≥ U+0080 then always collapses into a shorter string, so
  * repeated application terminates; up to 3 rounds undo nested double
  * encoding. What can never be altered:
  *
  *   - pure ASCII (raw-byte fast path, zero allocation);
  *   - genuine single-encoded text (`café`: 0xE9 alone is invalid
  *     UTF-8 → abort);
  *   - text with chars outside CP1252 (CJK, emoji → strict encoder
  *     aborts);
  *   - CP1252 specials standing alone (`€` → 0x80 is a continuation
  *     byte → invalid UTF-8 → abort).
  *
  * False positives require a string of CP1252 characters whose
  * 1252-bytes happen to form valid UTF-8 — exactly the byte pattern
  * real mojibake produces (lead char Ã/Â/â/Ê… followed by
  * continuation-range chars), vanishingly rare in intentional text;
  * that residual risk is the documented trade of every mojibake
  * fixer (ftfy's "sloppy" heuristics accept the same class).
  */
object FixMojibakeExpr {
  private val cp1252: Charset = Charset.forName("windows-1252")

  /** Static entry shared by interpreted eval and generated code. */
  def fix(s: UTF8String): UTF8String = {
    // fast path: all bytes < 0x80 (ASCII) cannot be mojibake — return
    // the SAME UTF8String, no decode, no allocation
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    var cur = s.toString
    var rounds = 0
    var changed = false
    while (rounds < 3) {
      val undone = undoOnce(cur)
      if (undone == null) {
        return if (changed) UTF8String.fromString(cur) else s
      }
      cur = undone
      changed = true
      rounds += 1
    }
    UTF8String.fromString(cur)
  }

  /** One round of undo, or null if the string is not (this round)
    * mojibake: strict 1252-encode, strict UTF-8-decode.
    */
  private def undoOnce(s: String): String = {
    val enc = cp1252.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val bytes =
      try enc.encode(java.nio.CharBuffer.wrap(s))
      catch { case _: CharacterCodingException => return null }
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val out =
      try dec.decode(bytes)
      catch { case _: CharacterCodingException => return null }
    val res = out.toString
    if (res == s) null else res
  }
}

/** `graft_fix_mojibake(string)` — see [[FixMojibakeExpr.fix]]. */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_fix_mojibake requires a string child, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_fix_mojibake"

  override def nullSafeEval(v: Any): Any =
    FixMojibakeExpr.fix(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FixMojibakeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $cls.fix($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}
