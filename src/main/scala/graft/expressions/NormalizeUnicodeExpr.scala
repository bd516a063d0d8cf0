package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native codegen'd
  * expression — stage one of any multilingual text pipeline: the same
  * user-visible text arrives as composed (`é`), decomposed (`e`+U+0301),
  * compatibility (ligature `ﬁ`, fullwidth `１`) byte sequences, and every
  * downstream identity — exact dedup hash, shingle set, token — silently
  * fragments until the bytes are canonicalized.
  *
  * Backed by `java.text.Normalizer` (ICU-equivalent tables from the JDK's
  * Unicode data — a public standard both engines implement identically:
  * the NFC face is oracle-gated against DuckDB's `nfc_normalize`).
  * A UDF would serialize through ScalaUDF per row; this stays inside
  * whole-stage codegen with one static-method call on the UTF-16 string.
  * The fast path: `Normalizer.isNormalized` is O(n) scan-only for
  * already-normal text (the overwhelming majority of a real corpus), so
  * the allocation+rebuild cost is paid only by rows that need it.
  */
case class NormalizeUnicodeExpr(child: Expression, form: String)
  extends UnaryExpression {

  require(NormalizeUnicodeExpr.forms.contains(form),
    s"graft_normalize form must be one of ${NormalizeUnicodeExpr.forms.keys.mkString(", ")}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a string child, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  // resolved ONCE per expression instance — a per-row Map lookup of a
  // plan-time constant has no place on the corpus-scale hot path
  @transient private lazy val resolvedForm: Normalizer.Form =
    NormalizeUnicodeExpr.forms(form)

  override def nullSafeEval(v: Any): Any =
    NormalizeUnicodeExpr.normalize(v.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormalizeUnicodeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val formRef = ctx.addReferenceObj("graftNormForm", resolvedForm, classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $cls.normalize($v, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicodeExpr =
    copy(child = newChild)
}

object NormalizeUnicodeExpr {
  private[expressions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  /** Static worker shared by interpreted eval and generated code. */
  def normalize(v: UTF8String, f: Normalizer.Form): UTF8String = {
    val s = v.toString
    if (Normalizer.isNormalized(s, f)) v
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }
}
