package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** O(1) membership probe of a string column against a driver-built set,
  * shipped once per task as a plan reference object.
  *
  * The alternative — `array_contains(typedLit(items), x)` — scans the
  * literal array per call: at [[graft.operators.Boilerplate]]'s 100k-line
  * cap that is ~10⁵ string comparisons per input LINE, the round-8
  * "What's wrong #2". Here the set is hashed once at construction and
  * each probe is one UTF8String hash + bucket lookup, in both
  * interpreted eval (the higher-order-function path, where lambdas run
  * interpreted) and generated Java.
  *
  * The set rides the expression as a reference object (same mechanism as
  * a broadcast-hash-join's relation): serialized once per plan, not once
  * per row group or per call site.
  */
case class StringSetContainsExpr(child: Expression, items: Seq[UTF8String])
  extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_set_contains requires a string child, got ${t.catalogString}")
  }

  override def prettyName: String = "graft_set_contains"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, items.size * 2))
    items.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any = set.contains(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftStringSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $setRef.contains($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): StringSetContainsExpr =
    copy(child = newChild)
}
