package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration of graft's native expressions.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    or `SparkSession.builder.withExtensions(new GraftExtensions)` — the
  *    SparkSessionExtensions injection path;
  *  - `GraftFunctions.register(spark)` for an already-built session (test
  *    harnesses, notebooks).
  *
  * Registered SQL surface: `graft_minhash(arrayOfHashes[, numPerm])`,
  * `graft_simhash(arrayOfTokenHashes)`, `graft_dot(arrayA, arrayB)`, the
  * aggregates `graft_mg_sketch(item[, k])`, `graft_cm_sketch(item[, w, d])`,
  * `graft_gk_sketch(value[, eps])`, `graft_gk_merge(sketch)`, the
  * scalar `graft_gk_quantiles(sketch, probs)`, the funnel aggregate
  * `graft_funnel(ts, event_type, steps[, max_gap])`, and the vector
  * aggregates `graft_vec_sum(vec)`, `graft_moments(vec)` (count + Gram
  * + column sums in one pass), and `graft_cross_sum(a, b)` (the
  * block-wise Gram kernel). `NearestCentroidsExpr` is
  * deliberately NOT SQL-registered: its centroids are runtime-trained
  * constants, which SQL text cannot carry usefully — use
  * `Similarity.ivfTopK`. The same policy covers the PQ kernels
  * (`PqEncodeExpr`/`PqAdcDotExpr`/`PqLutExpr`/`PqLutDotExpr` — trained
  * codebooks; use [[graft.operators.AnnIndex]]) and
  * `StringSetContainsExpr` (a runtime-collected set; use
  * [[graft.operators.Boilerplate]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.minHashDescriptor)
    ext.injectFunction(GraftFunctions.simHashDescriptor)
    ext.injectFunction(GraftFunctions.dotDescriptor)
    ext.injectFunction(GraftFunctions.mgSketchDescriptor)
    ext.injectFunction(GraftFunctions.cmSketchDescriptor)
    ext.injectFunction(GraftFunctions.gkSketchDescriptor)
    ext.injectFunction(GraftFunctions.gkMergeDescriptor)
    ext.injectFunction(GraftFunctions.gkQuantilesDescriptor)
    ext.injectFunction(GraftFunctions.funnelDescriptor)
    ext.injectFunction(GraftFunctions.vecSumDescriptor)
    ext.injectFunction(GraftFunctions.momentsDescriptor)
    ext.injectFunction(GraftFunctions.crossSumDescriptor)
    ext.injectFunction(GraftFunctions.normalizeDescriptor)
    ext.injectFunction(GraftFunctions.deflateLenDescriptor)
    ext.injectFunction(GraftFunctions.stripAccentsDescriptor)
    ext.injectFunction(GraftFunctions.fixMojibakeDescriptor)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftFunctions {

  private def buildMinHash(children: Seq[Expression]): Expression = children match {
    case Seq(arr) => MinHashSketchExpr(arr, 64)
    case Seq(arr, Literal(n: Int, _)) => MinHashSketchExpr(arr, n)
    case _ =>
      throw new IllegalArgumentException(
        "graft_minhash(arrayOfHashes[, numPerm: int literal])")
  }

  val minHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSketchExpr].getName, "graft_minhash"),
    buildMinHash)

  val simHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
    {
      case Seq(arr) => SimHashExpr(arr)
      case _ => throw new IllegalArgumentException("graft_simhash(arrayOfTokenHashes)")
    })

  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
    {
      case Seq(a, b) => DotProductExpr(a, b)
      case _ => throw new IllegalArgumentException("graft_dot(arrayA, arrayB)")
    })

  /** Aggregate builders return the bare AggregateFunction — the analyzer
    * wraps it in an AggregateExpression like any declared aggregate.
    */
  val mgSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_mg_sketch"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_mg_sketch"),
    {
      case Seq(item) => MisraGriesAgg(item, 4096)
      case Seq(item, Literal(k: Int, _)) => MisraGriesAgg(item, k)
      case _ =>
        throw new IllegalArgumentException("graft_mg_sketch(item[, k: int literal])")
    })

  val cmSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_cm_sketch"),
    new ExpressionInfo(classOf[CountMinAgg].getName, "graft_cm_sketch"),
    {
      case Seq(item) => CountMinAgg(item, 2048, 5)
      case Seq(item, Literal(w: Int, _), Literal(d: Int, _)) => CountMinAgg(item, w, d)
      case _ =>
        throw new IllegalArgumentException(
          "graft_cm_sketch(item[, width: int literal, depth: int literal])")
    })

  val gkSketchDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_gk_sketch"),
    new ExpressionInfo(classOf[GkQuantileAgg].getName, "graft_gk_sketch"),
    {
      case Seq(value) => GkQuantileAgg(value, 0.01)
      case Seq(value, Literal(e: Double, _)) => GkQuantileAgg(value, e)
      case _ =>
        throw new IllegalArgumentException(
          "graft_gk_sketch(value[, relative_error: double literal])")
    })

  val gkMergeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_gk_merge"),
    new ExpressionInfo(classOf[GkMergeAgg].getName, "graft_gk_merge"),
    {
      case Seq(sketch) => GkMergeAgg(sketch)
      case _ => throw new IllegalArgumentException("graft_gk_merge(sketch)")
    })

  val gkQuantilesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_gk_quantiles"),
    new ExpressionInfo(classOf[GkQuantilesExpr].getName, "graft_gk_quantiles"),
    {
      case Seq(sketch, probs) => GkQuantilesExpr(sketch, probs)
      case _ =>
        throw new IllegalArgumentException("graft_gk_quantiles(sketch, array<double>)")
    })

  /** `graft_funnel(ts, event_type, steps_literal[, max_gap_literal])`:
    * the steps array must be a foldable array<string> (SQL text cannot
    * carry a runtime list any other way); max_gap an int/long literal.
    */
  private def evalStringArrayLiteral(e: Expression, what: String): Seq[String] = {
    require(e.foldable, s"$what must be a literal array of strings")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val v = a.get(i, org.apache.spark.sql.types.StringType)
          require(v != null, s"$what must not contain nulls")
          v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
        }
      case other =>
        throw new IllegalArgumentException(s"$what must be an array literal, got $other")
    }
  }

  private def evalLongLiteral(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case _ => throw new IllegalArgumentException(s"$what must be an int/long literal")
  }

  val funnelDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_funnel"),
    new ExpressionInfo(classOf[FunnelAgg].getName, "graft_funnel"),
    {
      case Seq(ts, tpe, stepsE) =>
        FunnelAgg(ts, tpe, evalStringArrayLiteral(stepsE, "graft_funnel steps"), None)
      case Seq(ts, tpe, stepsE, gapE) =>
        FunnelAgg(ts, tpe, evalStringArrayLiteral(stepsE, "graft_funnel steps"),
          Some(evalLongLiteral(gapE, "graft_funnel max_gap")))
      case _ =>
        throw new IllegalArgumentException(
          "graft_funnel(ts, event_type, array('s1','s2',…)[, max_gap: long literal])")
    })

  val vecSumDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_vec_sum"),
    new ExpressionInfo(classOf[VectorSumAgg].getName, "graft_vec_sum"),
    {
      case Seq(vec) => VectorSumAgg(vec)
      case _ => throw new IllegalArgumentException("graft_vec_sum(vec: array<float|double>)")
    })

  val momentsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_moments"),
    new ExpressionInfo(classOf[MomentsAgg].getName, "graft_moments"),
    {
      case Seq(vec) => MomentsAgg(vec)
      case _ => throw new IllegalArgumentException("graft_moments(vec: array<float|double>)")
    })

  val crossSumDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_cross_sum"),
    new ExpressionInfo(classOf[CrossSumAgg].getName, "graft_cross_sum"),
    {
      case Seq(a, b) => CrossSumAgg(a, b)
      case _ => throw new IllegalArgumentException(
        "graft_cross_sum(a: array<float|double>, b: array<float|double>)")
    })

  /** `graft_normalize(str[, 'NFC'|'NFD'|'NFKC'|'NFKD'])` — the form is a
    * string literal (a plan-time constant, like every trained/configured
    * argument on this surface); defaults to NFC.
    */
  val normalizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_normalize"),
    new ExpressionInfo(classOf[NormalizeUnicodeExpr].getName, "graft_normalize"),
    {
      case Seq(s) => NormalizeUnicodeExpr(s, "NFC")
      case Seq(s, Literal(f: org.apache.spark.unsafe.types.UTF8String, _)) =>
        NormalizeUnicodeExpr(s, f.toString)
      case _ =>
        throw new IllegalArgumentException(
          "graft_normalize(str[, form: string literal NFC|NFD|NFKC|NFKD])")
    })

  /** `graft_strip_accents(str)` — combining-mark removal (see
    * [[StripAccentsExpr]]).
    */
  val stripAccentsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_strip_accents"),
    new ExpressionInfo(classOf[StripAccentsExpr].getName, "graft_strip_accents"),
    {
      case Seq(s) => StripAccentsExpr(s)
      case _ => throw new IllegalArgumentException("graft_strip_accents(str)")
    })

  /** `graft_deflate_len(str)` — DEFLATE length of the UTF-8 bytes, the
    * compressibility quality signal (see [[DeflateLenExpr]]).
    */
  val deflateLenDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_deflate_len"),
    new ExpressionInfo(classOf[DeflateLenExpr].getName, "graft_deflate_len"),
    {
      case Seq(s) => DeflateLenExpr(s)
      case _ => throw new IllegalArgumentException("graft_deflate_len(str)")
    })

  /** `graft_fix_mojibake(str)` — undo CP1252↔UTF-8 double encoding
    * (see [[FixMojibakeExpr]]).
    */
  val fixMojibakeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_fix_mojibake"),
    new ExpressionInfo(classOf[FixMojibakeExpr].getName, "graft_fix_mojibake"),
    {
      case Seq(s) => FixMojibakeExpr(s)
      case _ => throw new IllegalArgumentException("graft_fix_mojibake(str)")
    })

  def register(spark: SparkSession): Unit =
    Seq(minHashDescriptor, simHashDescriptor, dotDescriptor, mgSketchDescriptor,
        cmSketchDescriptor, gkSketchDescriptor, gkMergeDescriptor, gkQuantilesDescriptor,
        funnelDescriptor, vecSumDescriptor, momentsDescriptor, crossSumDescriptor, normalizeDescriptor, deflateLenDescriptor,
        stripAccentsDescriptor, fixMojibakeDescriptor)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
}
