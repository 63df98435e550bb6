package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: fused cosine similarity over two
  * ARRAY<FLOAT> columns with full whole-stage-codegen support (SURVEY.md
  * §2.11 preference order: native Expression > higher-order functions >
  * UDF). One generated loop computes dot product and both norms — no
  * intermediate arrays, no lambda-call overhead, stays inside the
  * WholeStageCodegen span.
  *
  * The 1e-12 denominator guard mirrors the reference's zero-division
  * convention (src/compare_xception_featuremaps.py:50-62).
  *
  * Mismatched vector lengths return NULL — a length mismatch is a data
  * error, and truncating to the shorter side would return a
  * plausible-looking similarity that hides it. A null ELEMENT inside
  * either array also yields NULL (checked only when the array type admits
  * nulls, so the common containsNull=false scan pays nothing).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private def elemIsFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHoldNullElems(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    val lf = elemIsFloat(left.dataType); val rf = elemIsFloat(right.dataType)
    val ln = mayHoldNullElems(left.dataType)
    val rn = mayHoldNullElems(right.dataType)
    var i = 0
    while (i < n) {
      if ((ln && x.isNullAt(i)) || (rn && y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny) + 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getA = if (elemIsFloat(left.dataType)) "getFloat" else "getDouble"
      val getB = if (elemIsFloat(right.dataType)) "getFloat" else "getDouble"
      val nullElemCheck = (if (mayHoldNullElems(left.dataType))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }" else "") +
        (if (mayHoldNullElems(right.dataType))
          s"if ($b.isNullAt($i)) { ${ev.isNull} = true; break; }" else "")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0, $nx = 0.0, $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $nullElemCheck
            double $xi = (double) $a.$getA($i);
            double $yi = (double) $b.$getB($i);
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny) + 1e-12);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native functions: enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`, then
  * `SELECT cosine_sim(a, b)` / `expr("cosine_sim(a, b)")` anywhere.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Register a Column-composer as a 1-arg SQL function: the composed
    * expression tree inlines into the caller's plan (still pure Catalyst —
    * no UDF boundary), so `SELECT graft_quality(text)` optimizes exactly
    * like the library call.
    */
  private def colFn1(name: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column) = ((
    new FunctionIdentifier(name),
    new ExpressionInfo(classOf[GraftExtensions].getName, name),
    (children: Seq[Expression]) => {
      // analysis-time arity guard: without it `graft_quality()` dies with
      // an opaque NoSuchElementException and extra args are silently
      // ignored
      if (children.size != 1)
        throw new IllegalArgumentException(
          s"$name expects exactly 1 argument, got ${children.size}")
      ColumnBridge.convertedExpression(f(ColumnBridge.column(children.head)))
    }))

  private def arity(name: String, n: Int, children: Seq[Expression]): Unit =
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$name expects exactly $n arguments, got ${children.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom optimizer rule (the Rule[LogicalPlan] extension point):
    // nested NFC normalizations collapse to one — see CollapseNfc
    ext.injectOptimizerRule(_ => CollapseNfc)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        arity("cosine_sim", 2, children)
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        arity("graft_nfc", 1, children)
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("int8_cosine"),
      new ExpressionInfo(classOf[Int8Cosine].getName, "int8_cosine"),
      (children: Seq[Expression]) => {
        arity("int8_cosine", 4, children)
        Int8Cosine(children(0), children(1), children(2), children(3))
      }))
    // SQL surface for the text/hash library: the same Catalyst trees the
    // Scala API composes, reachable from pure SQL sessions
    ext.injectFunction(colFn1("graft_lang_id", graft.functions.TextOps.langId))
    ext.injectFunction(colFn1("graft_quality", graft.functions.TextOps.qualityScore))
    ext.injectFunction(colFn1("graft_knuth32", graft.operators.Dedup.knuth32))
  }
}
