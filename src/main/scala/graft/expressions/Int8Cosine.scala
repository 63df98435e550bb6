package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen scoring kernel for the int8-quantized ANN scan
  * (graft.operators.SimilaritySearch.int8BruteForceTopK): asymmetric cosine
  * between a quantized corpus vector (packed bytes + scale + precomputed
  * norm) and a float query vector. The generated loop reads the bytes
  * directly from the unsafe row — no per-row Seq[Float] conversion, no UDF
  * serialization boundary — which matters because brute-force scoring
  * evaluates |corpus|·|Q| of these per scan. Same preference-order argument
  * as [[CosineSimilarity]] (native Expression > HOF > UDF); arithmetic
  * order matches the UDF form exactly, so swapping them is bit-identical.
  */
case class Int8Cosine(qv: Expression, scale: Expression, qnorm: Expression,
    fq: Expression) extends QuaternaryExpression {

  override def first: Expression = qv
  override def second: Expression = scale
  override def third: Expression = qnorm
  override def fourth: Expression = fq

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = qv.dataType == BinaryType &&
      (scale.dataType == FloatType || scale.dataType == DoubleType) &&
      qnorm.dataType == DoubleType &&
      (fq.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "int8_cosine expects (binary, float, double, array<float>), got " +
        Seq(qv, scale, qnorm, fq).map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def nullSafeEval(q: Any, s: Any, n: Any, f: Any): Any = {
    val bytes = q.asInstanceOf[Array[Byte]]
    val arr = f.asInstanceOf[ArrayData]
    val len = math.min(bytes.length, arr.numElements())
    var dot = 0.0; var fn2 = 0.0
    var i = 0
    while (i < len) {
      val fi = arr.getFloat(i)
      dot += bytes(i).toDouble * fi
      fn2 += fi.toDouble * fi
      i += 1
    }
    val sc = s match {
      case x: java.lang.Float => x.toDouble
      case x: java.lang.Double => x.doubleValue()
      case x => x.asInstanceOf[Float].toDouble
    }
    dot * sc / (n.asInstanceOf[Double] * math.sqrt(fn2) + 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, s, n, f) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val dot = ctx.freshName("dot")
      val fn2 = ctx.freshName("fn2")
      val fi = ctx.freshName("fi")
      s"""
        int $len = java.lang.Math.min($q.length, $f.numElements());
        double $dot = 0.0, $fn2 = 0.0;
        for (int $i = 0; $i < $len; $i++) {
          double $fi = (double) $f.getFloat($i);
          $dot += ((double) $q[$i]) * $fi;
          $fn2 += $fi * $fi;
        }
        ${ev.value} = $dot * ((double) $s) /
          ($n * java.lang.Math.sqrt($fn2) + 1e-12);
      """
    })

  override protected def withNewChildrenInternal(
      f1: Expression, f2: Expression, f3: Expression,
      f4: Expression): Int8Cosine =
    copy(qv = f1, scale = f2, qnorm = f3, fq = f4)
}
