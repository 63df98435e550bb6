package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static normalization kernel — a top-level object so the generated Java
  * calls it through the static forwarder without reflection.
  */
object NfcKernel {
  /** NFC-normalize; already-normalized ASCII short-circuits via the JDK's
    * quick check (Normalizer.isNormalized is O(n) with no allocation), so
    * the common clean-corpus row pays one scan and zero copies.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column with whole-stage-codegen support — the canonicalization step
  * every text-dedup pipeline needs BEFORE hashing (the decomposed and
  * precomposed spellings of "café" are different byte strings, so exact
  * dedup, MinHash shingles, and fingerprints all miss the duplicate
  * unless inputs are normalized first). Spark has no built-in for this;
  * the usual Scala-UDF detour breaks whole-stage codegen in exactly the
  * per-row hot path where it hurts.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string input, got ${child.dataType.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcKernel.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
