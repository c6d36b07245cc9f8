package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition — combining sequences like `e` + U+0301 collapse to
  * `é`, singleton compatibility forms are left alone). Spark has no
  * built-in normalizer, and text dedup/fingerprinting is wrong
  * without one: the same visible string hashes differently depending
  * on which decomposition the source emitted. Implemented over
  * `java.text.Normalizer` (the JDK's ICU-aligned implementation) with
  * a static-call `doGenCode`, so it stays inside whole-stage codegen
  * like a built-in — no UDF, no codegen break.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-normalized is the common case (all ASCII is);
    // skip the rebuild when the normalizer would be an identity
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
