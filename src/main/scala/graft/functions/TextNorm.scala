package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text canonicalization — the step BEFORE any
  * content hash / shingle / fingerprint, so that byte-different but
  * canonically-equal strings ("é" precomposed vs "e"+combining-accent)
  * dedup together. Spark ships no normalizer builtin; this wraps the
  * JVM's `java.text.Normalizer` (the reference Unicode implementation) in
  * a codegen'd expression, so it runs inside whole-stage codegen like the
  * rest of the text family — no UDF, no boxing beyond the String the JDK
  * API requires. */
object TextNorm {
  /** Static helper shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    // the common case (already normalized ASCII/NFC text) is a cheap
    // isNormalized scan with no allocation
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Codegen'd `string → string` Unicode normalizer; `form` is one of
  * NFC | NFD | NFKC | NFKD (NFC is what SQL engines with a normalizer
  * builtin expose, so NFC results are oracle-checkable). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  java.text.Normalizer.Form.valueOf(form) // fail at construction, not per row

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"UnicodeNormalize expects string input, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    TextNorm.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.TextNorm.normalize($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
