package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression — the first hygiene
  * pass of any multilingual corpus: the same visible text arrives from
  * the web in composed and decomposed forms (é as U+00E9 vs e+U+0301),
  * and every downstream dedup fingerprint, tokenizer, and equality
  * join silently fragments unless the corpus is normalized to one
  * form first. Spark has no built-in for this; the JDK's Normalizer
  * implements the Unicode standard exactly (as does DuckDB's
  * `nfc_normalize`, which is what lets the gate be cross-engine).
  */
object UnicodeExpressions {

  /** NFC-normalize (canonical composition — the form web text should
    * land in; W3C's choice for the web). Static so codegen calls it
    * directly. Fast path: Normalizer.isNormalized avoids allocating
    * for the (overwhelmingly common) already-NFC input.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** NFKC (compatibility composition: also folds width/ligature/
    * superscript variants — the aggressive form tokenizer pipelines
    * often prefer).
    */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  case class NfcNormalize(child: Expression, compat: Boolean)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = if (compat) "nfkc_normalize" else "nfc_normalize"

    private def fn: String = if (compat) "nfkc" else "nfc"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      if (compat) nfkc(s) else nfc(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // mirror-class static forwarder (CodegenCompileSpec pins compilation)
      nullSafeCodeGen(ctx, ev,
        s => s"${ev.value} = graft.functions.UnicodeExpressions.$fn($s);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text), compat = false))

  def nfkcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text), compat = true))
}
