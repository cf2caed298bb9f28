package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: the DEFLATE length of a document's
  * UTF-8 bytes. `deflate_len / raw_len` is the classic cheap
  * redundancy detector (used by the RefinedWeb/MassiveText-family
  * cleaning stacks): machine-generated or template text compresses far
  * below prose, and high-entropy noise barely compresses at all, so
  * pipelines keep a middle band. One tight per-row loop inside
  * whole-stage codegen — the Deflater is JDK zlib at a FIXED level, so
  * the byte count is deterministic for a given JDK (the correctness
  * gate pins constructed-input values AND order contracts rather than
  * cross-engine equality, since no SQL engine exposes deflate).
  */
object CompressExpressions {

  /** Fixed deflate level: 6 (zlib default — the speed/ratio point
    * corpus pipelines use; hard-coded so results are reproducible).
    */
  final val Level = 6

  /** Deflate `s`'s UTF-8 bytes (raw stream, no zlib header) and return
    * the compressed byte count. Static so codegen calls it directly.
    */
  def deflatedLength(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Catalyst expression wrapping [[deflatedLength]]: null-safe, one
    * static call per row from generated code (no boxing, no UDF
    * registry).
    */
  case class DeflateLength(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "deflate_length"

    override def nullSafeEval(input: Any): Any =
      deflatedLength(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // mirror-class static forwarder (the `X$.MODULE$` spelling also
      // compiles under Janino, but the forwarder is what Spark's own
      // StaticInvoke emits — one idiom everywhere)
      nullSafeCodeGen(ctx, ev,
        s => s"${ev.value} = graft.functions.CompressExpressions.deflatedLength($s);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def deflateLength(text: Column): Column =
    GraftColumnBridge.column(DeflateLength(GraftColumnBridge.expression(text)))
}
