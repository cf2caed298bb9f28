package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for the stopword language-ID machinery.
  *
  * The column-composed spelling (`TextStats.stopwordHitsReference` /
  * `langIdReference`) expands to 25 `wordOccurrences` chains — each a
  * padded `regexp_replace` + `replace` + length arithmetic — and when
  * `langId` AND `qualityScore` land in ONE filter (the corpus-build
  * clean stage) the inlined generated code crosses janino's 64 KB
  * method limit: whole-stage codegen fails to compile and the hottest
  * filter of the flagship 100 TB pipeline silently runs INTERPRETED
  * (observed as `InternalCompilerException: Code grows beyond 64 KB` +
  * fallback in round 5's verify logs). This expression computes all
  * per-language hit counts in one tight JVM loop and emits a single
  * CALL from generated code, so the surrounding stage keeps whole-stage
  * codegen no matter how many other signals share the filter.
  *
  * Bit-identical to the reference spelling by construction: the same
  * normalize (`(" "+text+" ").replaceAll("\\s+", " ")` — Spark's
  * `regexp_replace` compiles the identical Java pattern with identical
  * default flags) and the same non-overlapping left-to-right
  * replace-length trick (`String.replace` and `UTF8String.replace`
  * share those semantics; removed targets are BMP, so UTF-16 length
  * diffs equal Spark's codepoint length diffs). Pinned by
  * `StopwordExpressionsSpec` over the real corpus plus adversarial
  * whitespace/unicode edges.
  */
object StopwordExpressions {

  /** `(lang, total_hits)` per document: `lang` is the argmax language by
    * stopword hits (ties → first in [[graft.ext.TextStats.stopwords]]
    * order, zero hits → "und"), `total_hits` the sum over all languages.
    *
    * NOT null-safe: the reference CASE chain maps a NULL document to
    * "und" through its `otherwise` branch (every `when` condition is
    * null), and its stopword-total comparison `null > 0` behaves as
    * false — so NULL text yields ("und", 0), never a null struct.
    */
  case class StopwordSignalsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("lang", StringType, nullable = false),
      StructField("total_hits", IntegerType, nullable = false)))
    override def nullable: Boolean = false
    override def prettyName: String = "stopword_signals"

    /** Shared ("und", 0) row for NULL input; consumers copy on write. */
    lazy val nullResult: InternalRow =
      new GenericInternalRow(Array[Any](UTF8String.fromString("und"), 0))

    @transient private lazy val langs: Array[String] =
      graft.ext.TextStats.stopwords.map(_._1).toArray
    // " word " search targets, grouped per language
    @transient private lazy val targets: Array[Array[String]] =
      graft.ext.TextStats.stopwords.map(_._2.map(w => s" $w ").toArray).toArray
    @transient private lazy val wsPattern = Pattern.compile("\\s+")

    /** Public so generated code can call it via an `addReferenceObj`
      * handle; one invocation per row replaces ~25 inlined chains.
      */
    def compute(s: UTF8String): InternalRow = {
      val norm = wsPattern.matcher(" " + s.toString + " ").replaceAll(" ")
      val normLen = norm.length
      val nLangs = langs.length
      var total = 0
      var bestLang: String = null
      var bestHits = 0
      var li = 0
      while (li < nLangs) {
        val ts = targets(li)
        var h = 0
        var wi = 0
        while (wi < ts.length) {
          val t = ts(wi)
          // replace-length trick, identical to the reference column
          // spelling: each removed " w " occurrence shortens by |w|+1
          h += (normLen - norm.replace(t, " ").length) / (t.length - 1)
          wi += 1
        }
        if (h > bestHits) { bestHits = h; bestLang = langs(li) }
        total += h
        li += 1
      }
      val lang = if (bestHits == 0) "und" else bestLang
      new GenericInternalRow(Array[Any](UTF8String.fromString(lang), total))
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) nullResult else compute(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val ref = ctx.addReferenceObj("stopwordSignals", this,
        classOf[StopwordSignalsExpr].getName)
      val childGen = child.genCode(ctx)
      val rowCls = classOf[InternalRow].getName
      val resultCode =
        code"""
          |${childGen.code}
          |$rowCls ${ev.value} = ${childGen.isNull}
          |    ? $ref.nullResult() : $ref.compute(${childGen.value});
        """.stripMargin
      ev.copy(code = resultCode,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def stopwordSignals(text: Column): Column =
    GraftColumnBridge.column(StopwordSignalsExpr(GraftColumnBridge.expression(text)))
}
