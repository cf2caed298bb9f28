package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Every custom expression's generated Java must actually COMPILE.
  *
  * A doGenCode bug (an unresolvable class name, a type slip) does not
  * fail any query: Spark catches the Janino CompileException and falls
  * back to interpreted eval per projection, logging one WARN — results
  * stay correct, the plan string still shows `*(n)`, and the only
  * symptom is the hot path silently running interpreted. Exactly that
  * shipped for bpe_encode (`Bpe$.MODULE$` doesn't exist when the object
  * has no companion class). This spec compiles each expression's
  * unsafe projection EAGERLY — GenerateUnsafeProjection.generate throws
  * on compile failure instead of falling back.
  */
class CodegenCompileSpec extends SparkTestBase {

  private val str = BoundReference(0, StringType, nullable = true)
  private val strArr =
    BoundReference(0, ArrayType(StringType, containsNull = true), nullable = true)
  private val intArr =
    BoundReference(0, ArrayType(IntegerType, containsNull = false), nullable = true)

  private def compiles(name: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    test(s"$name generated code compiles (no interpreted fallback)") {
      GenerateUnsafeProjection.generate(Seq(e), subexpressionEliminationEnabled = false)
    }

  compiles("bpe_encode", Bpe.BpeEncodeExpr(str))
  compiles("bpe_decode", Bpe.BpeDecodeExpr(intArr))
  compiles("deflate_length", CompressExpressions.DeflateLength(str))
  compiles("rolling_xxhash64", TextHashExpressions.RollingXxHash64(strArr, 42L))
  compiles("simhash64", TextHashExpressions.SimHash64Expr(strArr))

  private val dblArr = BoundReference(0,
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false),
    nullable = true)
  private val dblArr2 = dblArr.copy(ordinal = 1)
  compiles("vec_dot", VectorExpressions.DotProduct(dblArr, dblArr2))
  compiles("vec_cosine", VectorExpressions.CosineSimilarity(dblArr, dblArr2))
  compiles("nfc_normalize", UnicodeExpressions.NfcNormalize(str, compat = false))
  compiles("nfkc_normalize", UnicodeExpressions.NfcNormalize(str, compat = true))
  compiles("stopword_signals", StopwordExpressions.StopwordSignalsExpr(str))
}
