package graft.functions

import graft.SparkTestBase
import graft.ext.TextStats
import org.apache.spark.sql.functions._

/** The native stopword-signals expression must be BIT-IDENTICAL to the
  * column-composed reference spellings it replaced — the DuckDB oracles
  * replay the reference shape in SQL, so any divergence is a silent
  * gate failure waiting for the SF where the corpora differ.
  *
  * Pins equality over the real sf0.001 documents corpus (what the gate
  * actually reads) plus an adversarial edge battery: whitespace
  * variants (`\s` is ASCII-only in both paths), unicode spaces that \s
  * must NOT collapse, CJK stopwords, supplementary-plane chars (UTF-16
  * vs codepoint length accounting), cross-language ties, and overlap
  * chains (" the the " — the non-overlapping left-to-right replace).
  */
class StopwordExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private val edges = Seq(
    "",
    " ",
    "\t\n  \r",
    "the a of and to",                     // pure en stopwords
    "der die und nicht das",               // pure de
    "the der",                             // 1-1 tie -> first in order (en)
    "el le",                               // es-fr tie -> es
    "的 是 在 了 和",                        // zh
    "the a of",                       // NBSP is NOT \s: "the a" is one token
    "the the the",                         // overlap chain for the replace trick
    " the  the\tthe ",                     // runs collapse before counting
    "😀 the 😀 of 😀", // supplementary chars around hits
    "word with no stopwords here?!",
    "a" * 5000,
    ("lorem " * 30).trim,
    "und nicht the a of and to der")       // en 5 vs de 2

  private def corpus = {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
    docs.unionByName(edges.toDF("text"))
      .unionByName(Seq[Option[String]](None).toDF("text"))
  }

  test("langId fast path == column-composed reference on corpus + edges") {
    val diff = corpus.select(
        TextStats.langId(col("text")).as("fast"),
        TextStats.langIdReference(col("text")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(diff.count() === 0, diff.collect().mkString("; "))
  }

  test("qualityScore fast path == column-composed reference on corpus + edges") {
    val diff = corpus.select(
        TextStats.qualityScore(col("text")).as("fast"),
        TextStats.qualityScoreReference(col("text")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(diff.count() === 0, diff.collect().mkString("; "))
  }

  test("interpreted eval matches codegen path") {
    // force the interpreted path through the expression's nullSafeEval
    val e = StopwordExpressions.StopwordSignalsExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "the der die a of", org.apache.spark.sql.types.StringType))
    val row = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getUTF8String(0).toString === "en")   // en 3 beats de 2
    assert(row.getInt(1) === 5)
  }

  test("null text -> und, matching the reference chain's otherwise branch") {
    val out = Seq[Option[String]](None).toDF("text")
      .select(TextStats.langId(col("text")).as("l"),
        TextStats.langIdReference(col("text")).as("r")).collect()
    assert(out.head.getString(0) === "und")
    assert(out.head.getString(1) === "und")
  }
}
