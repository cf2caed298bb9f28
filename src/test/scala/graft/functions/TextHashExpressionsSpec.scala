package graft.functions

import graft.SparkTestBase
import graft.ext.{Dedup, TextStats}
import org.apache.spark.sql.functions._

class TextHashExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely unrelated content here",
    "single",
    "",
    "  spaced   out   tokens  "
  ).toDF("text")

  test("native rolling hash is bit-identical to the higher-order aggregate spelling") {
    val rows = texts.select(
      TextStats.fingerprintRolling($"text").as("fast"),
      TextStats.fingerprintRollingHof($"text").as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("native simhash is bit-identical to the nested-aggregate spelling") {
    val rows = texts.select(
      Dedup.simHash64($"text").as("fast"),
      Dedup.simHash64Hof($"text").as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("native simhash matches the bulk explode+aggregate form") {
    val df = texts.withColumn("doc_id", monotonically_increasing_id())
    val exprSide = df.select($"doc_id".as("id"), Dedup.simHash64($"text").as("sh"))
    val bulkSide = Dedup.simHashes(df, "doc_id", "text")
    val joined = exprSide.as("a").join(bulkSide.as("b"), Seq("id"))
      .select($"a.sh", $"b.sh").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("expressions stay inside whole-stage codegen (no CodegenFallback)") {
    // range source, not a local relation — ConvertToLocalRelation would
    // otherwise fold the projection away at optimize time
    val df = spark.range(8).select(
      concat_ws(" ", lit("tok"), $"id".cast("string"), lit("x")).as("text"))
    // TWO instances of each expression in one projection: with a
    // non-nullable child, nullSafeCodeGen inlines the snippets unbraced
    // into one method scope, so non-fresh local names would collide (a
    // bug this test caught once); CODEGEN_ONLY turns the silent
    // interpreter fallback into a hard failure
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val proj = df.select(
        TextStats.fingerprintRolling($"text"),
        TextStats.fingerprintRolling(concat($"text", lit(" y"))),
        Dedup.simHash64($"text"),
        Dedup.simHash64(concat($"text", lit(" y"))))
      val codegenSpans = proj.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(codegenSpans.nonEmpty, proj.queryExecution.executedPlan.toString)
      assert(proj.collect().length === 8)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    // the HOF spellings, by contrast, are interpreted ArrayAggregates —
    // that's the whole point of the native forms
  }

  test("null array input yields null, null elements mix like the built-in") {
    val df = Seq((Some(Seq("a", "b")), 1), (None, 2)).toDF("arr", "k")
    val got = df.select(TextHashExpressions.simHash64($"arr")).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
    val roll = df.select(
      TextHashExpressions.rollingXxHash64($"arr", TextStats.rollingSeed)).collect()
    assert(!roll(0).isNullAt(0))
    assert(roll(1).isNullAt(0))
  }
}
