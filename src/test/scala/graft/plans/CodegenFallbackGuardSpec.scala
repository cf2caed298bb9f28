package graft.plans

import graft.{SparkEntry, SparkTestBase}

/** Flagship plans must EXECUTE under whole-stage codegen — no janino
  * fallback.
  *
  * A "Code grows beyond 64 KB" overflow does not fail a query: Spark
  * logs one WARN and re-executes the stage INTERPRETED, which on a
  * wide filter is a silent 2–5× row-throughput tax — exactly what
  * round 5 shipped on the corpus-build clean stage (50 inlined
  * `wordOccurrences` chains in one Filter). `CodegenCompileSpec`
  * guards each custom expression's own generated code; this spec
  * guards the COMPOSED plans: with `spark.sql.codegen.fallback=false`,
  * a whole-stage compile failure throws instead of falling back, so
  * executing the flagship queries here fails loudly on any future
  * codegen-size regression.
  */
class CodegenFallbackGuardSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  // span inspection runs on a non-adaptive plan: under AQE the
  // WholeStageCodegen collapse happens per stage at materialization,
  // so an un-executed adaptive plan exposes no spans to collect
  private lazy val noAqe = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  // the wide-filter flagships that have overflowed (or nearly) before,
  // plus the widest composed projections and the new macro joins
  private val flagships = Seq(
    "q_pipe_corpus_build",
    "q_ext_clean_report",
    "q_ext_c4_rules",
    "q_ext_langid_confusion",
    "q_ext_text_stats",
    "q_ext_dsir",
    "q_ext_chunking",
    "q_x8_tpch_q3",
    "q_x9_tpch_q5",
    "q_ext_pq_encode")

  flagships.foreach { name =>
    test(s"$name executes with codegen fallback disabled") {
      val prev = spark.conf.getOption("spark.sql.codegen.fallback")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      try {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        assert(n > 0)
        // fallback=false only catches janino COMPILE failures; the
        // hugeMethodLimit bailout (a compiled method > 65535 bytes)
        // silently re-executes interpreted without consulting that
        // flag. Compile every whole-stage span's generated code and
        // pin the max method size under the bailout threshold — and
        // require the plan to HAVE codegen spans at all, so a plan
        // that silently lost whole-stage codegen also fails here.
        import org.apache.spark.sql.execution.debug._
        val plan = SparkEntry.queries(name)(noAqe, sfDir)
          .queryExecution.executedPlan
        val spans = codegenStringSeq(plan)
        assert(spans.nonEmpty, s"$name lost all WholeStageCodegen spans")
        val hugeLimit = spark.conf
          .get("spark.sql.codegen.hugeMethodLimit", "65535").toInt
        spans.foreach { case (subtree, _, stats) =>
          assert(stats.maxMethodCodeSize < hugeLimit,
            s"$name: a generated method hit ${stats.maxMethodCodeSize} B " +
              s">= hugeMethodLimit $hugeLimit — Spark would silently drop " +
              s"the stage to interpreted execution. Subtree:\n$subtree")
        }
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
          case None => spark.conf.unset("spark.sql.codegen.fallback")
        }
      }
    }
  }
}
