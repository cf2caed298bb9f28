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
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
          case None => spark.conf.unset("spark.sql.codegen.fallback")
        }
      }
    }
  }
}
