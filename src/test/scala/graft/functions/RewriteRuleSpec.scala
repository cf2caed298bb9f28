package graft.functions

import graft.SparkTestBase
import graft.ext.Similarity
import org.apache.spark.sql.functions._

class RewriteRuleSpec extends SparkTestBase {
  import spark.implicits._

  test("optimizer rule rewrites HOF dot-product chain to native DotProduct") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try {
      // non-foldable input (derived from range) so constant folding can't
      // collapse the plan before the rule sees it
      val df = spark.range(1, 2)
        .select(
          array($"id".cast("double"), lit(2.0), lit(3.0)).as("a"),
          array(lit(4.0), lit(5.0), lit(6.0)).as("b"))
        .select(Similarity.dot($"a", $"b").as("d")) // the composable HOF spelling
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vec_dot"), s"rule did not fire:\n$optimized")
      assert(!optimized.contains("aggregate("), s"HOF chain survived:\n$optimized")
      assert(df.head().getDouble(0) === 32.0) // 4 + 10 + 18
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }

  test("rule leaves non-matching aggregates untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try {
      // sum (not dot): zero=0.0 but no zip_with multiply underneath
      val df = spark.range(1, 2)
        .select(array($"id".cast("double"), lit(2.0), lit(3.0)).as("a"))
        .select(aggregate($"a", lit(0.0), (acc, x) => acc + x).as("s"))
      assert(df.head().getDouble(0) === 6.0)
      assert(df.queryExecution.optimizedPlan.toString.contains("aggregate("))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }
}
