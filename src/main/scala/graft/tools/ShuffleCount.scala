package graft.tools

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.{Sessions, SparkEntry}

/** Print the non-adaptive ShuffleExchange count for the named queries —
  * the number PlanBudgetSpec pins. Usage:
  * {{{ runMain graft.tools.ShuffleCount q_ext_semdedup q_ext_ann_ivf }}}
  */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      val plan = SparkEntry.queries(name)(s, dir).queryExecution.executedPlan
      val n = plan.collect { case e: ShuffleExchangeLike => e }.size
      println(s"[shuffles] $name: $n")
    }
    spark.stop()
  }
}
