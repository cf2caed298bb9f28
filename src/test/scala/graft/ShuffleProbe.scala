package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Throwaway measurement main: print ShuffleExchange counts for the
  * round's new queries so PlanBudgetSpec pins can be set from data.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    val sfDir = "/root/testdata/sf0.001"
    Seq("q_ext_mips", "q_ext_psi", "q_ext_new_users", "q_ext_huber", "q_ext_modularity", "q_ext_iv", "q_ext_seq_support", "q_ext_neg_sampling", "q_ext_interval_coalesce", "q_ext_jackknife", "q_ext_ece", "q_ext_sprt", "q_ext_langid_confusion", "q_ext_calibrated_filter").foreach { name =>
      val plan = SparkEntry.queries(name)(noAqe, sfDir).queryExecution.executedPlan
      val n = plan.collect { case s: ShuffleExchangeLike => s }.size
      println(s"SHUFFLES $name = $n")
    }
    spark.stop()
  }
}
