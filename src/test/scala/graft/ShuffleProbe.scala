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
    Seq("q_ext_pagerank", "q_ext_graph_degrees", "q_ext_preference_pairs",
      "q_ext_boilerplate", "q_ext_source_overlap", "q_ext_compress_contract",
      "q_ext_shuffle_export", "q_ext_bpe_decode", "q_ext_span_corrupt",
      "q_ext_group_split", "q_ext_bigram_lm", "q_ext_cluster_sizes",
      "q_ext_bradley_terry", "q_ext_rrf", "q_ext_seq_pairs",
      "q_ext_unpivot", "q_ext_good_turing", "q_ext_stratified_k",
      "q_ext_novelty", "q_ext_water_fill").foreach { name =>
      val plan = SparkEntry.queries(name)(noAqe, sfDir).queryExecution.executedPlan
      val n = plan.collect { case s: ShuffleExchangeLike => s }.size
      println(s"SHUFFLES $name = $n")
    }
    spark.stop()
  }
}
