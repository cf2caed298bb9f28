package graft.tools

import java.nio.file.{Files, Paths}
import graft._

/** Dumps formatted physical plans for the headline queries (SCALE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = Seq("q_a1_resample", "q_j1_time_join", "q_j2_broadcast_lookup",
      "q_a2_linreg", "q_ext_dedup_minhash", "q_ext_ann_lsh", "q_pipe_compare_stats",
      "q_ext_ann_ivf", "q_ext_ann_hyperplane", "q_w1_topk", "q_ext_fingerprint",
      "q_ext_url_parse", "q_ext_domain_stats", "q_ext_bpe_encode",
      "q_ext_ann_ivf_trained", "q_ext_dedup_incremental_near")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      sb ++= s"==== $n ====\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode) + "\n"
    }
    Files.writeString(Paths.get("/tmp/plans.txt"), sb.toString)
    println("[scratch] plans written")
    spark.stop()
  }
}
