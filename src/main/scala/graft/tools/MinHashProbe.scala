package graft.tools

import graft._

/** One-off diagnostic: why is q_ext_dedup_minhash slow only when other
  * queries ran first in the same session? Times minhash cold, then
  * after each suspect predecessor, in one JVM (bench conditions:
  * noop-sink materialization, System.gc() fences).
  */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def run(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timeMinhash(label: String): Unit =
      println(f"[probe] minhash after $label: ${run("q_ext_dedup_minhash")}%.2f s")

    timeMinhash("<cold>")
    timeMinhash("<warm>")
    val suspects = Seq("q_ext_ann_cosine", "q_ext_ann_hyperplane", "q_ext_ann_ivf",
      "q_ext_ann_lsh", "q_ext_bpe_tokens", "q_ext_dedup_exact", "q_ext_dedup_jaccard")
    suspects.foreach { s =>
      val t = run(s)
      println(f"[probe]   ($s: $t%.2f s)")
      timeMinhash(s)
    }
    spark.stop()
  }
}
