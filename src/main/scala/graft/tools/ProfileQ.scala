package graft.tools

import graft._

/** Ad-hoc profiler: time the named SparkEntry queries, printing
  * per-iteration seconds and heap movement. With two dirs, each query
  * runs on the base dir first, then the scaled dir (so scaled/base
  * ratios come from one JVM); with one dir, just that dir.
  * {{{ runMain graft.tools.ProfileQ q_w1_topk /root/testdata/sf0.1 target/scaled-10x 3 }}}
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val base = args(1)
    val scaled = if (args.length > 2) Some(args(2)) else None
    val iters = if (args.length > 3) args(3).toInt else 1
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, dir: String, tag: String): Unit = {
      val fn = SparkEntry.queries(name)
      (1 to iters).foreach { i =>
        System.gc()
        val rt = Runtime.getRuntime
        val heap0 = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val heap1 = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
        println(f"[profile] $name $tag iter$i ${(System.nanoTime() - t0) / 1e9}%.2f s heap ${heap0}M->${heap1}M")
      }
    }
    names.foreach { n =>
      time(n, base, "base")
      scaled.foreach(d => time(n, d, "scaled"))
    }
    spark.stop()
  }
}
